package graft.io

import java.io.{EOFException, InputStream}
import java.net.{HttpURLConnection, URI, URL}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, FSDataOutputStream, FSInputStream, FileStatus, FileSystem, Path}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Read-only Hadoop `FileSystem` over HTTP(S) with **ranged reads** — the
  * Spark-native counterpart of the reference's HTTP-registered files
  * (runtime_browser.ts:142-177,224-258 issues `Range: bytes=a-b` requests;
  * buffer manager readahead sits on top). Registering `fs.http.impl` makes
  * `spark.read.parquet("http://...")` work end to end: the parquet footer
  * read seeks to the file tail, row-group reads seek to their offsets, and
  * every seek maps to one HTTP Range request from the *executor* — no
  * driver-side download, so a 100-node cluster fans ranged reads out
  * exactly like it does against S3/HDFS.
  *
  * Write paths throw (the reference's HTTP files are read-only too).
  */
class HttpFileSystem extends FileSystem {

  private var fsUri: URI = _

  override def getScheme: String = "http"

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    fsUri = URI.create(s"${name.getScheme}://${name.getAuthority}")
    setConf(conf)
  }

  override def getUri: URI = fsUri

  /** Rebuild the real URL from a Hadoop Path: a `!q=<base64url>` suffix
    * (written by FileRegistry.registerFileURL) carries the query string a
    * Path cannot represent — decode it back into `?query`. */
  private def toURL(f: Path): URL = {
    val raw = f.toUri.toString
    val idx = raw.lastIndexOf("!q=")
    if (idx >= 0) {
      val q = new String(
        java.util.Base64.getUrlDecoder.decode(raw.substring(idx + 3)), "UTF-8")
      new URL(raw.substring(0, idx) + "?" + q)
    } else new URL(raw)
  }

  private def contentLength(url: URL): Long = {
    val c = url.openConnection().asInstanceOf[HttpURLConnection]
    c.setRequestMethod("HEAD")
    try {
      val code = c.getResponseCode
      if (code >= 400) throw new java.io.FileNotFoundException(s"$url: HTTP $code")
      val len = c.getContentLengthLong
      if (len < 0) throw new java.io.IOException(s"$url: no Content-Length")
      len
    } finally c.disconnect()
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val url = toURL(f)
    val len = contentLength(url)
    // block-level read statistics, when enabled for this file via
    // FileRegistry.collectFileStatistics (keyed by the stored raw form)
    val stats = ReadStatsHub.collectorFor(f.toUri.toString, len)
      .orElse(ReadStatsHub.collectorFor(url.toString, len))
    new FSDataInputStream(new HttpRangeInputStream(url, len, stats))
  }

  override def getFileStatus(f: Path): FileStatus = {
    val len = contentLength(toURL(f))
    new FileStatus(len, false, 1, 128L * 1024 * 1024, 0L, f)
  }

  override def listStatus(f: Path): Array[FileStatus] = Array(getFileStatus(f))

  override def getWorkingDirectory: Path = new Path(fsUri.toString, "/")
  override def setWorkingDirectory(dir: Path): Unit = ()

  private def readOnly = new UnsupportedOperationException("HTTP filesystem is read-only")
  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = throw readOnly
  override def append(f: Path, bufferSize: Int, progress: Progressable): FSDataOutputStream =
    throw readOnly
  override def rename(src: Path, dst: Path): Boolean = throw readOnly
  override def delete(f: Path, recursive: Boolean): Boolean = throw readOnly
  override def mkdirs(f: Path, permission: FsPermission): Boolean = throw readOnly
}

/** Same filesystem under the `https` scheme (`fs.https.impl`). */
class HttpsFileSystem extends HttpFileSystem {
  override def getScheme: String = "https"
}

/** Seekable HTTP stream: each seek re-opens the connection with a
  * `Range: bytes=<pos>-` header, so a parquet reader's footer/row-group
  * seeks become genuine ranged requests (positioned reads come through
  * FSInputStream's seek+read default). */
private[io] final class HttpRangeInputStream(url: URL, length: Long,
    stats: Option[FileStatsCollector] = None)
    extends FSInputStream {

  private var pos = 0L
  private var in: InputStream = _
  private var conn: HttpURLConnection = _
  // true until the first read after a (re)open consumes it — distinguishes
  // a COLD read (fresh Range request) from sequential read-AHEAD on the
  // same open response body
  private var freshRequest = false

  private def ensureOpen(): InputStream = {
    if (in == null) {
      if (pos >= length) throw new EOFException(s"$url: read past end ($pos >= $length)")
      freshRequest = true
      conn = url.openConnection().asInstanceOf[HttpURLConnection]
      conn.setRequestProperty("Range", s"bytes=$pos-")
      val code = conn.getResponseCode
      if (code != 200 && code != 206)
        throw new java.io.IOException(s"$url: HTTP $code for range at $pos")
      in = conn.getInputStream
      if (code == 200 && pos > 0) { // server ignored Range: skip manually
        var remaining = pos
        while (remaining > 0) {
          val skipped = in.skip(remaining)
          if (skipped <= 0) throw new java.io.IOException(s"$url: cannot skip to $pos")
          remaining -= skipped
        }
      }
    }
    in
  }

  private def closeCurrent(): Unit = {
    if (in != null) { try in.close() catch { case _: Exception => () }; in = null }
    if (conn != null) { conn.disconnect(); conn = null }
  }

  override def seek(newPos: Long): Unit =
    if (newPos != pos) { closeCurrent(); pos = newPos }

  override def getPos: Long = pos

  override def seekToNewSource(targetPos: Long): Boolean = false

  override def read(): Int = {
    if (pos >= length) return -1
    val b = ensureOpen().read()
    if (b >= 0) {
      stats.foreach(_.registerRead(pos, 1, continuation = !freshRequest))
      freshRequest = false
      pos += 1
    } else closeCurrent()
    b
  }

  override def read(buf: Array[Byte], off: Int, len: Int): Int = {
    if (pos >= length) return -1
    val n = ensureOpen().read(buf, off, len)
    if (n > 0) {
      stats.foreach(_.registerRead(pos, n, continuation = !freshRequest))
      freshRequest = false
      pos += n
    } else closeCurrent()
    n
  }

  override def available(): Int = math.min(length - pos, Int.MaxValue.toLong).toInt

  override def close(): Unit = closeCurrent()
}
