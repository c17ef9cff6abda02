package graft.io

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicLong, AtomicLongArray}

/** Per-block counters of one registered file's I/O, shaped like the
  * reference's FileStatisticsCollector (lib/include/duckdb/web/io/
  * file_stats.h:24-120): the file is divided into ≤[[FileStatsCollector.MaxRangeCount]]
  * power-of-two blocks (never smaller than a 4 KiB page), and every read is
  * classified per block as COLD (first touch via a fresh seek), AHEAD
  * (first touch by sequential continuation of an open stream — the
  * readahead pattern) or CACHED (block touched before), with byte totals
  * per class. Writes bump a separate counter (the HTTP path is read-only;
  * local spill writes use it).
  *
  * Scale note: counters live on whatever JVM issues the read — in
  * local mode that is the one engine JVM; on a cluster they are
  * executor-local and would be shipped through task metrics / a listener,
  * which changes transport, not this model. */
final class FileStatsCollector(val fileSize: Long) {
  import FileStatsCollector._

  /** Smallest power-of-two shift with ≤ MaxRangeCount blocks. */
  val blockShift: Int = {
    var s = MinRangeShift
    while ((fileSize >> s) + 1 > MaxRangeCount) s += 1
    s
  }
  val blockCount: Int =
    math.max(1L, (fileSize + (1L << blockShift) - 1) >> blockShift).toInt

  private val cold = new AtomicLongArray(blockCount)
  private val ahead = new AtomicLongArray(blockCount)
  private val cached = new AtomicLongArray(blockCount)
  private val writes = new AtomicLongArray(blockCount)
  private val touched = new java.util.concurrent.atomic.AtomicIntegerArray(blockCount)

  val bytesCold = new AtomicLong()
  val bytesAhead = new AtomicLong()
  val bytesCached = new AtomicLong()
  val bytesWrite = new AtomicLong()

  private def blocksOf(offset: Long, length: Long): Range = {
    val first = math.min(offset >> blockShift, (blockCount - 1).toLong).toInt
    val last = math.min((offset + math.max(length, 1) - 1) >> blockShift, (blockCount - 1).toLong).toInt
    first to last
  }

  /** Register a read of [offset, offset+length); `continuation` marks a
    * sequential read that did NOT require a new seek/request. */
  def registerRead(offset: Long, length: Long, continuation: Boolean): Unit = {
    if (length <= 0) return
    var anyCold = false; var anyAhead = false; var anyCached = false
    blocksOf(offset, length).foreach { b =>
      if (touched.getAndSet(b, 1) == 1) { cached.incrementAndGet(b); anyCached = true }
      else if (continuation) { ahead.incrementAndGet(b); anyAhead = true }
      else { cold.incrementAndGet(b); anyCold = true }
    }
    // byte totals attribute the whole read to its dominant class, like the
    // reference attributes each BumpCounter call's length to one total
    if (anyCold) bytesCold.addAndGet(length)
    else if (anyAhead) bytesAhead.addAndGet(length)
    else if (anyCached) bytesCached.addAndGet(length)
  }

  def registerWrite(offset: Long, length: Long): Unit = {
    if (length <= 0) return
    blocksOf(offset, length).foreach(writes.incrementAndGet)
    bytesWrite.addAndGet(length)
  }

  def export: Seq[BlockStatistics] =
    (0 until blockCount).map { b =>
      BlockStatistics(b, cold.get(b), ahead.get(b), cached.get(b), writes.get(b))
    }
}

object FileStatsCollector {
  /** file_stats.h:25 MAX_RANGE_COUNT. */
  val MaxRangeCount = 1000
  /** file_stats.h:26 MIN_RANGE_SHIFT = DEFAULT_FILE_PAGE_SHIFT (4 KiB). */
  val MinRangeShift = 12
}

/** One block's counters (reference BlockStatistics, file_stats.h:30-37). */
final case class BlockStatistics(
    blockIdx: Int,
    coldReads: Long,
    aheadReads: Long,
    cachedReads: Long,
    writes: Long)

/** JVM-global registry of active collectors, keyed by the STORED form of a
  * file's location (the string [[graft.session.FileRegistry]] resolves to
  * and [[HttpFileSystem]] sees as its raw path) — the bridge between the
  * engine-side enable/export API and the read path, which has no engine
  * reference. */
object ReadStatsHub {
  private val armed = ConcurrentHashMap.newKeySet[String]()
  private val collectors = new ConcurrentHashMap[String, FileStatsCollector]()

  /** Mark a key for collection; the collector itself materializes on first
    * access with the real file size (unknown for HTTP files until HEAD). */
  def arm(key: String): Unit = armed.add(key)

  def disarm(key: String): Unit = { armed.remove(key); collectors.remove(key) }

  /** The collector for an ARMED key, created on first use. */
  def collectorFor(key: String, fileSize: Long): Option[FileStatsCollector] =
    if (!armed.contains(key)) None
    else Option(collectors.computeIfAbsent(key, _ => new FileStatsCollector(fileSize)))

  def get(key: String): Option[FileStatsCollector] = Option(collectors.get(key))
}
