package graft

import com.sun.net.httpserver.HttpServer
import graft.session.{Engine, EngineConfig}
import java.net.InetSocketAddress
import java.nio.file.{Files, Path}
import java.util.concurrent.atomic.AtomicInteger
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** URL-registered files read over real HTTP with ranged requests (reference
  * runtime_browser.ts:142-177,224-258: registered HTTP files are fetched
  * with `Range: bytes=a-b`). An in-process server serves a parquet file;
  * the engine must query it through `registerFileURL` + `parquet_scan`,
  * and the parquet footer/row-group seeks must arrive as Range requests. */
class HttpFileSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var port: Int = 0
  private var parquetBytes: Array[Byte] = _
  private val rangedRequests = new AtomicInteger()
  private val nonZeroOffsetRanges = new AtomicInteger()

  private lazy val engine =
    new Engine(EngineConfig(existingSession = Some(SparkTestSession.spark)))
  private lazy val conn = engine.connect()

  override def beforeAll(): Unit = {
    // a real parquet file: 1000 rows written by Spark itself
    val dir = Files.createTempDirectory("graft-http-")
    SparkTestSession.spark.range(0, 1000).selectExpr("id", "id * 3 AS v")
      .coalesce(1).write.mode("overwrite").parquet(dir.resolve("out").toString)
    val part = Files.list(dir.resolve("out")).iterator()
    var p: Path = null
    while (part.hasNext) { val f = part.next(); if (f.toString.endsWith(".parquet")) p = f }
    parquetBytes = Files.readAllBytes(p)

    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/data.parquet", exchange => {
      val headers = exchange.getResponseHeaders
      headers.set("Accept-Ranges", "bytes")
      if (exchange.getRequestMethod == "HEAD") {
        headers.set("Content-Length", parquetBytes.length.toString)
        exchange.sendResponseHeaders(200, -1)
        exchange.close()
      } else {
        val range = Option(exchange.getRequestHeaders.getFirst("Range"))
        val RangeRe = """bytes=(\d+)-(\d*)""".r
        range match {
          case Some(RangeRe(a, b)) =>
            rangedRequests.incrementAndGet()
            val from = a.toLong.toInt
            if (from > 0) nonZeroOffsetRanges.incrementAndGet()
            val to = if (b.isEmpty) parquetBytes.length - 1 else b.toLong.toInt
            val slice = java.util.Arrays.copyOfRange(parquetBytes, from, to + 1)
            headers.set("Content-Range",
              s"bytes $from-$to/${parquetBytes.length}")
            exchange.sendResponseHeaders(206, slice.length.toLong)
            exchange.getResponseBody.write(slice)
            exchange.close()
          case _ =>
            exchange.sendResponseHeaders(200, parquetBytes.length.toLong)
            exchange.getResponseBody.write(parquetBytes)
            exchange.close()
        }
      }
    })
    server.start()
    port = server.getAddress.getPort
  }

  test("registerFileURL + parquet_scan reads through HTTP with ranged requests") {
    engine.files.registerFileURL("remote.parquet", s"http://127.0.0.1:$port/data.parquet")
    val rows = conn.queryDF(
      "SELECT count(*) AS n, sum(v)::BIGINT AS s FROM parquet_scan('remote.parquet')")
      .collect()
    assert(rows.head.getLong(0) === 1000L)
    assert(rows.head.getLong(1) === (0L until 1000L).map(_ * 3).sum)
    assert(rangedRequests.get() > 0, "no Range requests reached the server")
    assert(nonZeroOffsetRanges.get() > 0,
      "no non-zero-offset Range request (footer seek should not read from 0)")
  }

  test("URLs with query strings (presigned-style) keep their query intact") {
    val seenQueries = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    server.createContext("/signed.parquet", exchange => {
      val q = exchange.getRequestURI.getQuery
      if (q != null) seenQueries.add(q)
      val headers = exchange.getResponseHeaders
      headers.set("Accept-Ranges", "bytes")
      if (q == null || !q.contains("token=sekrit")) {
        exchange.sendResponseHeaders(403, -1); exchange.close()
      } else if (exchange.getRequestMethod == "HEAD") {
        headers.set("Content-Length", parquetBytes.length.toString)
        exchange.sendResponseHeaders(200, -1); exchange.close()
      } else {
        exchange.sendResponseHeaders(200, parquetBytes.length.toLong)
        exchange.getResponseBody.write(parquetBytes)
        exchange.close()
      }
    })
    engine.files.registerFileURL("signed.parquet",
      s"http://127.0.0.1:$port/signed.parquet?token=sekrit&expires=999")
    val n = conn.queryDF("SELECT count(*) AS n FROM parquet_scan('signed.parquet')")
      .collect().head.getLong(0)
    assert(n === 1000L)
    assert(seenQueries.asScala.exists(_.contains("token=sekrit")),
      "query string did not reach the server")
  }

  test("predicate query over the same URL re-reads via ranges, not a download") {
    val before = rangedRequests.get()
    val n = conn.queryDF(
      "SELECT count(*) AS n FROM parquet_scan('remote.parquet') WHERE v >= 1500")
      .collect().head.getLong(0)
    assert(n === 500L)
    assert(rangedRequests.get() > before)
  }

  test("block-level statistics for a ranged HTTP parquet scan (file_stats.h:24-120)") {
    engine.files.registerFileURL("stats_remote.parquet", s"http://127.0.0.1:$port/data.parquet")
    engine.files.collectFileStatistics("stats_remote.parquet", enable = true)
    conn.queryDF("SELECT count(*) AS n FROM parquet_scan('stats_remote.parquet')").collect()
    val st = engine.files.exportFileStatistics("stats_remote.parquet")
    assert(st.blockShift >= graft.io.FileStatsCollector.MinRangeShift)
    assert(st.blocks.nonEmpty && st.blocks.size <= graft.io.FileStatsCollector.MaxRangeCount)
    assert(st.blocks.map(_.coldReads).sum > 0, "no cold block reads recorded")
    assert(st.bytesReadCold > 0)
    // a second scan touches blocks already seen → cached block reads
    conn.queryDF("SELECT count(*) AS n FROM parquet_scan('stats_remote.parquet')").collect()
    val st2 = engine.files.exportFileStatistics("stats_remote.parquet")
    assert(st2.blocks.map(_.cachedReads).sum > 0, "re-scan recorded no cached block reads")
    // disable drops the collector; export falls back to coarse counters only
    engine.files.collectFileStatistics("stats_remote.parquet", enable = false)
    assert(engine.files.exportFileStatistics("stats_remote.parquet").blocks.isEmpty)
  }

  override def afterAll(): Unit = if (server != null) server.stop(0)
}
