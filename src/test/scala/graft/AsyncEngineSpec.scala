package graft

import graft.session.{AsyncEngine, Engine, EngineConfig}
import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.ipc.ArrowFileReader
import org.apache.arrow.vector.util.ByteArrayReadableSeekableByteChannel
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

/** Async worker-protocol facade semantics, pinned by the reference's async
  * jasmine suites (test/index_node.ts → tests-node.ts: query/prepared/
  * bindings run through AsyncDuckDB): tagged request → Future response,
  * serialized execution, per-connection streams, interleaved connections. */
class AsyncEngineSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val engine =
    new Engine(EngineConfig(existingSession = Some(SparkTestSession.spark)))
  private lazy val async = new AsyncEngine(engine)

  private def await[T](f: Future[T]): T = Await.result(f, 90.seconds)

  private def readLongs(ipcFile: Array[Byte], col: Int = 0): Seq[Long] = {
    val alloc = new RootAllocator(Long.MaxValue)
    val reader = new ArrowFileReader(
      new ByteArrayReadableSeekableByteChannel(ipcFile), alloc)
    try {
      val out = Seq.newBuilder[Long]
      while (reader.loadNextBatch()) {
        val v = reader.getVectorSchemaRoot.getVector(col)
        (0 until reader.getVectorSchemaRoot.getRowCount).foreach { i =>
          out += v.getObject(i).asInstanceOf[Number].longValue()
        }
      }
      out.result()
    } finally { reader.close(); alloc.close() }
  }

  test("async query round-trip (RUN_QUERY → QUERY_RESULT)") {
    val r = await(for {
      id <- async.connect()
      buf <- async.runQuery(id, "SELECT 41 + 1 AS v")
      _ <- async.disconnect(id)
    } yield buf)
    assert(readLongs(r) === Seq(42L))
  }

  test("interleaved connections stay isolated and serialized") {
    val (c1, c2) = (await(async.connect()), await(async.connect()))
    // fire 20 interleaved requests without awaiting in between — the worker
    // must serialize them; each response pairs with its own request
    val fs = (0 until 20).map { i =>
      val cid = if (i % 2 == 0) c1 else c2
      async.runQuery(cid, s"SELECT $i * 2 AS v").map(b => i -> readLongs(b))
    }
    val results = await(Future.sequence(fs))
    results.foreach { case (i, vs) => assert(vs === Seq(i * 2L)) }
    await(async.disconnect(c1)); await(async.disconnect(c2))
  }

  test("async send/fetch streaming: schema first, chunks, then EOS") {
    val id = await(async.connect())
    val header = await(async.sendQuery(id, "SELECT id FROM range(0, 10)"))
    assert(header.nonEmpty) // schema IPC message
    var total = 0
    var batch = await(async.fetchQueryResults(id))
    while (batch.nonEmpty) {
      total += 1
      batch = await(async.fetchQueryResults(id))
    }
    assert(total >= 1) // at least one chunk before EOS
    // stream is done: further fetches keep answering EOS
    assert(await(async.fetchQueryResults(id)).isEmpty)
    await(async.disconnect(id))
  }

  test("a second sendQuery replaces the connection's active stream") {
    val id = await(async.connect())
    await(async.sendQuery(id, "SELECT id FROM range(0, 100)"))
    // replace before fetching anything
    await(async.sendQuery(id, "SELECT 42 AS v"))
    var rows = 0
    var batch = await(async.fetchQueryResults(id))
    while (batch.nonEmpty) { rows += 1; batch = await(async.fetchQueryResults(id)) }
    assert(rows === 1) // one batch: the SECOND query's single row, not 100
    await(async.disconnect(id))
  }

  test("async prepared statements round-trip") {
    val id = await(async.connect())
    val stmt = await(async.createPrepared(id, "SELECT v * ? AS r FROM (SELECT 21 AS v)"))
    val buf = await(async.runPrepared(id, stmt, Seq(2)))
    assert(readLongs(buf) === Seq(42L))
    await(async.closePrepared(id, stmt))
    await(async.disconnect(id))
  }

  test("errors surface as failed futures (ERROR response)") {
    val id = await(async.connect())
    val f = async.runQuery(id, "SELECT * FROM graft_definitely_missing_table")
    intercept[Exception] { await(f) }
    // the worker survives an error: next request still works
    assert(readLongs(await(async.runQuery(id, "SELECT 1 AS v"))) === Seq(1L))
    await(async.disconnect(id))
  }

  test("requests against a disconnected id fail, version/flags/tokenize work") {
    val id = await(async.connect())
    await(async.disconnect(id))
    intercept[Exception] { await(async.runQuery(id, "SELECT 1")) }
    assert(await(async.getVersion()).startsWith("graft-spark-"))
    assert(await(async.getFeatureFlags())("threads"))
    val (offsets, lengths) = await(async.tokenize("SELECT 1"))
    assert(offsets === Seq(0, 7) && lengths === Seq(4, 1))
  }

  override def afterAll(): Unit = async.close()
}
