package graft
import graft.session.{Engine, EngineConfig}
import graft.ingest.IngestOptions

/** Minimal end-to-end walkthrough of the engine's public API (the same flow
  * a reference user runs: open → register → query → ingest → copy). */
object Demo {
  def main(args: Array[String]): Unit = {
    val engine = new Engine(EngineConfig(maximumThreads = 8))
    val conn = engine.connect()
    engine.files.registerFilePath("lineitem.parquet",
      "/root/testdata/sf0.001/lineitem.parquet")
    println("version: " + engine.getVersion)
    println("count: " + conn.queryDF(
      "SELECT count(*)::INTEGER AS cnt, min(l_shipdate)::DATE AS first_ship " +
      "FROM parquet_scan('lineitem.parquet')").collect().mkString)
    println("series: " + conn.queryDF("SELECT sum(generate_series)::BIGINT AS s FROM generate_series(1, 100)")
      .collect().mkString)
    conn.queryDF("CREATE TABLE main.demo AS SELECT l_returnflag, count(*) AS n " +
      "FROM parquet_scan('lineitem.parquet') GROUP BY 1")
    println("tables: " + conn.queryDF("PRAGMA show_tables").collect().map(_.getString(0)).mkString(","))
    val ipc = conn.query("SELECT * FROM main.demo ORDER BY l_returnflag")
    println("arrow ipc bytes: " + ipc.length + " magic=" + new String(ipc.take(6), "UTF-8"))
    val st = conn.send("SELECT l_orderkey, l_quantity FROM parquet_scan('lineitem.parquet')")
    var batches = 0
    while (conn.fetchQueryResults().nonEmpty) batches += 1
    println("stream batches: " + batches)
    engine.reset()
    println("after reset: " + conn.queryDF("PRAGMA show_tables").count() + " tables")
    engine.close()
  }
}
