package graft
import graft.session.{Engine, EngineConfig}
object VerifyProbe {
  def main(args: Array[String]): Unit = {
    val e = new Engine(EngineConfig(maximumThreads = 8))
    val c = e.connect()
    // native expressions through the SQL surface (registered at engine init)
    println("cos: " + c.queryDF(
      "SELECT vec_cosine(array(1.0D, 2.0D, 3.0D), array(2.0D, 4.0D, 6.0D)) AS c").collect().head)
    println("simhash: " + c.queryDF("SELECT simhash64(array(255L, 255L, 0L)) AS s").collect().head)
    e.files.registerFilePath("emb.parquet", "/root/testdata/sf0.001/embeddings.parquet")
    println("ann-sql: " + c.queryDF(
      "SELECT vec_id, vec_cosine(embedding, (SELECT first(embedding) FROM parquet_scan('emb.parquet'))) AS cos " +
      "FROM parquet_scan('emb.parquet') ORDER BY cos DESC LIMIT 3").collect().mkString(" "))
    // probe: mismatched arity
    try { c.queryDF("SELECT vec_cosine(array(1.0D)) AS x").collect(); println("arity: NO ERROR (bad)") }
    catch { case ex: Throwable => println("arity error: " + ex.getMessage.linesIterator.next().take(100)) }
    // probe: wrong element type
    try { c.queryDF("SELECT simhash64(array('a','b')) AS x").collect(); println("type: NO ERROR (bad)") }
    catch { case ex: Throwable => println("type error: " + ex.getMessage.linesIterator.next().take(100)) }
    e.close()
  }
}
