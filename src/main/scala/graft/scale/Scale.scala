package graft.scale

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row}
import org.apache.spark.sql.functions._

/** Cluster-scale join/layout utilities — the techniques the 100 TB
  * deployment leans on, packaged so pipelines use them declaratively.
  *
  * - **Bucketed co-located joins**: both sides pre-hashed into the same
  *   bucket layout on the join key ⇒ the join runs with NO shuffle at all
  *   (verified by ScaleSpec: zero Exchange in the physical plan). This is
  *   the Spark-native answer to repeated large-fact joins.
  * - **Salted joins**: a skewed hot key would send one reducer 1000× the
  *   work; salting splits each key into `saltBuckets` sub-keys (left side
  *   gets a deterministic salt, the smaller right side is replicated per
  *   salt) so the shuffle spreads evenly. AQE's skew-join handles moderate
  *   skew automatically; salting is for the pathological tail.
  */
object Scale {

  /** Write a table bucketed+sorted on the join key (one-time layout cost;
    * every subsequent equi-join on `key` is shuffle-free). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)

  /** Inner equi-join with key salting for skew. `left` is the large/skewed
    * side; `right` must be small enough to replicate `saltBuckets`×.
    * The salt is deterministic (hash of the whole left row) so retried
    * tasks produce identical partitioning. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0)
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col).toSeq: _*), lit(saltBuckets)).cast("int"))
    val salts = array((0 until saltBuckets).map(lit): _*)
    val saltedRight = right.withColumn("__salt", explode(salts))
    saltedLeft.join(saltedRight, (keys :+ "__salt").toSeq).drop("__salt")
  }

  /** Top skewed keys of a column — the observability half of skew handling
    * (decide salting factors from real key histograms, not guesses). */
  def keySkew(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(col(key))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(key))
      .limit(topN)
}
