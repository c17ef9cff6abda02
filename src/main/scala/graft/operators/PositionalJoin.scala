package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** POSITIONAL JOIN — DuckDB's row-position pairing of two relations
  * (reference surface: duckdb docs/sql/query_syntax/from, "positional
  * joins"; the wasm build exposes it verbatim through `query()`). Rows are
  * paired 1st-with-1st, 2nd-with-2nd, …; the shorter side is padded with
  * NULLs, i.e. a FULL OUTER join on row position.
  *
  * Spark has no row-position join, and the naive spelling —
  * `row_number() OVER (ORDER BY k)` on each side — plans ONE task holding
  * the whole table per side (empty window partition), the classic
  * SinglePartition scale-killer. The scale path here derives each side's
  * global position in two passes with bounded state:
  *
  *  1. range-repartition by the declared order keys and sort within
  *     partitions — partition i holds keys strictly before partition i+1,
  *     so (partition id, local row_number) is already a lexicographic
  *     global order, computed at full parallelism;
  *  2. one tiny summary row per partition (its row count) turns into
  *     prefix offsets via a window over O(partitions) rows — the same
  *     boundary-carry shape as [[graft.scale.Scale.bandedRunningPositional]];
  *  3. global position = local row_number + broadcast prefix offset.
  *
  * The positions then equi-join (shuffle on position, both sides already
  * roughly balanced by construction). At 100 TB nothing holds more than a
  * partition of rows or O(partitions) summary rows.
  *
  * `ord` must be a total order for the pairing to be deterministic (ties
  * may straddle range-partition boundaries and pair arbitrarily — exactly
  * as arbitrary as any engine's sort-tie order, but pin unique keys when
  * bit-exact output matters).
  */
object PositionalJoin {

  /** Adds a 1-based global position column ordered by `ord`, without a
    * single-partition sort. */
  def globalIndex(df: DataFrame, ord: Seq[Column], posName: String,
      partitions: Int = 0): DataFrame = {
    val n =
      if (partitions > 0) partitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val sorted = df.repartitionByRange(n, ord: _*)
    val withPid = sorted.withColumn("__pid", spark_partition_id())
    // O(partitions) rows: each partition's count, then exclusive prefix sum.
    // The un-partitioned window is bounded by the partition COUNT, never by
    // the data (the blessed boundary-carry shape).
    val offsets = withPid.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(
        sum(col("__cnt")).over(Window.orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__off"))
    val wLocal = Window.partitionBy(col("__pid")).orderBy(ord: _*)
    withPid
      .withColumn("__lrn", row_number().over(wLocal).cast("long"))
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn(posName, col("__lrn") + col("__off"))
      .drop("__pid", "__lrn", "__off")
  }

  /** FULL OUTER join of `left` and `right` by row position under their
    * respective total orders; the returned frame keeps the pairing
    * position as `posName`. Column-name collisions between the two sides
    * are the caller's to resolve (standard Spark join contract). */
  def positionalJoin(left: DataFrame, right: DataFrame,
      leftOrd: Seq[Column], rightOrd: Seq[Column],
      posName: String = "pos"): DataFrame = {
    val l = globalIndex(left, leftOrd, posName)
    val r = globalIndex(right, rightOrd, posName)
    l.join(r, Seq(posName), "full_outer")
  }
}
