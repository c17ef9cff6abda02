package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.storage.StorageLevel

package object pipeline {

  /** Cache-then-sort for queries whose result is a narrow per-row
    * projection with NO shuffle below the final global ORDER BY.
    *
    * A range sort first runs a SAMPLING job over its child to pick the
    * range bounds, then the real shuffle job — and when nothing below the
    * sort is a shuffle (whose map outputs Spark would reuse across jobs),
    * the child plan executes twice end to end: scan, regex splits, array
    * lambdas, everything (p26 measured 3.8 s → 1.7 s at sf1 from exactly
    * this). Persisting the narrow result lets the sampler hit the cache;
    * the harness/session `clearCache` releases it after the query.
    *
    * Only use where the child is shuffle-free — below a join/aggregate the
    * second job already reuses shuffle files and the persist would be pure
    * cache-fill overhead. */
  implicit class SortedOnce(private val df: DataFrame) extends AnyVal {
    def sortedOnce(key: String): DataFrame =
      Pins.ephemeral(df).orderBy(col(key))

    /** Intra-query collapse-barrier pin, tracked so the harness can
      * release exactly the per-query pins (see [[Pins]]). */
    def pinned: DataFrame = Pins.ephemeral(df)
  }
}
