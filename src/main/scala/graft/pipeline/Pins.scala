package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Registry for the pipeline's internal `persist` pins, split by lifetime:
  *
  *  - '''ephemeral''' — intra-query collapse barriers (the p26/p31/p45
  *    projection-reuse pins): live for one harness query, released by
  *    [[releaseEphemeral]] between queries. Tracking them by handle lets
  *    the harness drop exactly these without nuking longer-lived caches
  *    the way a blanket `spark.catalog.clearCache()` did.
  *  - '''shared''' — cross-query stages keyed by (dir, kind): the LSH
  *    signature and candidate-pair stages that p06/p07/p22/p24/p30/p65/
  *    p67/p68 all rebuild identically. One harness run computes the
  *    32-permutation transform once per scale dir instead of once per
  *    consuming query; [[releaseAll]] (harness end) drops them.
  *
  * For benchmark honesty, shared lookups record which keys were HIT after
  * an earlier query had already requested them ([[warmKeys]] /
  * [[resetWarmTracking]]): Bench emits the queries that rode a warm shared
  * stage so their per-query times are never mistaken for cold-path cost.
  *
  * State is per-session and lives until [[releaseAll]] or until the
  * session's SparkContext stops: cached DataFrames strongly reference
  * their session, so weak keys could never collect an entry — instead a
  * SparkListener purges the entry eagerly at application end, and every
  * registry access additionally sweeps entries whose context has stopped
  * (belt and braces: the listener bus can be drained late).
  */
object Pins {

  private final class State {
    val ephemeral = scala.collection.mutable.Buffer.empty[DataFrame]
    val shared = scala.collection.mutable.LinkedHashMap.empty[(String, String), DataFrame]
    /** shared keys requested by an EARLIER query of this run */
    val seenBefore = scala.collection.mutable.Set.empty[(String, String)]
    /** shared keys hit this query that were seen before (→ warm) */
    val warmHits = scala.collection.mutable.Set.empty[(String, String)]
  }

  private val bySession = scala.collection.mutable.LinkedHashMap.empty[SparkSession, State]

  private def state(s: SparkSession): State = bySession.synchronized {
    bySession.filterInPlace((sess, _) => !sess.sparkContext.isStopped)
    bySession.getOrElseUpdate(s, {
      // eager purge at context stop (round 10): without it, a process
      // that stops its last session but keeps running would hold this
      // session's State (and its DataFrame graph) until the next
      // registry access from ANY session
      s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
          purge(s)
      })
      new State
    })
  }

  /** Drop a session's registry entry entirely (the listener's eager path;
    * also callable by a host that discards a session without stopping the
    * shared context). Unpersists are best-effort: at application end the
    * blocks die with the executors anyway. */
  private[graft] def purge(s: SparkSession): Unit = {
    val st = bySession.synchronized { bySession.remove(s) }
    st.foreach { state =>
      state.synchronized {
        if (!s.sparkContext.isStopped) {
          state.ephemeral.foreach(df => scala.util.Try(df.unpersist(blocking = false)))
          state.shared.values.foreach(df => scala.util.Try(df.unpersist(blocking = false)))
        }
        state.ephemeral.clear(); state.shared.clear()
        state.seenBefore.clear(); state.warmHits.clear()
      }
    }
  }

  /** Pin an intra-query barrier; released between queries by the harness. */
  def ephemeral(df: DataFrame): DataFrame = {
    val st = state(df.sparkSession)
    st.synchronized { st.ephemeral += df }
    if (df.storageLevel == StorageLevel.NONE)
      df.persist(StorageLevel.MEMORY_AND_DISK)
    df
  }

  /** Memoized cross-query stage for (dir, kind); stays pinned until
    * [[releaseAll]]. Re-persists lazily if something cleared the cache.
    *
    * `build` (driver-side plan construction) runs OUTSIDE the state lock;
    * two racing builders both construct, first to register wins and the
    * loser's unregistered plan is simply dropped (no Spark action runs
    * inside `build`, so the duplicate work is cheap driver-only analysis). */
  def shared(s: SparkSession, dir: String, kind: String)
      (build: => DataFrame): DataFrame = {
    val st = state(s)
    val key = (dir, kind)
    val existing = st.synchronized {
      if (st.seenBefore(key)) st.warmHits += key
      st.shared.get(key)
    }
    val df = existing.getOrElse {
      val built = build
      st.synchronized(st.shared.getOrElseUpdate(key, built))
    }
    if (df.storageLevel == StorageLevel.NONE)
      df.persist(StorageLevel.MEMORY_AND_DISK)
    df
  }

  /** Drop the intra-query pins (harness calls this between queries). */
  def releaseEphemeral(s: SparkSession): Unit = {
    val st = state(s)
    st.synchronized {
      st.ephemeral.foreach(_.unpersist(blocking = false))
      st.ephemeral.clear()
      // a query boundary: everything shared that exists now was requested
      // by this-or-an-earlier query
      st.seenBefore ++= st.shared.keys
    }
  }

  /** Shared keys this query consumed that an earlier query already built. */
  def warmKeys(s: SparkSession): Set[(String, String)] = {
    val st = state(s)
    st.synchronized(st.warmHits.toSet)
  }

  def resetWarmTracking(s: SparkSession): Unit = {
    val st = state(s)
    st.synchronized(st.warmHits.clear())
  }

  /** Drop everything — harness end (or a memory-pressed caller). */
  def releaseAll(s: SparkSession): Unit = {
    val st = state(s)
    st.synchronized {
      st.ephemeral.foreach(_.unpersist(blocking = false))
      st.ephemeral.clear()
      st.shared.values.foreach(_.unpersist(blocking = false))
      st.shared.clear()
      st.seenBefore.clear()
      st.warmHits.clear()
    }
  }
}
