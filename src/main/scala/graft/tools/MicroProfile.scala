package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler for individual micro queries: times each named query's
  * stages separately so plan-level regressions (double computation, spills,
  * sampling passes) are attributable. Not part of the driver contract. */
object MicroProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // warm up codegen/shuffle
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val sfDir = sys.env.getOrElse("PROFILE_SF_DIR", "/tmp/sf10")
    val names = sys.env.getOrElse("PROFILE_ONLY", "micro_like_filter,micro_sort_int").split(",")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      time(s"$n (noop write)") {
        df.write.format("noop").mode("overwrite").save()
      }
      time(s"$n second run") {
        df.write.format("noop").mode("overwrite").save()
      }
      df.explain("formatted")
    }
    spark.stop()
  }
}
