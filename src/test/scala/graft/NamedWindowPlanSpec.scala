package graft

import org.scalatest.funsuite.AnyFunSuite

/** q110's three window functions share one named spec — Spark must plan
  * them into a single Window operator over one sort. */
class NamedWindowPlanSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  test("q110 named window: one shared spec plans as one Window operator") {
    val p = SparkEntry.queries("q110_named_window")(spark, sfDir)
      .asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.executedPlan.toString
    assert(p.contains("Window"), s"q110 lost its window:\n$p")
    val windowOps = p.linesIterator.count(l =>
      l.matches(".*\\bWindow\\b.*") && !l.contains("WindowSpec"))
    assert(windowOps == 1, s"q110 plans $windowOps Window operators (want 1):\n$p")
  }
}
