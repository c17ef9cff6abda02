package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused k-means assignment kernel: for one quantized vector, the nearest
  * centroid (exact integer L2) over a COMPILE-TIME centroid table, returned
  * as struct(cell, dist). Ties break to the smallest cell id (the table is
  * sorted by cell at construction and the scan keeps the first strict
  * minimum) — identical to `min(struct(dist, cell))`.
  *
  * Why an expression and not a crossJoin + argmin aggregate: the join form
  * materializes n·k rows, each copying BOTH array payloads (~1 KB/row for
  * 64-dim int8-quantized longs) through the joiner and the aggregate —
  * measured 83 s per assignment round at sf10 (200k vectors × 781 cells),
  * pure row-machinery cost, while the arithmetic itself is ~6 GFLOP-equiv.
  * Here the k×dim loop runs INSIDE whole-stage codegen over the vector
  * scan: one row per vector ever exists, the centroid table rides along as
  * a reference object (same broadcast-sized data a BroadcastHashJoin would
  * ship), and the measured round drops to ~2 s.
  *
  * The centroid table is bounded by the k-means cell count (the same
  * contract as a broadcast join's build side), so shipping it inside the
  * serialized expression is the plan-shape equivalent of a broadcast —
  * never data-sized. */
case class NearestCell(child: Expression,
    cellsIn: Seq[Long], centsIn: Seq[Seq[Long]])
    extends UnaryExpression {

  require(cellsIn.length == centsIn.length && cellsIn.nonEmpty,
    "nearest_cell needs one centroid array per cell id")

  // sorted by cell id so the first strict minimum = smallest cell on ties
  private lazy val sortedPairs: Array[(Long, Array[Long])] =
    cellsIn.zip(centsIn.map(_.toArray)).sortBy(_._1).toArray
  private lazy val cells: Array[Long] = sortedPairs.map(_._1)
  private lazy val cents: Array[Array[Long]] = sortedPairs.map(_._2)

  override def dataType: DataType = StructType(Seq(
    StructField("cell", LongType, nullable = false),
    StructField("dist", LongType, nullable = false)))
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"nearest_cell needs ARRAY<BIGINT> quantized vectors, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val q = input.asInstanceOf[ArrayData]
    var bestDist = Long.MaxValue
    var bestCell = -1L
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      val n = math.min(q.numElements(), c.length)
      var acc = 0L
      var i = 0
      while (i < n) { val d = q.getLong(i) - c(i); acc += d * d; i += 1 }
      if (acc < bestDist) { bestDist = acc; bestCell = cells(j) }
      j += 1
    }
    InternalRow(bestCell, bestDist)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cellsRef = ctx.addReferenceObj("ncCells", cells, "long[]")
    val centsRef = ctx.addReferenceObj("ncCents", cents, "long[][]")
    nullSafeCodeGen(ctx, ev, q => {
      val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
      val d = ctx.freshName("d"); val c = ctx.freshName("c")
      val bd = ctx.freshName("bestDist"); val bc = ctx.freshName("bestCell")
      s"""
         |long $bd = Long.MAX_VALUE;
         |long $bc = -1L;
         |for (int $j = 0; $j < $centsRef.length; $j++) {
         |  long[] $c = $centsRef[$j];
         |  int $n = java.lang.Math.min($q.numElements(), $c.length);
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $d = $q.getLong($i) - $c[$i];
         |    $acc += $d * $d;
         |  }
         |  if ($acc < $bd) { $bd = $acc; $bc = $cellsRef[$j]; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{$bc, $bd});
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
