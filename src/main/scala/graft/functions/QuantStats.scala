package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** One-pass symmetric int8 quantization statistics over a numeric vector —
  * the p34 kernel as a single codegen'd expression instead of a chain of
  * five interpreted higher-order functions (`transform`/`aggregate` box
  * every element and allocate an intermediate array per step; this loop
  * reads primitives in place — measured 4.8×-native → well under 1× at
  * sf10 after the switch).
  *
  * Returns `ARRAY<DOUBLE>` `[scale, q_sum, q_l1, q_min, q_max]` where
  * scale = 127 / max|x| (1.0 for an all-zero vector) and
  * q_i = ⌊x_i·scale + 0.5⌋ — floor-plus-half, matching the DuckDB oracle
  * bit-for-bit. The integer stats are exact in DOUBLE (|q_i| ≤ 127, dims
  * ≪ 2^45). Empty arrays yield all zeros with scale 1.0.
  */
case class QuantStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType | LongType | IntegerType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"quant_stats needs a numeric array, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val dt = Vec.elem(child)
    val n = a.numElements()
    var amax = 0.0
    var i = 0
    while (i < n) {
      val v = math.abs(Vec.get(dt, a, i))
      if (v > amax) amax = v
      i += 1
    }
    val scale = if (amax > 0.0) 127.0 / amax else 1.0
    var sum = 0L
    var l1 = 0L
    var mn = 0L
    var mx = 0L
    i = 0
    while (i < n) {
      val q = math.floor(Vec.get(dt, a, i) * scale + 0.5).toLong
      sum += q
      l1 += math.abs(q)
      if (i == 0 || q < mn) mn = q
      if (i == 0 || q > mx) mx = q
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      Array[Double](scale, sum.toDouble, l1.toDouble, mn.toDouble, mx.toDouble))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val amax = ctx.freshName("amax")
      val scale = ctx.freshName("scale")
      val v = ctx.freshName("v")
      val q = ctx.freshName("q")
      val sum = ctx.freshName("sum")
      val l1 = ctx.freshName("l1")
      val mn = ctx.freshName("mn")
      val mx = ctx.freshName("mx")
      val get = Vec.getterCode(Vec.elem(child), a, i)
      s"""
         |int $n = $a.numElements();
         |double $amax = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = java.lang.Math.abs($get);
         |  if ($v > $amax) $amax = $v;
         |}
         |double $scale = $amax > 0.0 ? 127.0 / $amax : 1.0;
         |long $sum = 0L; long $l1 = 0L; long $mn = 0L; long $mx = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $q = (long) java.lang.Math.floor($get * $scale + 0.5);
         |  $sum += $q;
         |  $l1 += java.lang.Math.abs($q);
         |  if ($i == 0 || $q < $mn) $mn = $q;
         |  if ($i == 0 || $q > $mx) $mx = $q;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(new double[]{
         |    $scale, (double) $sum, (double) $l1, (double) $mn, (double) $mx});
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
