package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** SemDeDup verify kernel: given ONE k-means cell's members as an array of
  * `struct(vec_id, q, n)` SORTED by vec_id (ascending), emit
  * `(vec_id, dup_of)` for every member that has a smaller-id neighbor
  * within the integer-cosine threshold — dup_of is the SMALLEST such id,
  * exactly `groupBy(b).agg(min(a))` over the threshold-passing pairs.
  *
  * The threshold is the shared exact-integer test
  * `dot > 0 ∧ dot²·10⁴ ≥ tSq·|a|²·|b|²` with `tSq = (t·100)²`, identical
  * to the SQL oracle's arithmetic (no float epsilon at the boundary).
  *
  * Why a generator and not the a×b self-join + filter + min-aggregate: the
  * join materializes Σ|cell|²/2 rows, each copying both ~0.5 KB quantized
  * arrays through the joiner (at sf10: 45 M rows ≈ 45 GB of memcpy
  * dominating the runtime), while the arithmetic itself is small. Here the
  * pair loop runs INSIDE one eval per cell over decoded primitive arrays,
  * emits only the dup rows, and early-exits per member at the FIRST
  * passing neighbor (ascending scan ⇒ first = min id). CodegenFallback is
  * fine: eval is called once per CELL, not per pair — the hot loop is
  * inside.
  *
  * Scale contract: the input array is one cell's members, bounded by the
  * k-means cell size (k = ⌈√n⌉ in p49 keeps it ~√n) — the same bounded-
  * group contract as an LSH band bucket, never corpus-sized. The
  * degenerate exception is a corpus where a large mass of vectors is
  * IDENTICAL (they tie to one cell regardless of k): identical vectors
  * are exact duplicates, which a real pipeline removes with digest dedup
  * (the p05 kernel) before paying for near-dup search — SCALE.md carries
  * the row. */
case class CellNearDupPairs(child: Expression, tSqTimes1e4: Long)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("dup_of", LongType, nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(
        StructField(_, LongType, _, _),
        StructField(_, ArrayType(LongType, _), _, _),
        StructField(_, LongType, _, _))), _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cell_neardup_pairs needs ARRAY<STRUCT<BIGINT, ARRAY<BIGINT>, BIGINT>>, got $other")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val data = child.eval(input)
    if (data == null) return Nil
    val arr = data.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m < 2) return Nil
    val ids = new Array[Long](m)
    val qs = new Array[Array[Long]](m)
    val ns = new Array[Long](m)
    var i = 0
    while (i < m) {
      val st = arr.getStruct(i, 3)
      ids(i) = st.getLong(0)
      qs(i) = st.getArray(1).toLongArray()
      ns(i) = st.getLong(2)
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var b = 1
    while (b < m) {
      val qb = qs(b); val nb = ns(b)
      var dup = -1L
      var a = 0
      while (a < b && dup < 0) {
        val qa = qs(a)
        val n = math.min(qa.length, qb.length)
        var dot = 0L
        var k = 0
        while (k < n) { dot += qa(k) * qb(k); k += 1 }
        if (dot > 0 && dot * dot * 10000L >= tSqTimes1e4 * ns(a) * nb) dup = ids(a)
        a += 1
      }
      if (dup >= 0) out += InternalRow(ids(b), dup)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
