package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise vector SUM aggregate over `ARRAY<numeric>` columns —
  * the grouped-vector-aggregation kernel (label centroids, gradient-style
  * reductions) as a first-class Catalyst aggregate.
  *
  * Why not `posexplode → groupBy(key, pos) → re-assemble`: that shape
  * shuffles `rows × dim` scalar records. A TypedImperativeAggregate
  * **partial-aggregates map-side** like any built-in sum, so the shuffle
  * carries one `dim`-length buffer per (map task × group) — at 100 TB with
  * a handful of labels that is 5 arrays per task instead of 10⁹ exploded
  * rows. Mixed float/double/int/long element types widen to double.
  *
  * Null elements count as 0; vectors of differing lengths sum over the
  * longer length (missing elements are 0), matching SQL sum's
  * null-tolerant spirit. Null input rows are skipped.
  */
case class VecSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType | LongType | IntegerType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_sum needs a numeric array, got $other")
  }

  private lazy val elemType = child.dataType.asInstanceOf[ArrayType].elementType
  private lazy val elemNullable = child.dataType.asInstanceOf[ArrayType].containsNull

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  private def grow(buf: Array[Double], n: Int): Array[Double] =
    if (buf.length >= n) buf
    else java.util.Arrays.copyOf(buf, n)

  // type dispatch hoisted out of the per-element hot loop (one virtual call
  // per element instead of a pattern match per element per row)
  private lazy val get: (ArrayData, Int) => Double = elemType match {
    case FloatType => (a, i) => a.getFloat(i).toDouble
    case DoubleType => (a, i) => a.getDouble(i)
    case LongType => (a, i) => a.getLong(i).toDouble
    case IntegerType => (a, i) => a.getInt(i).toDouble
    case other => throw new IllegalStateException(s"unsupported $other")
  }

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = grow(buf, n)
    val g = get
    var i = 0
    while (i < n) {
      if (!(elemNullable && arr.isNullAt(i))) out(i) += g(arr, i)
      i += 1
    }
    out
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    val out = grow(a, b.length)
    var i = 0
    while (i < b.length) { out(i) += b(i); i += 1 }
    out
  }

  override def eval(buf: Array[Double]): Any =
    if (buf.isEmpty) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getDouble())
  }

  override def withNewMutableAggBufferOffset(offset: Int): VecSumAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): VecSumAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}
