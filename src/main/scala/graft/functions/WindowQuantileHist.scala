package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream,
  DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-augmented AVL over distinct values — the run-length histogram
  * buffer for [[WindowQuantileHist]]. Each node carries the value's
  * multiplicity and the subtree's total multiplicity, so rank selection
  * (`selectRank`, 0-based over the value multiset) is O(log d) — the
  * property that keeps a RUNNING quantile window O(n log d) on a
  * high-cardinality measure, where a per-eval walk (or per-row sort)
  * would be O(n·d). In-order traversal yields the sorted run-length
  * pairs for entropy, merge and serialization. */
final class QuantileHistBuffer(val ord: java.util.Comparator[AnyRef]) {

  final class Node(val key: AnyRef, var cnt: Long) {
    var total: Long = cnt
    var height: Int = 1
    var left: Node = _
    var right: Node = _
  }

  private var root: Node = _
  /** Σ multiplicities (count of non-null rows in the frame). */
  var n: Long = 0L

  private def h(x: Node): Int = if (x == null) 0 else x.height
  private def t(x: Node): Long = if (x == null) 0L else x.total
  private def upd(x: Node): Unit = {
    x.height = 1 + math.max(h(x.left), h(x.right))
    x.total = x.cnt + t(x.left) + t(x.right)
  }
  private def rotR(y: Node): Node = {
    val x = y.left; y.left = x.right; x.right = y; upd(y); upd(x); x
  }
  private def rotL(x: Node): Node = {
    val y = x.right; x.right = y.left; y.left = x; upd(x); upd(y); y
  }
  private def balance(x: Node): Node = {
    upd(x)
    val bf = h(x.left) - h(x.right)
    if (bf > 1) {
      if (h(x.left.left) >= h(x.left.right)) rotR(x)
      else { x.left = rotL(x.left); rotR(x) }
    } else if (bf < -1) {
      if (h(x.right.right) >= h(x.right.left)) rotL(x)
      else { x.right = rotR(x.right); rotL(x) }
    } else x
  }
  private def ins(x: Node, key: AnyRef, c: Long): Node =
    if (x == null) new Node(key, c)
    else {
      val cmp = ord.compare(key, x.key)
      if (cmp == 0) { x.cnt += c; upd(x); x }
      else if (cmp < 0) { x.left = ins(x.left, key, c); balance(x) }
      else { x.right = ins(x.right, key, c); balance(x) }
    }

  def add(key: AnyRef, c: Long): Unit = { root = ins(root, key, c); n += c }

  /** Value at 0-based rank over the multiset; ranks past the end clamp to
    * the maximum (mirrors the composite's guarded element_at use). */
  def selectRank(rank: Long): AnyRef = {
    var x = root
    var k = rank
    while (x != null) {
      val lt = t(x.left)
      if (k < lt) x = x.left
      else if (k < lt + x.cnt) return x.key
      else { k -= lt + x.cnt; x = x.right }
    }
    var m = root
    while (m.right != null) m = m.right
    m.key
  }

  /** In-order (value-ascending) visit of the (value, count) runs. */
  def foreachRun(f: (AnyRef, Long) => Unit): Unit = {
    var stack = List.empty[Node]
    var x = root
    while (x != null || stack.nonEmpty) {
      while (x != null) { stack = x :: stack; x = x.left }
      val y = stack.head
      stack = stack.tail
      f(y.key, y.cnt)
      x = y.right
    }
  }
}

/** Exact quantile statistics as a WINDOW-capable imperative aggregate over
  * a value→count run-length histogram ([[QuantileHistBuffer]]) — the
  * scale shape for ordered/sliding quantile frames.
  *
  * Why this exists: whole-partition quantile windows ride
  * [[ExactQuantileRule]]'s distributed histogram stitch, but ordered /
  * sliding frames used the collect_list composite, which materializes the
  * WHOLE FRAME as an array per output row — O(partition²) window-buffer
  * bytes on a long running frame, the last data-sized window state at
  * 100×. This aggregate keeps ONE O(distinct-values) buffer per in-flight
  * partition instead:
  *
  *  - running frames ([UNBOUNDED PRECEDING, CURRENT ROW] in any mode):
  *    Spark's unbounded-preceding frame machinery feeds each row through
  *    `update` ONCE and calls `eval` per row — O(log d) insert + O(log d)
  *    rank selection, no per-row array, no per-row sort;
  *  - sliding frames: Spark re-aggregates the frame per slide (no
  *    retraction exists), so CPU is O(frame·log d) per row like any
  *    engine's per-frame exact quantile — but the state is still the O(d)
  *    histogram and the output a scalar, never a buffered frame array.
  *
  * Selection semantics mirror [[QuantileFallbackRule]]'s composite (and
  * so the probe-pinned DuckDB behavior) exactly, per mode:
  *
  *  - `disc`: element at 1-based index max(1, ceil(q·n)) of the sorted
  *    multiset, original type preserved;
  *  - `cont_dec`: straddle elements at pos = q·(n−1), DuckDB's truncated
  *    unscaled interpolation ([[QuantileAggs.truncDecimalInterp]]'s
  *    arithmetic: ≤18 digits on longs, wider via the BigInteger→double
  *    kernels in [[MathStringFns]]);
  *  - `cont_ts`: epoch-micros straddle interpolation over TimestampType
  *    input (the rewriter casts DATE/TIMESTAMP_NTZ in, and restores a
  *    declared NTZ output with an outer Cast);
  *  - `entropy`: log₂(n) − Σ c·log₂(c)/n over the value distribution
  *    (an O(d) in-order walk — entropy inputs are categorical), 0.0 for
  *    an empty/all-NULL frame (probed duckdb 1.0).
  *
  * Buffer values are boxed atomic internals (numbers, UTF8String, Decimal,
  * date days, timestamp micros) ordered by the type's interpreted
  * ordering; serialization is the standard pair-projection stream (the
  * same idiom Spark's Percentile buffer uses). DISTINCT / FILTER markers
  * stay on the composite path — Spark's window operator does not accept
  * them on any aggregate.
  *
  * Reference surface: duckdb window quantile/median/entropy over ordered
  * frames (window_segment_tree / quantile window path); semantics pinned
  * by probe, implementation Spark-native. */
case class WindowQuantileHist(
    child: Expression,
    mode: String,
    qs: Seq[Double],
    isArray: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileHistBuffer]
  with UnaryLike[Expression] {

  import WindowQuantileHist._

  override def prettyName: String = "graft_window_quantile"
  override def nullable: Boolean = true

  override def dataType: DataType = {
    val elem = mode match {
      case Disc => child.dataType
      case ContDec => child.dataType
      case ContTs => TimestampType
      case Entropy => DoubleType
    }
    if (isArray) ArrayType(elem, containsNull = true) else elem
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = child.dataType match {
      case _: NumericType | _: StringType | DateType | TimestampType |
          TimestampNTZType | BooleanType => true
      case _ => false
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        s"$prettyName needs an atomic orderable input, got " +
          child.dataType.sql)
  }

  @transient private lazy val ord: java.util.Comparator[AnyRef] = {
    val base = TypeUtils.getInterpretedOrdering(child.dataType)
    new java.util.Comparator[AnyRef] {
      override def compare(a: AnyRef, b: AnyRef): Int = base.compare(a, b)
    }
  }

  override def createAggregationBuffer(): QuantileHistBuffer =
    new QuantileHistBuffer(ord)

  override def update(buf: QuantileHistBuffer,
      input: InternalRow): QuantileHistBuffer = {
    val v = child.eval(input)
    if (v != null) {
      // unsafe-row string values share the row's byte buffer — copy
      val key = v match {
        case s: UTF8String => s.clone()
        case other => other.asInstanceOf[AnyRef]
      }
      buf.add(key, 1L)
    }
    buf
  }

  override def merge(buf: QuantileHistBuffer,
      other: QuantileHistBuffer): QuantileHistBuffer = {
    other.foreachRun((k, c) => buf.add(k, c))
    buf
  }

  override def eval(buf: QuantileHistBuffer): Any = {
    val n = buf.n
    if (mode == Entropy) {
      // duckdb: entropy of an EMPTY/all-NULL frame is 0.0, not NULL
      if (n == 0L) return 0.0
      // StrictMath.log for bit parity with Spark's Log2 in the composite
      def log2(x: Double): Double =
        java.lang.StrictMath.log(x) / java.lang.StrictMath.log(2.0)
      var sumClogC = 0.0
      buf.foreachRun((_, c) => sumClogC += c.toDouble * log2(c.toDouble))
      return log2(n.toDouble) - sumClogC / n
    }
    if (n == 0L) return null
    def select(q: Double): Any = mode match {
      case Disc =>
        // 1-based index max(1, ceil(q·n)) — same double math as the
        // composite's Ceil(q × CAST(n AS DOUBLE))
        val idx = math.max(1L, math.ceil(q * n.toDouble).toLong)
        buf.selectRank(idx - 1L)
      case ContDec =>
        val d = child.dataType.asInstanceOf[DecimalType]
        val pos = q * (n.toDouble - 1.0)
        val f = math.floor(pos)
        val frac = pos - f
        val lo = buf.selectRank(f.toLong).asInstanceOf[Decimal]
        val hi = buf.selectRank(math.ceil(pos).toLong).asInstanceOf[Decimal]
        if (d.precision <= 18) {
          val loU = lo.toUnscaledLong
          val dU = hi.toUnscaledLong - loU
          val exact = loU.toDouble + dU.toDouble * frac
          Decimal(exact.toLong, d.precision, d.scale)
        } else {
          val loU = MathStringFns.unscaledDouble(lo)
          val exact = loU + (MathStringFns.unscaledDouble(hi) - loU) * frac
          MathStringFns.decimalFromUnscaledDouble(exact, d.precision, d.scale)
        }
      case ContTs =>
        val pos = q * (n.toDouble - 1.0)
        val f = math.floor(pos)
        val frac = pos - f
        val loU = buf.selectRank(f.toLong)
          .asInstanceOf[java.lang.Long].longValue.toDouble
        val hiU = buf.selectRank(math.ceil(pos).toLong)
          .asInstanceOf[java.lang.Long].longValue.toDouble
        (loU + (hiU - loU) * frac).toLong
    }
    if (isArray) new GenericArrayData(qs.map(q => select(q)).toArray)
    else select(qs.head)
  }

  // --- the standard pair-projection buffer stream (Percentile's idiom) ---

  override def serialize(obj: QuantileHistBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    try {
      val projection =
        UnsafeProjection.create(Array[DataType](child.dataType, LongType))
      val buffer = new Array[Byte](4096)
      obj.foreachRun { (k, c) =>
        val row = projection.apply(InternalRow(k, c))
        out.writeInt(row.getSizeInBytes)
        row.writeToStream(out, buffer)
      }
      out.writeInt(-1)
      out.flush()
      bos.toByteArray
    } finally {
      out.close()
      bos.close()
    }
  }

  override def deserialize(bytes: Array[Byte]): QuantileHistBuffer = {
    val bis = new ByteArrayInputStream(bytes)
    val ins = new DataInputStream(bis)
    try {
      val counts = createAggregationBuffer()
      var size = ins.readInt()
      while (size >= 0) {
        val bs = new Array[Byte](size)
        ins.readFully(bs)
        val row = new UnsafeRow(2)
        row.pointTo(bs, size)
        counts.add(row.get(0, child.dataType).asInstanceOf[AnyRef],
          row.getLong(1))
        size = ins.readInt()
      }
      counts
    } finally {
      ins.close()
      bis.close()
    }
  }

  override def withNewMutableAggBufferOffset(
      newOffset: Int): WindowQuantileHist =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(
      newOffset: Int): WindowQuantileHist =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): WindowQuantileHist = copy(child = newChild)
}

object WindowQuantileHist {
  val Disc = "disc"
  val ContDec = "cont_dec"
  val ContTs = "cont_ts"
  val Entropy = "entropy"
}
