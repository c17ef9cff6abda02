package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level string-similarity kernels with DuckDB's exact semantics
  * (`text_similarity.cpp` family: jaccard / jaro / jaro_winkler /
  * damerau_levenshtein / levenshtein / hamming). All operate on the UTF-8
  * BYTES of the string — DuckDB measured `hamming('é','á') = 1` and
  * `levenshtein('éclair','eclair') = 2`, i.e. multi-byte code points count
  * per byte — which also makes the kernels allocation-light (no decode).
  * Static-object methods so generated code calls them directly. */
object StringSimKernels {

  /** Jaccard similarity of the byte SETS (multiset-insensitive:
    * DuckDB `jaccard('aab','ab') = 1.0`). Empty input is an error in
    * DuckDB ("An argument too short") — mirrored. */
  def jaccard(a: UTF8String, b: UTF8String): Double = {
    val x = a.getBytes; val y = b.getBytes
    if (x.length == 0 || y.length == 0)
      throw new IllegalArgumentException("Jaccard Function: An argument too short!")
    val sa = new Array[Long](4); val sb = new Array[Long](4)
    var i = 0
    while (i < x.length) { val v = x(i) & 0xff; sa(v >> 6) |= 1L << (v & 63); i += 1 }
    i = 0
    while (i < y.length) { val v = y(i) & 0xff; sb(v >> 6) |= 1L << (v & 63); i += 1 }
    var inter = 0; var union = 0
    i = 0
    while (i < 4) {
      inter += java.lang.Long.bitCount(sa(i) & sb(i))
      union += java.lang.Long.bitCount(sa(i) | sb(i))
      i += 1
    }
    inter.toDouble / union.toDouble
  }

  /** Differing-byte count; DuckDB requires equal (byte) lengths AND
    * rejects empty inputs (DuckDB 1.0.0 throws even for ''-vs-''). */
  def hamming(a: UTF8String, b: UTF8String): Long = {
    val x = a.getBytes; val y = b.getBytes
    if (x.length != y.length)
      throw new IllegalArgumentException(
        "Mismatch Function: Strings must be of equal length!")
    if (x.length == 0)
      throw new IllegalArgumentException(
        "Mismatch Function: Strings must be of length > 0!")
    var n = 0L; var i = 0
    while (i < x.length) { if (x(i) != y(i)) n += 1; i += 1 }
    n
  }

  /** Standard Jaro similarity over bytes (match window
    * `max(len)/2 - 1`, half-transposition counting). */
  def jaro(a: UTF8String, b: UTF8String): Double = {
    val x = a.getBytes; val y = b.getBytes
    jaroBytes(x, y)
  }

  private def jaroBytes(x: Array[Byte], y: Array[Byte]): Double = {
    val la = x.length; val lb = y.length
    // DuckDB 1.0.0 returns 0.0 whenever either side is empty — INCLUDING
    // jaro('','') (not the textbook 1.0 for two equal empty strings).
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val ma = new Array[Boolean](la); val mb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window); val hi = math.min(lb - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!mb(j) && x(i) == y(j)) { ma(i) = true; mb(j) = true; m += 1; done = true }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0; var k = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (x(i) != y(k)) t += 1
        k += 1
      }
      i += 1
    }
    val tr = t / 2
    (m.toDouble / la + m.toDouble / lb + (m - tr).toDouble / m) / 3.0
  }

  /** Jaro-Winkler: prefix boost (≤4 bytes, scale 0.1) applied only when
    * the Jaro score exceeds 0.7 (DuckDB: `jw('abcdXXXX','abcdYYYY')` stays
    * at its 0.667 Jaro despite the length-4 common prefix). */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val x = a.getBytes; val y = b.getBytes
    val j = jaroBytes(x, y)
    if (j <= 0.7) return j
    var l = 0
    val max = math.min(4, math.min(x.length, y.length))
    while (l < max && x(l) == y(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }

  /** Unrestricted Damerau-Levenshtein (true DL, not OSA: DuckDB
    * `damerau_levenshtein('CA','ABC') = 2`) over the 256-byte alphabet. */
  def damerauLevenshtein(a: UTF8String, b: UTF8String): Long = {
    val x = a.getBytes; val y = b.getBytes
    val la = x.length; val lb = y.length
    if (la == 0) return lb.toLong
    if (lb == 0) return la.toLong
    val w = lb + 2
    val d = new Array[Int]((la + 2) * w)
    @inline def get(i: Int, j: Int): Int = d(i * w + j)
    @inline def set(i: Int, j: Int, v: Int): Unit = d(i * w + j) = v
    val maxDist = la + lb
    val da = new Array[Int](256)
    set(0, 0, maxDist)
    var i = 0
    while (i <= la) { set(i + 1, 0, maxDist); set(i + 1, 1, i); i += 1 }
    var j = 0
    while (j <= lb) { set(0, j + 1, maxDist); set(1, j + 1, j); j += 1 }
    i = 1
    while (i <= la) {
      var db = 0
      j = 1
      while (j <= lb) {
        val k = da(y(j - 1) & 0xff)
        val l = db
        val cost = if (x(i - 1) == y(j - 1)) { db = j; 0 } else 1
        var best = get(i, j) + cost
        val ins = get(i + 1, j) + 1
        if (ins < best) best = ins
        val del = get(i, j + 1) + 1
        if (del < best) best = del
        val trans = get(k, l) + (i - k - 1) + 1 + (j - l - 1)
        if (trans < best) best = trans
        set(i + 1, j + 1, best)
        j += 1
      }
      da(x(i - 1) & 0xff) = i
      i += 1
    }
    get(la + 1, lb + 1).toLong
  }

  /** Byte-level Levenshtein (DuckDB semantics; Spark's built-in counts
    * code points, which diverges on non-ASCII). Two-row DP. */
  def levenshtein(a: UTF8String, b: UTF8String): Long = {
    val x = a.getBytes; val y = b.getBytes
    val la = x.length; val lb = y.length
    if (la == 0) return lb.toLong
    if (lb == 0) return la.toLong
    var prev = new Array[Int](lb + 1)
    var cur = new Array[Int](lb + 1)
    var j = 0
    while (j <= lb) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= la) {
      cur(0) = i
      j = 1
      while (j <= lb) {
        val cost = if (x(i - 1) == y(j - 1)) 0 else 1
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        j += 1
      }
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    prev(lb).toLong
  }
}

/** The DuckDB text-similarity scalars as codegen Catalyst expressions.
  * `kind` selects the kernel; result type is DOUBLE for the similarity
  * scores and BIGINT for the distances, exactly DuckDB's signatures. */
case class StringSimilarity(left: Expression, right: Expression, kind: String)
    extends BinaryExpression {

  require(StringSimilarity.kernels.contains(kind),
    s"unknown similarity kind $kind")

  override def dataType: DataType = kind match {
    case "jaccard" | "jaro" | "jaro_winkler" => DoubleType
    case _ => LongType
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t.isInstanceOf[StringType] || t == NullType
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$kind needs (STRING, STRING), got (${left.dataType}, ${right.dataType})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[UTF8String]; val y = b.asInstanceOf[UTF8String]
    kind match {
      case "jaccard" => StringSimKernels.jaccard(x, y)
      case "hamming" => StringSimKernels.hamming(x, y)
      case "jaro" => StringSimKernels.jaro(x, y)
      case "jaro_winkler" => StringSimKernels.jaroWinkler(x, y)
      case "damerau_levenshtein" => StringSimKernels.damerauLevenshtein(x, y)
      case "levenshtein" => StringSimKernels.levenshtein(x, y)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    if (left.dataType == NullType || right.dataType == NullType) {
      // a NULL-typed operand can never produce a value; emit constant null
      // (the generic path would pass an Object-typed slot to the kernel)
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
      val javaType = CodeGenerator.javaType(dataType)
      return ev.copy(code =
        code"""
          boolean ${ev.isNull} = true;
          $javaType ${ev.value} = ${CodeGenerator.defaultValue(dataType)};""")
    }
    val fun = StringSimilarity.kernels(kind)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.StringSimKernels.$fun($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object StringSimilarity {
  val kernels: Map[String, String] = Map(
    "jaccard" -> "jaccard",
    "hamming" -> "hamming",
    "jaro" -> "jaro",
    "jaro_winkler" -> "jaroWinkler",
    "damerau_levenshtein" -> "damerauLevenshtein",
    "levenshtein" -> "levenshtein")
}
