package graft

import graft.ingest.JsonIngest
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The reference's JSON analyzer golden table
  * (lib/test/json_analyzer_test.cc:65-410), ported case by case. Unsigned
  * types are widened per SURVEY §1.3: uint32 → long, uint64 → decimal(20,0);
  * Arrow `null` type materializes as string.
  *
  * Includes the pinned quirk (json_analyzer.cc:354-356): an int32 sign
  * conflict resolves to int64 on the COLUMN path but uint64 on the ROW path
  * — the *tested* behavior, not the apparent intent (SURVEY §7.3). */
class JsonGoldenSpec extends AnyFunSuite {

  private def rowSchema(json: String): StructType = {
    val p = Files.createTempFile("golden", ".json")
    Files.writeString(p, json)
    assert(JsonIngest.detectShape(p.toString) === JsonIngest.RowArray)
    JsonIngest.analyzeRowArray(p.toString)
  }

  private def colSchema(json: String): StructType = {
    val p = Files.createTempFile("golden", ".json")
    Files.writeString(p, json)
    assert(JsonIngest.detectShape(p.toString) === JsonIngest.ColumnObject)
    JsonIngest.readColumnObject(p.toString, None)._1
  }

  private def field(s: StructType, n: String): DataType = s(n).dataType

  // ---- column-major goldens
  test("cols_empty: {} → empty struct") {
    assert(colSchema("{}").isEmpty)
  }
  test("cols_empty_col: null type → string (§1.3)") {
    assert(field(colSchema("""{"a": []}"""), "a") === StringType)
  }
  test("cols_single_bool") {
    assert(field(colSchema("""{"a": [true, true, false]}"""), "a") === BooleanType)
  }
  test("cols_single_i32") {
    assert(field(colSchema("""{"a": [1, 2, 3]}"""), "a") === IntegerType)
  }
  test("cols_single_u32 → widened long (§1.3)") {
    assert(field(colSchema("""{"a": [1, 2, 2147483648]}"""), "a") === LongType)
  }
  test("cols_i32_sign_conflict → int64") {
    assert(field(colSchema("""{"a": [1, -2, 2147483648]}"""), "a") === LongType)
  }
  test("cols_u64 → decimal(20,0) (§1.3 uint64)") {
    assert(field(colSchema("""{"a": [1, 2, 9223372036854775808]}"""), "a")
      === DecimalType(20, 0))
  }
  test("cols_u64_sign_conflict → double") {
    assert(field(colSchema("""{"a": [-1, 2, 9223372036854775808]}"""), "a")
      === DoubleType)
  }
  test("cols_f64") {
    assert(field(colSchema("""{"a": [1.0, 2.0, 3.0]}"""), "a") === DoubleType)
  }
  test("cols_f64_mixed_1: int/double/bool mix → double") {
    assert(field(colSchema("""{"a": [1, -2, 3.0, true]}"""), "a") === DoubleType)
  }
  test("cols_timestamp_1 incl. HH:mm short form") {
    val s = colSchema(
      """{"a": ["2007-08-31 16:47", "2007-12-24 18:21", "2008-02-01 09:00:22"]}""")
    assert(field(s, "a") === TimestampType)
  }
  test("cols_timestamp_mixed_1: epoch ints + timestamp strings → timestamp") {
    val s = colSchema("""{"a": [1, 2, "2008-02-01 09:00:22", "2009-01-01 12:00:00"]}""")
    assert(field(s, "a") === TimestampType)
  }
  test("cols_3: multi-column, sorted by name") {
    val s = colSchema(
      """{"a": [1, -2, 3], "b": ["c", "d", "e"], "f": [true, true, false]}""")
    assert(s.fieldNames.toSeq === Seq("a", "b", "f"))
    assert(field(s, "a") === IntegerType)
    assert(field(s, "b") === StringType)
    assert(field(s, "f") === BooleanType)
  }

  // ---- row-major goldens
  test("rows_empty") {
    assert(rowSchema("[]").isEmpty)
  }
  test("rows_single_i32") {
    assert(field(rowSchema("""[{"a": 1}, {"a": 2}, {"a": 3}]"""), "a") === IntegerType)
  }
  test("rows_single_u32 → widened long") {
    assert(field(rowSchema("""[{"a": 1}, {"a": 2}, {"a": 2147483648}]"""), "a")
      === LongType)
  }
  test("rows_i32_sign_conflict → uint64 quirk → decimal(20,0)") {
    assert(field(rowSchema("""[{"a": 1}, {"a": -2}, {"a": 2147483648}]"""), "a")
      === DecimalType(20, 0))
  }
  test("rows_u64 → decimal(20,0)") {
    assert(field(rowSchema("""[{"a": 1}, {"a": 9223372036854775808}]"""), "a")
      === DecimalType(20, 0))
  }
  test("rows_u64_sign_conflict → double") {
    assert(field(rowSchema("""[{"a": -1}, {"a": 9223372036854775808}]"""), "a")
      === DoubleType)
  }
  test("rows_f64_mixed_1 → double") {
    assert(field(rowSchema("""[{"a": 1}, {"a": -2}, {"a": 3.0}, {"a": true}]"""), "a")
      === DoubleType)
  }
  test("rows_timestamp_1 and mixed") {
    assert(field(rowSchema(
      """[{"a": "2007-08-31 16:47"}, {"a": "2009-06-30 18:30:00"}]"""), "a")
      === TimestampType)
    assert(field(rowSchema(
      """[{"a": 1}, {"a": "2008-02-01 09:00:22"}]"""), "a") === TimestampType)
  }
  test("rows_nested_1: nested struct, numerics fingerprint to double") {
    val s = rowSchema(
      """[{"a": {"b": 1, "c": 2}}, {"a": {"b": 3, "c": 4}}, {"a": {"b": 5, "c": 6}}]""")
    assert(field(s, "a") ===
      StructType(Seq(StructField("b", DoubleType), StructField("c", DoubleType))))
  }
  test("vega movies slice: nulls, mixed, sorted (json_analyzer_test.cc movies_4)") {
    val s = rowSchema(
      """[{"Title": "The Land Girls", "US Gross": 146083, "US DVD Sales": null,
        |  "IMDB Rating": 6.1, "IMDB Votes": 1071, "Rotten Tomatoes Rating": null},
        | {"Title": "Slam", "US Gross": 1009819, "US DVD Sales": null,
        |  "IMDB Rating": 3.4, "IMDB Votes": 165, "Rotten Tomatoes Rating": 62}]""".stripMargin)
    assert(s.fieldNames.toSeq === s.fieldNames.toSeq.sorted)
    assert(field(s, "Title") === StringType)
    assert(field(s, "US Gross") === IntegerType)
    assert(field(s, "US DVD Sales") === StringType) // all-null → null → string
    assert(field(s, "IMDB Rating") === DoubleType)
    assert(field(s, "IMDB Votes") === IntegerType)
    assert(field(s, "Rotten Tomatoes Rating") === IntegerType)
  }
}
