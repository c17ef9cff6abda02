package graft

import graft.dialect.DialectFunctions
import graft.session.{Engine, EngineConfig}
import org.scalatest.funsuite.AnyFunSuite

/** DuckDB function-spelling parity (DialectFunctions) plus the dialect's
  * literal-escape translation, end-to-end through the engine Connection. */
class DialectFunctionsSpec extends AnyFunSuite {

  private lazy val engine =
    new Engine(EngineConfig(existingSession = Some(SparkTestSession.spark)))
  private lazy val conn = engine.connect()

  private def prepare(): Unit =
    Tables.registerAll(SparkTestSession.spark, SparkTestSession.sfDir)

  // ------------------------------------------------------- pure rewrites
  test("name map rewrites list functions and unnest") {
    val out = DialectFunctions.rewrite(
      "SELECT unnest(list_distinct(xs)), list_contains(xs, 'a'), LIST_EXTRACT(xs, 1)")
    // list_distinct drops NULL elements since round 13 (probe grid)
    assert(out ===
      "SELECT explode(filter(array_distinct(xs), __ld -> __ld IS NOT NULL)), " +
        "array_contains(xs, 'a'), graft_extract(xs, 1)")
  }

  test("function names inside string literals are untouched") {
    val out = DialectFunctions.rewrite("SELECT 'call unnest(x) and list_sort(y)' AS s")
    assert(out === "SELECT 'call unnest(x) and list_sort(y)' AS s")
  }

  test("string_split quotes a literal separator for Spark's regex split") {
    val out = DialectFunctions.rewrite("SELECT string_split(col, '.')")
    assert(out === """SELECT split(col, '\\Q.\\E')""")
    // non-literal separator: no safe quoting — call left unchanged
    val dynamic = DialectFunctions.rewrite("SELECT string_split(a, b)")
    assert(dynamic === "SELECT string_split(a, b)")
  }

  test("range maps to a guarded sequence (end-exclusive, empty-safe)") {
    prepare()
    val rows = conn.queryDF(
      "SELECT unnest(range(2, 5)) AS v").collect().map(_.getLong(0)).toSeq
    assert(rows === Seq(2L, 3L, 4L))
    val empty = conn.queryDF(
      "SELECT size(range(5, 2)) AS n").collect().head.getInt(0)
    assert(empty === 0)
  }

  // ----------------------------------------------- end-to-end via engine
  test("split on a backslash regex survives the literal-escape translation") {
    prepare()
    val df = conn.queryDF(
      """SELECT CAST(array_length(regexp_split_to_array(trim(n_name), '\s+')) AS BIGINT) AS n
        |FROM nation WHERE n_nationkey = 0""".stripMargin)
    assert(df.collect().head.getLong(0) >= 1L)
  }

  test("regexp_replace: DuckDB first-match default, 'g'/'i' flags, \\N backrefs") {
    prepare()
    def one(sql: String): String =
      conn.queryDF(s"SELECT $sql AS v").collect().head.getString(0)
    // first-only default (Spark's builtin would give 'X bbb X')
    assert(one("regexp_replace('aaa bbb aaa', 'a+', 'X')") === "X bbb aaa")
    assert(one("regexp_replace('aaa bbb aaa', 'a+', 'X', 'g')") === "X bbb X")
    assert(one("regexp_replace('Hello World', 'h', 'X', 'i')") === "Xello World")
    assert(one("regexp_replace('aAbA', 'a', 'X', 'gi')") === "XXbX")
    // RE2 rewrite syntax: \1 is a backref, $ is literal
    assert(one("""regexp_replace('john@x.com', '(\w+)@', '\1 AT ')""") === "john AT x.com")
    assert(one("""regexp_replace('a$b', '\$', 'USD')""") === "aUSDb")
    assert(one("regexp_replace('ab', 'b', '$0')") === "a$0")
  }

  test("quantified ALL/ANY/SOME comparisons reduce to scalar-subquery / IN forms") {
    val out = DialectFunctions.rewrite(
      "SELECT 1 FROM t WHERE a > ALL (SELECT b FROM u) AND c = ANY (SELECT d FROM v)")
    assert(out.contains("> (SELECT max(_qv) FROM (SELECT b FROM u) AS _qall_"))
    assert(out.matches("(?s).*c\\s+IN \\(SELECT d FROM v\\).*"))
    val anti = DialectFunctions.rewrite(
      "SELECT 1 FROM t WHERE a <> ALL (SELECT b FROM u) AND a < SOME (SELECT b FROM u)")
    assert(anti.matches("(?s).*a\\s+NOT IN \\(SELECT b FROM u\\).*"))
    assert(anti.contains("< (SELECT max(_qv)"))
    // non-subquery parens (IN-list) untouched; = ALL has no reduction
    val skip = DialectFunctions.rewrite(
      "SELECT 1 FROM t WHERE a = ALL (SELECT b FROM u) AND c > ALL (1, 2)")
    assert(skip.contains("= ALL (SELECT b FROM u)") && skip.contains("> ALL (1, 2)"))
    prepare()
    val n = conn.queryDF(
      """SELECT count(*) AS n FROM orders
        |WHERE o_totalprice >= ALL (SELECT o_totalprice FROM orders)""".stripMargin)
      .collect().head.getLong(0)
    assert(n >= 1L) // the maximum-priced order(s) survive
  }

  test("scalar generate_series folds to sequence; step and interval forms included") {
    prepare()
    val r = conn.queryDF(
      """SELECT generate_series(1, 5) AS a, generate_series(0, 10, 5) AS b,
        |       generate_series(5, 1, -2) AS c""".stripMargin).collect().head
    assert(r.getSeq[Any](0).map(_.toString) === Seq("1", "2", "3", "4", "5"))
    assert(r.getSeq[Any](1).map(_.toString) === Seq("0", "5", "10"))
    assert(r.getSeq[Any](2).map(_.toString) === Seq("5", "3", "1"))
    val ts = conn.queryDF(
      """SELECT size(generate_series(TIMESTAMP '2024-01-01',
        |     TIMESTAMP '2024-01-07', INTERVAL 3 DAY)) AS n""".stripMargin)
      .collect().head.getInt(0)
    assert(ts === 3) // 01, 04, 07
  }

  test("dayname/monthname render English names via date_format") {
    prepare()
    val r = conn.queryDF(
      "SELECT dayname(DATE '2024-01-01') AS d, monthname(DATE '2024-03-15') AS m")
      .collect().head
    assert(r.getString(0) === "Monday")
    assert(r.getString(1) === "March")
  }

  test("regexp_extract: 2-arg returns the full match (group 0), not group 1") {
    prepare()
    val r = conn.queryDF(
      """SELECT regexp_extract('abc123def', '[0-9]+') AS full,
        |       regexp_extract('abc123def', '([a-z]+)([0-9]+)', 2) AS grp,
        |       regexp_extract('abc', 'z+') AS miss""".stripMargin)
      .collect().head
    assert(r.getString(0) === "123")
    assert(r.getString(1) === "123")
    assert(r.getString(2) === "") // DuckDB 1.0.0: empty string, not NULL
  }

  test("string predicate spellings map to Spark names") {
    assert(DialectFunctions.rewrite(
      "SELECT regexp_matches(s, '^a'), starts_with(s, 'a'), ends_with(s, 'z')") ===
      "SELECT regexp_like(s, '^a'), startswith(s, 'a'), endswith(s, 'z')")
    prepare()
    val r = conn.queryDF(
      "SELECT regexp_matches('Widget', '^W') AS a, starts_with('abc', 'ab') AS b, ends_with('abc', 'bc') AS c")
      .collect().head
    assert(r.getBoolean(0) && r.getBoolean(1) && r.getBoolean(2))
  }

  test("array_to_string joins with the separator but is NULL for empty lists (DuckDB 1.x)") {
    prepare()
    val r = conn.queryDF(
      """SELECT array_to_string(array('a', 'b'), '|') AS joined,
        |       array_to_string(filter(array('x'), t -> false), '|') AS empty,
        |       array_to_string(array(''), '|') AS one_empty_elem""".stripMargin)
      .collect().head
    assert(r.getString(0) === "a|b")
    assert(r.isNullAt(1)) // DuckDB: array_to_string([], '|') IS NULL
    assert(r.getString(2) === "") // [''] joins to '' — NOT nulled
  }

  test("JSON ->> maps to get_json_object with path normalization") {
    assert(DialectFunctions.rewrite("SELECT j ->> '$.a.b' FROM t") ===
      "SELECT get_json_object(j, '$.a.b') FROM t")
    assert(DialectFunctions.rewrite("SELECT j ->> 'key' FROM t") ===
      "SELECT get_json_object(j, '$.key') FROM t")
    // inside a literal: untouched
    assert(DialectFunctions.rewrite("SELECT 'a ->> ''b''' AS s") ===
      "SELECT 'a ->> ''b''' AS s")
    prepare()
    val v = conn.queryDF(
      "SELECT CAST(props ->> 'k' AS BIGINT) AS k FROM events WHERE event_id = 0")
      .collect().head.getLong(0)
    assert(v >= 0L)
  }

  test("strftime maps C patterns to date_format incl. quoted literal letters") {
    val out = DialectFunctions.rewrite("SELECT strftime(ts, '%Y-%m-%dT%H:%M')")
    assert(out === "SELECT date_format(ts, 'yyyy-MM-dd''T''HH:mm')")
    prepare()
    val v = conn.queryDF(
      "SELECT strftime(o_orderdate, '%Y-%m') AS m FROM orders WHERE o_orderkey = 1")
      .collect().head.getString(0)
    assert(v.matches("\\d{4}-\\d{2}"))
  }

  test("strptime maps to to_timestamp and epoch_ms to unix_millis") {
    assert(DialectFunctions.rewrite("SELECT strptime(s, '%m/%d/%Y')") ===
      "SELECT to_timestamp(s, 'MM/dd/yyyy')")
    prepare()
    val ms = conn.queryDF(
      "SELECT epoch_ms(strptime('01/02/1970', '%m/%d/%Y')) AS ms")
      .collect().head.getLong(0)
    assert(ms === 86400000L)
  }

  test("epoch_ms integer overload converts ms to TIMESTAMP (DuckDB parity)") {
    // integer-shaped argument → epoch_ms(BIGINT) overload
    assert(DialectFunctions.rewrite("SELECT epoch_ms(86400000)") ===
      "SELECT timestamp_millis(CAST(86400000 AS BIGINT))")
    // the :: cast arrives as graft_icast text (IntCastSyntax runs first)
    // and must still pick the BIGINT overload
    assert(DialectFunctions.rewrite("SELECT epoch_ms(x::BIGINT)") ===
      "SELECT timestamp_millis(CAST(graft_icast(x, 'bigint') AS BIGINT))")
    // everything else stays on the timestamp → ms overload
    assert(DialectFunctions.rewrite("SELECT epoch_ms(ts)") ===
      "SELECT unix_millis(CAST(ts AS TIMESTAMP))")
    prepare()
    val d = conn.queryDF("SELECT CAST(epoch_ms(86400000) AS DATE) AS d")
      .collect().head.getDate(0).toString
    assert(d === "1970-01-02")
  }

  test("array_length(NULL) is NULL, not -1 (sizeOfNull pinned)") {
    prepare()
    val r = conn.queryDF(
      "SELECT array_length(CAST(NULL AS ARRAY<INT>)) AS n, array_length(array(1,2)) AS m")
      .collect().head
    assert(r.isNullAt(0) && r.getInt(1) === 2)
  }

  test("range in FROM position is a TVF even after a comma cross-join") {
    // comma cross-join: the token before the call is ',', not FROM — the
    // clause tracker must still classify it as FROM position
    val crossJoin = "SELECT n_name, r.id FROM nation, range(3) r"
    assert(DialectFunctions.rewrite(crossJoin) === crossJoin)
    // select-list position after a comma IS the list form → rewritten
    assert(DialectFunctions.rewrite("SELECT a, range(3) FROM t").contains("sequence("))
    prepare()
    val n = conn.queryDF("SELECT count(*) AS c FROM nation, range(3) r")
      .collect().head.getLong(0)
    assert(n === 75L) // 25 nations × 3
  }

  test("JSON -> chains fold into nested get_json_object") {
    assert(DialectFunctions.rewrite("SELECT j -> 'a' ->> 'b' FROM t") ===
      "SELECT get_json_object(get_json_object(j, '$.a'), '$.b') FROM t")
    assert(DialectFunctions.rewrite("SELECT j -> 'a' -> 0 ->> 'b' FROM t") ===
      "SELECT get_json_object(get_json_object(get_json_object(j, '$.a'), '$[0]'), '$.b') FROM t")
    // lambda bodies inside higher-order functions are NOT json arrows
    val lambda = "SELECT transform(xs, x -> 'a') FROM t"
    assert(DialectFunctions.rewrite(lambda) === lambda)
    val lambdaInt = "SELECT filter(xs, x -> 1) FROM t"
    assert(DialectFunctions.rewrite(lambdaInt) === lambdaInt)
    prepare()
    val v = conn.queryDF(
      """SELECT '{"a": {"b": 7}}' -> 'a' ->> 'b' AS v""").collect().head.getString(0)
    assert(v === "7")
  }

  test("aggregate and constructor spellings map to Spark names") {
    // quantile_cont stays verbatim since round 13: it resolves to the
    // engine's native DuckDB-parity marker (functions/QuantileAggs.scala)
    assert(DialectFunctions.rewrite("SELECT arg_max(a, b), arg_min(a, b), quantile_cont(x, 0.5), strpos(s, '-')") ===
      "SELECT max_by(a, b), min_by(a, b), quantile_cont(x, 0.5), instr(s, '-')")
    assert(DialectFunctions.rewrite("SELECT struct_pack(k := a, p := b * 2)") ===
      "SELECT named_struct('k', a, 'p', b * 2)")
    assert(DialectFunctions.rewrite("SELECT struct_extract(s, 'k')") ===
      "SELECT (s)['k']")
    assert(DialectFunctions.rewrite("SELECT list_extract(list_value(1, 2, 3), 2)") ===
      "SELECT graft_extract(array(1, 2, 3), 2)")
    prepare()
    val r = conn.queryDF(
      "SELECT struct_extract(struct_pack(a := 7, b := 'x'), 'a') AS v").collect().head
    assert(r.getInt(0) === 7)
  }

  test("SIMILAR TO is a raw anchored regex (DuckDB semantics); GLOB translates") {
    // DuckDB's SIMILAR TO: full regex match, % and _ LITERAL
    assert(DialectFunctions.rewrite("SELECT * FROM t WHERE s SIMILAR TO '(a|b)c*'") ===
      "SELECT * FROM t WHERE regexp_like(s, '^(?:(a|b)c*)$')")
    assert(DialectFunctions.rewrite("SELECT * FROM t WHERE s NOT SIMILAR TO 'x'") ===
      "SELECT * FROM t WHERE NOT regexp_like(s, '^(?:x)$')")
    // GLOB: * → .*, ? → ., regex specials escaped (pre-doubled for the
    // C-style literal), brackets preserved
    assert(DialectFunctions.rewrite("SELECT * FROM t WHERE s GLOB 'a*.c?[0-9]'") ===
      """SELECT * FROM t WHERE regexp_like(s, '^(?:a.*\\.c.[0-9])$')""")
    // glob bracket negation [!...] → regex [^...]
    assert(DialectFunctions.rewrite("SELECT * FROM t WHERE s GLOB 'a[!xy]b'") ===
      "SELECT * FROM t WHERE regexp_like(s, '^(?:a[^xy]b)$')")
    // inside a string literal: untouched
    val lit = "SELECT 'x SIMILAR TO y' AS s"
    assert(DialectFunctions.rewrite(lit) === lit)
    prepare()
    val n = conn.queryDF(
      "SELECT count(*) AS n FROM documents WHERE source GLOB 'src?' AND lang SIMILAR TO '(en|de)'")
      .collect().head.getLong(0)
    assert(n > 0)
  }

  test("SIMILAR TO / GLOB after a binary operator passes through loudly " +
      "(DuckDB binds the match below ||; rewriting only the rightmost " +
      "token would silently drop the left side — round-14 ADVICE)") {
    val sql = "SELECT 'x' || 'abc' SIMILAR TO 'xa.*' AS v"
    assert(DialectFunctions.rewrite(sql) === sql)
    val ident = "SELECT a || b SIMILAR TO 'p' AS v"
    assert(DialectFunctions.rewrite(ident) === ident)
    val arith = "SELECT a - b GLOB 'p*' AS v"
    assert(DialectFunctions.rewrite(arith) === arith)
    // unpreceded literal operand still rewrites
    assert(DialectFunctions.rewrite("SELECT 'abc' SIMILAR TO 'a.c' AS v") ===
      "SELECT regexp_like('abc', '^(?:a.c)$') AS v")
    prepare()
    // the pass-through surfaces Spark's own loud parse error
    intercept[Exception] {
      conn.queryDF("SELECT 'x' || 'abc' SIMILAR TO 'xa.*' AS v").collect()
    }
  }

  test("json_valid: JSON null document is valid, NULL input is NULL " +
      "(round-14 ADVICE; probed)") {
    prepare()
    val r = conn.queryDF(
      "SELECT json_valid('null') AS a, json_valid(NULL) AS b, " +
        "json_valid(' null ') AS c, json_valid('nul') AS d, " +
        "json_valid('{\"a\": 1}') AS e, json_valid('nope{') AS f").collect().head
    assert(r.getBoolean(0) === true)
    assert(r.isNullAt(1))
    assert(r.getBoolean(2) === true)
    assert(r.getBoolean(3) === false)
    assert(r.getBoolean(4) === true)
    assert(r.getBoolean(5) === false)
  }

  test("date_trunc: coarse fields, alias spellings, loud unknown field " +
      "(round-14 ADVICE; probed against duckdb)") {
    prepare()
    val r = conn.queryDF(
      "SELECT date_trunc('decade', DATE '1987-06-05') AS a, " +
        "date_trunc('century', DATE '2001-06-05') AS b, " +
        "date_trunc('millennium', DATE '1987-06-05') AS c, " +
        "date_trunc('isoyear', DATE '2021-01-01') AS d, " +
        "CAST(date_trunc('milliseconds', TIMESTAMP '1987-06-05 04:03:02.123456') AS STRING) AS e, " +
        "CAST(date_trunc('epoch', TIMESTAMP '1987-06-05 04:03:02.123456') AS STRING) AS f")
      .collect().head
    assert(r.get(0).toString === "1980-01-01")
    assert(r.get(1).toString === "2000-01-01")
    assert(r.get(2).toString === "1000-01-01")
    assert(r.get(3).toString === "2019-12-30")
    assert(r.getString(4) === "1987-06-05 04:03:02.123")
    assert(r.getString(5) === "1987-06-05 04:03:02")
    val e = intercept[Exception] {
      conn.queryDF("SELECT date_trunc('era', DATE '1987-06-05') AS v").collect()
    }
    assert(e.getMessage.contains("unrecognized field"))
  }

  test("gcd/lcm error loudly on Long overflow instead of wrapping " +
      "(round-14 ADVICE; DuckDB 'Out of Range')") {
    prepare()
    assert(conn.queryDF("SELECT lcm(4, 6) AS v").collect().head.getLong(0) === 12L)
    val e1 = intercept[Exception] {
      conn.queryDF("SELECT lcm(4611686018427387904, 3) AS v").collect()
    }
    assert(e1.getMessage.contains("Out of Range"))
    val e2 = intercept[Exception] {
      conn.queryDF("SELECT gcd(-9223372036854775808, 0) AS v").collect()
    }
    assert(e2.getMessage.contains("Out of Range"))
  }

  test("infix minus type-dispatches like DuckDB (graft_sub): DATE-DATE " +
      "is BIGINT days, DATE-INTERVAL a timestamp, numerics widen") {
    prepare()
    val r = conn.queryDF(
      "SELECT DATE '2024-03-01' - DATE '2024-02-01' AS a, " +
        "DATE '2024-03-01' - 1 AS b, " +
        "CAST(DATE '2024-03-01' - INTERVAL 1 DAY AS STRING) AS c, " +
        "CAST(TIMESTAMP '2024-03-01 10:00:00' - INTERVAL 90 MINUTE AS STRING) AS d, " +
        "25.5 - CAST(3 AS DOUBLE) AS e, " +
        "CAST(10.50 AS DECIMAL(12,2)) - 3 AS f").collect().head
    assert(r.getLong(0) === 29L)
    assert(r.get(1).toString === "2024-02-29")
    assert(r.getString(2) === "2024-02-29 00:00:00")
    assert(r.getString(3) === "2024-03-01 08:30:00")
    assert(r.getDouble(4) === 22.5)
    assert(r.getDecimal(5).toPlainString === "7.50")
    // plain spark.sql keeps Spark's interval semantics (hook is engine-scoped)
    val sparkSide = SparkTestSession.spark
      .sql("SELECT DATE '2024-03-01' - DATE '2024-02-01' AS v")
      .schema.head.dataType.typeName
    assert(sparkSide.startsWith("interval"))
  }

  test("upper/lower use utf8proc's simple mapping (ß→ẞ, never " +
      "length-changing; round 14)") {
    prepare()
    val r = conn.queryDF(
      "SELECT upper('straße') AS a, lower('ẞ') AS b, upper('ﬁt') AS c, " +
        "lower('ΑΣ') AS d, ucase('abc') AS e, lcase('ABC') AS f").collect().head
    assert(r.getString(0) === "STRAẞE")
    assert(r.getString(1) === "ß")
    assert(r.getString(2) === "ﬁT")
    assert(r.getString(3) === "ασ")   // plain sigma, no final-form rule
    assert(r.getString(4) === "ABC")
    assert(r.getString(5) === "abc")
    // plain spark.sql keeps the JVM full mapping (engine-scoped)
    assert(SparkTestSession.spark.sql("SELECT upper('straße') AS v")
      .collect().head.getString(0) === "STRASSE")
  }

  test("list_slice / list_position / list_unique / pops / date_diff rewrites") {
    assert(DialectFunctions.rewrite("SELECT list_slice(l, 2, 4)") ===
      "SELECT graft_slice(l, 2, 4)")
    // DuckDB 1.0.0 contract: 0 when absent (same as Spark array_position)
    assert(DialectFunctions.rewrite("SELECT list_position(l, 'x')") ===
      "SELECT array_position(l, 'x')")
    // round 13: NULL elements excluded from the count, like duckdb
    assert(DialectFunctions.rewrite("SELECT list_unique(l)") ===
      "SELECT size(filter(array_distinct(l), __lu -> __lu IS NOT NULL))")
    assert(DialectFunctions.rewrite("SELECT array_pop_back(l), array_pop_front(l)") ===
      "SELECT slice(l, 1, size(l) - 1), slice(l, 2, size(l) - 1)")
    // boundary-exact date_diff: truncate both ends to the part first
    assert(DialectFunctions.rewrite("SELECT date_diff('day', a, b)") ===
      "SELECT timestampdiff(DAY, date_trunc('DAY', a), date_trunc('DAY', b))")
    prepare()
    // boundary semantics: 23:00 Dec31 → 01:00 Jan1 crosses ONE day boundary
    val d = conn.queryDF(
      "SELECT date_diff('day', TIMESTAMP '1994-12-31 23:00:00', TIMESTAMP '1995-01-01 01:00:00') AS d")
      .collect().head.getLong(0)
    assert(d === 1L)
  }

  test("arg_max/arg_min: 2-arg maps to max_by/min_by, 3-arg builds top-n lists") {
    assert(DialectFunctions.rewrite("SELECT arg_max(a, b), arg_min(a, b)") ===
      "SELECT max_by(a, b), min_by(a, b)")
    // 3-arg top-n (newer-DuckDB surface; the reference 1.0.0 binder lacks
    // it, so this is spec-pinned rather than oracle-pinned)
    prepare()
    val r = conn.queryDF(
      """SELECT array_to_string(arg_max(o_orderkey, o_orderkey, 3), ',') AS top3,
        |       array_to_string(arg_min(o_orderkey, o_orderkey, 2), ',') AS bot2
        |FROM orders""".stripMargin).collect().head
    val expected = SparkTestSession.spark.table("orders")
      .select(org.apache.spark.sql.functions.col("o_orderkey"))
      .collect().map(_.getLong(0)).sorted
    assert(r.getString(0) === expected.takeRight(3).reverse.mkString(","))
    assert(r.getString(1) === expected.take(2).mkString(","))
  }

  test("list pipeline end-to-end: sort, distinct, extract on a real column") {
    prepare()
    val df = conn.queryDF(
      """SELECT list_extract(list_sort(list_distinct(regexp_split_to_array(trim(text), '\s+'))), 1) AS tok
        |FROM documents WHERE doc_id = 0""".stripMargin)
    val tok = df.collect().head.getString(0)
    assert(tok != null && tok.nonEmpty && !tok.contains(" "))
  }

  test("ordered aggregates: list / string_agg with ORDER BY keep the order") {
    prepare()
    val spark = SparkTestSession.spark
    val rows = spark.sql(DialectFunctions.rewrite(
      """SELECT array_to_string(list(o_orderkey ORDER BY o_orderkey DESC), ',') AS ks,
        |       string_agg(o_orderstatus, '|' ORDER BY o_orderkey) AS st
        |FROM orders WHERE o_orderkey <= 7""".stripMargin)).collect()
    val ks = rows.head.getString(0).split(',').map(_.toLong)
    assert(ks.sameElements(ks.sorted.reverse), s"not DESC: ${ks.mkString(",")}")
    assert(rows.head.getString(1).count(_ == '|') == ks.length - 1)
    // plain (unordered) list still collects
    val n = spark.sql(DialectFunctions.rewrite(
      "SELECT size(list(o_orderkey)) AS n FROM orders WHERE o_orderkey <= 7"))
      .collect().head.getInt(0)
    assert(n == ks.length)
  }

  test("list_aggregate applies the named aggregate, NULLs skipped") {
    val spark = SparkTestSession.spark
    val r = spark.sql(DialectFunctions.rewrite(
      """SELECT list_aggregate(array(1, 2, NULL, 4), 'sum') AS s,
        |       list_aggregate(array(1, 2, NULL, 4), 'count') AS c,
        |       list_aggregate(array(1, 2, NULL, 4), 'max') AS m,
        |       list_aggregate(array(1, 2, NULL, 4), 'avg') AS a,
        |       list_aggregate(array(CAST(NULL AS INT)), 'sum') AS empty_s""".stripMargin))
      .collect().head
    assert(r.getDouble(0) == 7.0 && r.getLong(1) == 3L && r.getInt(2) == 4 &&
      math.abs(r.getDouble(3) - 7.0 / 3) < 1e-12 && r.isNullAt(4))
  }

  test("time_bucket: day-dividing intervals floor-align; others pass through") {
    val out = DialectFunctions.rewrite(
      "SELECT time_bucket(INTERVAL '15 minutes', ts) FROM events")
    assert(out.contains("pmod") && out.contains("900L") &&
      !out.toLowerCase.contains("time_bucket"))
    // pre-epoch floor (not truncate-toward-zero): -1s falls in the bucket
    // STARTING before it
    val spark = SparkTestSession.spark
    val r = spark.sql(DialectFunctions.rewrite(
      "SELECT CAST(time_bucket(INTERVAL '1 hour', TIMESTAMP '1969-12-31 23:59:59') AS STRING) AS b"))
      .head.getString(0)
    assert(r == "1969-12-31 23:00:00", r)
    // a week does not divide a day-origin: untouched
    val wk = "SELECT time_bucket(INTERVAL '7 days', ts) FROM events"
    assert(DialectFunctions.rewrite(wk) == wk)
  }

  test("unsupported ordered-aggregate shapes pass through untouched") {
    val nullsFirst =
      "SELECT list(x ORDER BY y NULLS FIRST) FROM t"
    assert(DialectFunctions.rewrite(nullsFirst) == nullsFirst)
    val mixed = "SELECT list(x ORDER BY a ASC, b DESC) FROM t"
    assert(DialectFunctions.rewrite(mixed) == mixed)
  }
}
