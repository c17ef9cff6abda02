#!/usr/bin/env python3
"""Differential-probing wave 3 (round 13): a SYSTEMATIC grid of scalar
expressions over edge inputs, evaluated in python-duckdb (the driver's
oracle engine) and pinned into a TSV fixture that ProbeGridSpec replays
through the engine's SQL path. The technique found 6 silent divergences in
round 12 (concat NULLs, negative-n left/right, dow numbering, cast
rounding, split_part negatives, epoch field) and 2 more while building
round 13 (1-arg log base, single-pair MAP literal miscompile) — this file
makes it a repeatable grid instead of ad-hoc waves.

Usage: python3 scripts/probe_grid.py  →  src/test/resources/probe_grid.tsv
Lines: <category>\t<sql>\t<normalized expected>
Values are normalized identically on both sides (see norm() here and
ProbeGridSpec.norm): NULL literal, floats to 6dp with trailing zeros
stripped, lists bracketed, timestamps without fractional seconds.
"""
import duckdb, math, datetime, decimal, os

con = duckdb.connect()

def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        if math.isinf(v): return "Infinity" if v > 0 else "-Infinity"
        s = f"{round(v, 6):.6f}".rstrip("0").rstrip(".")
        return s if s not in ("-0", "") else "0"
    if isinstance(v, decimal.Decimal):
        return norm(float(v))
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(v, datetime.date):
        return v.strftime("%Y-%m-%d")
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(norm(x) for x in v) + "]"
    return str(v)

PROBES = []
def p(cat, *sqls):
    for s in sqls:
        PROBES.append((cat, s))

# ---------------------------------------------------------------- strings
p("string",
  "upper('straße')", "lower('ÅBC')", "length('')", "length('héllo')",
  "reverse('abc')", "reverse('')",
  "trim('  x  ')", "ltrim('xxay', 'x')", "rtrim('yaxx', 'x')",
  "trim('xyxAx', 'xy')",
  "lpad('ab', 5, '-')", "lpad('abcdef', 3, '-')", "lpad('ab', 0, '-')",
  "rpad('ab', 5, '*')", "rpad('abcdef', 2, '*')",
  "repeat('ab', 3)", "repeat('ab', 0)", "repeat('ab', -2)",
  "substr('hello', 2)", "substr('hello', 2, 2)", "substr('hello', 0, 3)",
  "substr('hello', -3)", "substr('hello', -3, 2)", "substr('hello', 99)",
  "replace('aaa', 'a', 'bb')", "replace('abc', '', 'x')",
  "instr('hello', 'l')", "instr('hello', 'z')", "instr('', 'a')",
  "strpos('hello', 'll')",
  "contains('hello', 'ell')", "contains('hello', '')",
  "starts_with('hello', 'he')", "ends_with('hello', 'lo')",
  "ascii('A')", "ascii('')", "chr(97)",
  "concat_ws('-', 'a', NULL, 'b')", "concat_ws('-', NULL, NULL)",
  "split_part('a,b,c', ',', 2)", "split_part('a,b,c', ',', 9)",
  "translate('abcb', 'bc', 'xy')",
  "position('ll' IN 'hello')",
  "left('hello', 2)", "right('hello', 2)",
  "md5('abc')",
  "format('{} + {}', 1, 2)",
  "string_split('a,,b', ',')",
  "regexp_extract('ab12cd', '[0-9]+')",
  "regexp_extract('ab12cd', '([a-z]+)([0-9]+)', 2)",
  "regexp_matches('abc', '^a')",
  "levenshtein('kitten', 'sitting')",
  "hamming('abc', 'abd')",
  "jaccard('abc', 'bcd')",
  # round-13 follow-ups: the substr clamp window and the trim-chars swap
  "substr('hello', -2, 5)", "substr('hello', -5, 3)",
  "substr('hello', 0, 1)", "substr('hello', -1, 1)",
  "substr('hello', -7, 3)", "substr('hello', 0, 99)",
  "btrim('xyAyx', 'xy')")

# --------------------------------------------------------------- numerics
p("numeric",
  "round(2.5)", "round(-2.5)", "round(3.5)", "round(2.5::DOUBLE)",
  "round(-2.5::DOUBLE)", "round(1.25, 1)", "round(1.35, 1)",
  "round(1234.5678, -2)", "round(1234.5678::DOUBLE, -2)",
  "ceil(-1.5)", "floor(-1.5)", "ceiling(2.1)",
  "trunc(1.9)", "trunc(-1.9)",
  "abs(-5)", "abs(-5.5)", "sign(-3)", "sign(0)", "sign(2.5)",
  "7 % 3", "-7 % 3", "7 % -3", "-7.5 % 2",
  "mod(7, 3)", "mod(-7, 3)",
  "greatest(1, NULL, 3)", "least(1, NULL, 3)",
  "greatest('a', 'b')", "least(1.5, 2)",
  "power(2, 10)", "power(2, -1)", "power(-2, 3)",
  "exp(0)", "exp(1)",
  "log10(1000)", "log2(8)", "ln(exp(2))", "log(100)", "log(2, 8)",
  "sqrt(16)", "cbrt(27)",
  "pi()",
  "degrees(pi())", "radians(180)",
  "atan2(1, 1)", "atan(1)", "sin(0)", "cos(0)", "tan(0)",
  "gamma(5)", "lgamma(5)", "factorial(5)",
  "bit_count(7)", "bit_count(-1::TINYINT)",
  "xor(5, 3)", "5 & 3", "5 | 3", "~5", "1 << 4", "256 >> 2",
  "isnan('nan'::DOUBLE)", "isinf(1.0/0.0)", "isfinite(1.0)",
  "1.0/0.0", "-1.0/0.0", "0.0/0.0", "1/0", "1 % 0",
  "even(2.5)", "even(-2.5)", "even(3)", "even(2)", "even(-2)", "even(0.1)",
  "fdiv(7.5, 2)", "fmod(7.5, 2)", "fdiv(-7.5, 2)", "fmod(-7.5, 2)",
  "fmod(7.5, -2)", "fdiv(7, 2)", "fmod(7, 3)",
  "gamma(0.5)", "lgamma(0.5)", "gamma(10)",
  "bit_count(-1::SMALLINT)", "bit_count(-1)", "bit_count(-1::BIGINT)",
  "trunc(-1.9::DOUBLE)", "trunc(2.7::DOUBLE)")

# -------------------------------------------------------------- date/time
p("datetime",
  "date_trunc('week', DATE '2024-03-14')",
  "date_trunc('quarter', DATE '2024-05-14')",
  "date_trunc('month', TIMESTAMP '2024-03-14 10:11:12')",
  "date_trunc('hour', TIMESTAMP '2024-03-14 10:11:12')",
  "date_trunc('year', DATE '2024-03-14')",
  "last_day(DATE '2024-02-05')", "last_day(DATE '2023-02-05')",
  "date_part('week', DATE '2024-01-01')",
  "date_part('week', DATE '2021-01-01')",
  "date_part('quarter', DATE '2024-05-14')",
  "date_part('day', DATE '2024-03-14')",
  "date_part('year', DATE '2024-03-14')",
  "date_part('hour', TIMESTAMP '2024-03-14 10:11:12')",
  "date_part('minute', TIMESTAMP '2024-03-14 10:11:12')",
  "date_part('second', TIMESTAMP '2024-03-14 10:11:12')",
  "datediff('day', DATE '2024-01-01', DATE '2024-03-01')",
  "datediff('month', DATE '2024-01-15', DATE '2024-03-14')",
  "datediff('year', DATE '2020-06-01', DATE '2024-01-01')",
  "date_diff('day', DATE '2024-01-01', DATE '2024-03-01')",
  "make_date(2024, 2, 29)",
  "DATE '2024-01-31' + 1", "DATE '2024-03-01' - 1",
  "DATE '2024-03-01' - DATE '2024-02-01'",
  "CAST(DATE '2024-01-31' + INTERVAL 1 MONTH AS DATE)",
  "TIMESTAMP '2024-03-14 10:11:12' + INTERVAL 90 MINUTE",
  "strftime(DATE '2024-03-14', '%Y/%m/%d')",
  "strftime(TIMESTAMP '2024-03-14 09:05:00', '%H:%M')",
  "dayname(DATE '2024-03-14')", "monthname(DATE '2024-03-14')",
  "week(DATE '2024-01-01')",
  "yearweek(DATE '2024-01-01')",
  "dayofmonth(DATE '2024-03-14')",
  "weekofyear(DATE '2024-01-01')",
  "epoch(TIMESTAMP '2024-03-14 10:11:12')",
  "epoch_ms(TIMESTAMP '1970-01-01 00:00:01.5')",
  "greatest(DATE '2024-01-01', DATE '2023-01-01')",
  "yearweek(DATE '2021-01-01')", "week(DATE '2021-01-01')",
  "date_trunc('hour', DATE '2024-03-14')")

# ------------------------------------------------------------------ lists
p("list",
  "list_contains([1,2,3], 2)", "list_contains([1,2,3], 9)",
  "list_contains([1,NULL], NULL::INTEGER)",
  "list_position([4,5,6], 5)", "list_position([4,5,6], 9)",
  "len([1,2,3])", "len([])",
  "array_length([1,2,3])",
  "list_sort([3,1,2])", "list_sort([3,NULL,1])",
  "list_reverse_sort([1,3,2])",
  # list_distinct's ORDER is unspecified in duckdb — compare sorted; the
  # pinned semantic is that NULL elements are DROPPED
  "list_sort(list_distinct([1,2,2,3]))", "list_sort(list_distinct([NULL,1,NULL]))",
  "list_unique([1,2,2,3])", "list_unique([NULL,1,NULL,2])",
  "flatten([[1,2],[3]])", "flatten([[],[1]])",
  "list_concat([1,2],[3])",
  "list_append([1,2], 3)", "list_prepend(0, [1,2])",
  "list_max([1,9,3])", "list_min([1,9,3])", "list_sum([1,2,3])",
  "list_sum([])",
  "array_to_string([1,2,3], '-')",
  "list_slice([1,2,3,4], 2, 3)", "[1,2,3,4][2:3]",
  "[1,2,3][-1]", "['a','b'][1]",
  "range(1, 5)", "range(5, 1, -1)", "range(3)", "range(1, 1)",
  "range(1, 10, 3)", "range(5, 1, 2)", "range(0)",
  "generate_series(1, 5)", "generate_series(1, 9, 3)",
  "list_transform([1,2,3], x -> x * 2)",
  "list_filter([1,2,3,4], x -> x % 2 = 0)",
  "list_aggregate([1,2,3], 'sum')",
  "list_reverse([1,2,3])",
  "array_to_string(list_value(1,2), ',')")

# ------------------------------------------------------------ conversions
p("cast",
  "CAST('42' AS INTEGER)", "TRY_CAST('x' AS INTEGER)",
  "CAST(' 42 ' AS INTEGER)",
  "CAST('3.9' AS INTEGER)", "CAST(3.9 AS INTEGER)",
  "CAST(-3.5 AS INTEGER)", "CAST(2.5::DOUBLE AS INTEGER)",
  "CAST(TRUE AS INTEGER)", "CAST(1 AS BOOLEAN)",
  "CAST('true' AS BOOLEAN)", "TRY_CAST('yes' AS BOOLEAN)",
  "TRY_CAST('T' AS BOOLEAN)", "TRY_CAST('f' AS BOOLEAN)",
  "TRY_CAST('1' AS BOOLEAN)", "TRY_CAST('0' AS BOOLEAN)",
  "TRY_CAST(' true ' AS BOOLEAN)", "TRY_CAST('on' AS BOOLEAN)",
  "CAST(DATE '2024-03-14' AS VARCHAR)",
  "CAST('2024-03-14' AS DATE)",
  "CAST(1.5 AS VARCHAR)", "CAST(CAST(1.5 AS DOUBLE) AS VARCHAR)",
  "nullif(3, 3)", "nullif(3, 4)",
  "coalesce(NULL, NULL, 7)",
  "ifnull(NULL, 5)",
  "if(2 > 1, 'y', 'n')")

# ----------------------------------------------------------- wave 3c
p("list",
  "list_has_any([1,2],[2,3])", "list_has_any([1,2],[3,4])",
  "list_has_all([1,2,3],[2,3])", "list_has_all([1,2],[2,9])",
  "list_has_all([1,2],[])",
  "list_has_all([1,2],[NULL::INT])", "list_has_all([1,NULL],[1])",
  "list_has_all([],[])",
  "list_sort(list_intersect([1,2,3],[2,3,4]))",
  "list_resize([1,2],4)", "list_resize([1,2,3],2)", "list_resize([1,2],0)",
  "list_resize([1,2],4,9)")
p("string",
  "regexp_extract_all('a1b22c', '[0-9]+')",
  "regexp_extract_all('a1b22c', '([a-z])([0-9]+)', 2)",
  "regexp_split_to_array('a1b22c', '[0-9]+')",
  "strlen('héllo')", "strlen('')",
  "unicode('héllo')", "ord('h')", "unicode('')",
  "nfc_normalize('e\\u0301') = 'é'",
  "length(nfc_normalize('e\\u0301'))",
  "to_base(255, 16)", "to_base(5, 2)", "bin(5)", "hex(255)",
  "substr('héllo', 2, 2)", "upper('héllo')", "left('héllo', 2)")
p("numeric",
  "gcd(12, 18)", "gcd(-12, 18)", "gcd(0, 5)",
  "lcm(4, 6)", "lcm(0, 5)",
  "greatest_common_divisor(21, 14)", "least_common_multiple(3, 5)")
p("map",
  "map_keys(MAP {'b': 1, 'a': 2})",
  "map_values(MAP {'b': 1, 'a': 2})",
  "cardinality(MAP {'a': 1, 'b': 2})",
  "element_at(MAP {'a': 1}, 'a')[1] + 1",
  "(map_entries(MAP {'a': 7})[1]).value",
  "(map_entries(MAP {'a': 7})[1]).key")
p("datetime",
  "try_strptime('14.03.2024', '%d.%m.%Y')",
  "try_strptime('garbage', '%d.%m.%Y')",
  "strptime('2024-03-14 09:30', '%Y-%m-%d %H:%M')",
  "TRY_CAST('03/14/2024' AS DATE)",
  "TRY_CAST('2024-03-14' AS DATE)")

p("json",
  """json_extract('{"a": {"b": 7}}', '$.a.b')""",
  """json_extract('{"a": 1}', 'a')""",
  """json_extract('{"a": {"b": 7}}', '/a/b')""",
  """json_extract('{"a": [1,2,3]}', '$.a[1]')""",
  """json_extract('{"a": {"b": 7}}', '$.a')""",
  """json_extract_string('{"a": "x"}', '$.a')""",
  """json_extract_string('{"a": 5}', 'a')""",
  """json_extract_path_text('{"a": {"b": "y"}}', '/a/b')""",
  """json_array_length('[1,2,3]')""",
  """json_array_length('[]')""",
  """json_valid('{"a": 1}')""",
  """json_valid('nope{')""",
  """json_valid('1')""",
  """json_keys('{"a": 1, "b": 2}')""",
  """'{"a": {"b": 7}}' -> 'a' ->> 'b'""")

p("predicate",
  "'abc' LIKE 'a%'", "'ABC' ILIKE 'a%'", "'abc' NOT LIKE 'x%'",
  "'a_c' LIKE 'a\\_c' ESCAPE '\\'",
  "like_escape('a_c', 'a\\_c', '\\')",
  "'abc' SIMILAR TO 'a.c'", "'abc' GLOB 'a*'",
  "prefix('abcd', 'ab')", "suffix('abcd', 'cd')",
  "'b' IN ('a', 'b')", "'z' NOT IN ('a', 'b')",
  "NULL IS DISTINCT FROM 1", "1 IS NOT DISTINCT FROM 1",
  "'a' BETWEEN 'a' AND 'b'")
p("datetime",
  "isodow(DATE '2024-03-14')", "isodow(DATE '2024-03-17')",
  "dayofyear(DATE '2024-03-14')", "quarter(DATE '2024-05-01')",
  "century(DATE '2024-01-01')", "century(DATE '2000-06-01')",
  "decade(DATE '2024-01-01')", "millennium(DATE '2024-01-01')",
  "julian(DATE '2024-01-01')", "julian(DATE '1970-01-01')",
  "make_timestamp(2024, 3, 14, 10, 30, 0.5)",
  "date_part('minute', INTERVAL 90 MINUTE)",
  "EXTRACT(HOUR FROM INTERVAL 90 MINUTE)")
p("numeric",
  "cot(1.0)", "cot(0.5)",
  "string_to_array('a,b', ',')[1]")
p("list", "array_reverse([1,2,3])")

# ----------------------------------------------------------- aggregates
# scalar-subquery form runs identically in both engines; list-returning
# aggregates go through list_sort so unspecified orders can't flake
def agg(expr_, vals, t="t(x)"):
    return f"(SELECT {expr_} FROM (VALUES {vals}) {t})"

p("agg",
  agg("bool_and(x)", "(true),(true)"), agg("bool_and(x)", "(true),(false)"),
  agg("bool_and(x)", "(true),(NULL)"), agg("bool_or(x)", "(false),(NULL)"),
  agg("bool_or(x)", "(false),(false)"),
  agg("bit_and(x)", "(7),(5)"), agg("bit_or(x)", "(1),(4)"),
  agg("bit_xor(x)", "(5),(3)"),
  agg("product(x)", "(2.0),(3.0),(NULL)"),
  agg("product(x)", "(2),(4)"),
  agg("count(*)", "(1),(NULL)"), agg("count(x)", "(1),(NULL)"),
  agg("count(DISTINCT x)", "(1),(1),(2),(NULL)"),
  agg("sum(x)", "(NULL::INTEGER)"),
  agg("CAST(sum(x) AS BIGINT)", "(1),(2),(NULL)"),
  agg("sum(DISTINCT x)", "(1.5),(1.5),(2.5)"),
  agg("avg(x)", "(1),(2)"),
  agg("min(x)", "('b'),('a'),(NULL)"), agg("max(x)", "('b'),('a')"),
  agg("arg_max(x, y)", "(  'a', 1),('b', 3),('c', 2)", "t(x, y)"),
  agg("arg_min(x, y)", "('a', 1),('b', 3),('c', NULL)", "t(x, y)"),
  agg("arg_max(x, y)", "('a', NULL),('b', 2)", "t(x, y)"),
  agg("mode(x)", "(1),(2),(2),(3)"),
  agg("CAST(stddev(x) AS DOUBLE)", "(1.0),(2.0),(3.0),(4.0)"),
  agg("CAST(stddev_pop(x) AS DOUBLE)", "(1.0),(2.0),(3.0),(4.0)"),
  agg("CAST(stddev_samp(x) AS DOUBLE)", "(1.0),(2.0)"),
  agg("CAST(var_pop(x) AS DOUBLE)", "(1.0),(2.0),(3.0)"),
  agg("CAST(var_samp(x) AS DOUBLE)", "(1.0),(2.0),(3.0)"),
  agg("CAST(variance(x) AS DOUBLE)", "(1.0),(2.0),(3.0)"),
  agg("CAST(skewness(x) AS DOUBLE)", "(1.0),(2.0),(2.0),(9.0)"),
  agg("CAST(kurtosis(x) AS DOUBLE)", "(1.0),(2.0),(2.0),(9.0),(3.0)"),
  agg("CAST(covar_pop(x, y) AS DOUBLE)", "(1.0, 2.0),(2.0, 4.0),(3.0, 5.0)", "t(x, y)"),
  agg("CAST(covar_samp(x, y) AS DOUBLE)", "(1.0, 2.0),(2.0, 4.0),(3.0, 5.0)", "t(x, y)"),
  agg("CAST(corr(x, y) AS DOUBLE)", "(1.0, 2.0),(2.0, 4.0),(3.0, 5.0)", "t(x, y)"),
  agg("CAST(regr_slope(y, x) AS DOUBLE)", "(1.0, 2.0),(2.0, 4.0),(3.0, 5.0)", "t(x, y)"),
  agg("CAST(regr_intercept(y, x) AS DOUBLE)", "(1.0, 2.0),(2.0, 4.0),(3.0, 5.0)", "t(x, y)"),
  agg("string_agg(x, '-')", "('a'),('b'),(NULL),('c')"),
  agg("string_agg(x)", "('a'),('b')"),
  agg("list_sort(list(x))", "(3),(1),(NULL),(2)"),
  agg("CAST(fsum(x) AS DOUBLE)", "(1.5),(2.5)"),
  agg("CAST(favg(x) AS DOUBLE)", "(1.0),(2.0)"),
  agg("CAST(geomean(x) AS DOUBLE)", "(2.0),(8.0)"),
  agg("CAST(entropy(x) AS DOUBLE)", "(1),(1),(2),(2)"),
  agg("CAST(entropy(x) AS DOUBLE)", "(1),(1),(1),(2)"),
  agg("CAST(entropy(x) AS DOUBLE)", "(NULL::INTEGER)"),
  agg("CAST(entropy(x) AS DOUBLE)", "(1),(NULL),(1),(2)"),
  agg("CAST(entropy(x) AS DOUBLE)", "('a'),('b'),('a')"),
  agg("CAST(entropy(DISTINCT x) AS DOUBLE)", "(1),(1),(2)"),
  agg("CAST(entropy(x) FILTER (WHERE x > 1) AS DOUBLE)", "(1),(2),(2),(3)"),
  agg("any_value(x)", "(7)"),
  agg("CAST(quantile_disc(x, 0.5) FILTER (WHERE x > 1) AS BIGINT)", "(1),(2),(3)"),
  # small-n skewness/kurtosis: the sample corrections divide by n-2 / n-3
  agg("CAST(skewness(x) AS DOUBLE)", "(1.0),(2.0)"),
  agg("CAST(kurtosis(x) AS DOUBLE)", "(1.0),(2.0),(3.0)"),
  agg("CAST(skewness(x) AS DOUBLE)", "(1.0),(5.0),(2.0),(8.0),(3.0)"),
  agg("CAST(kurtosis(x) AS DOUBLE)", "(1.0),(5.0),(2.0),(8.0),(3.0),(9.0)"))

# ----------------------------------------------------------- windows
def win(outer, inner, vals, t="t(x)"):
    return (f"(SELECT {outer} FROM (SELECT {inner} AS r, x "
            f"FROM (VALUES {vals}) {t}) s)")

p("window",
  win("list_sort(list(r))", "ntile(3) OVER (ORDER BY x)",
      "(1),(2),(3),(4),(5),(6),(7)"),
  win("list_sort(list(r))", "CAST(percent_rank() OVER (ORDER BY x) AS DOUBLE)",
      "(10),(20),(30)"),
  win("list_sort(list(r))", "CAST(cume_dist() OVER (ORDER BY x) AS DOUBLE)",
      "(10),(20),(20)"),
  win("list_sort(list(r))", "rank() OVER (ORDER BY x)", "(1),(2),(2),(3)"),
  win("list_sort(list(r))", "dense_rank() OVER (ORDER BY x)", "(1),(2),(2),(3)"),
  win("list_sort(list(r))", "row_number() OVER (ORDER BY x)", "(5),(3),(4)"),
  win("max(r)", "lag(x) OVER (ORDER BY x)", "(1),(2),(3)"),
  win("min(r)", "lag(x, 1, -1) OVER (ORDER BY x)", "(1),(2),(3)"),
  win("max(r)", "lead(x, 2) OVER (ORDER BY x)", "(1),(2),(3)"),
  win("list_sort(list(r))", "first_value(x) OVER (ORDER BY x)", "(2),(1),(3)"),
  win("list_sort(list(r))", "last_value(x) OVER (ORDER BY x)", "(2),(1),(3)"),
  win("list_sort(list(r))", "nth_value(x, 2) OVER (ORDER BY x)", "(2),(1),(3)"),
  win("list_sort(list(r))",
      "CAST(sum(x) OVER (ORDER BY x ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS BIGINT)",
      "(1),(2),(3)"),
  win("list_sort(list(r))",
      "CAST(count(*) OVER (PARTITION BY x % 2) AS BIGINT)", "(1),(2),(3),(4)"))

# ----------------------------------------------------------- wave 4
# (round 14) the families wave 3 didn't reach: simple case mapping,
# date_trunc's full alias set + coarse fields, json_valid edges, zero
# divisors at every spelling, DATE−DATE/interval infix arithmetic, nested
# list/struct/map compositions, interval comparisons, string ordering
# edges, aggregate NULL/overflow edges.
p("string",
  "lower('ẞ')", "upper('µ')", "upper('ı')", "lower('İ')",
  "lower('ΑΣ')", "upper('ﬁt')", "upper('ŉx')", "lower('Ǆ')",
  "ucase('abc')", "lcase('ABC')",
  "upper('ÿz')", "lower('ÐÞ')", "upper('œ')",
  # ordering/collation edges: DuckDB compares raw bytes (codepoints)
  "'a' < 'B'", "'A' < 'a'", "'z' < 'é'", "'ab' < 'b'",
  "greatest('a', 'B')", "least('A', 'a')",
  "'abc' = 'ABC'", "'ß' = 'ss'")
p("datetime",
  "date_trunc('decade', DATE '1987-06-05')",
  "date_trunc('century', DATE '1987-06-05')",
  "date_trunc('century', DATE '2000-06-05')",
  "date_trunc('century', DATE '2001-06-05')",
  "date_trunc('millennium', DATE '1987-06-05')",
  "date_trunc('decade', TIMESTAMP '1987-06-05 04:03:02')",
  "date_trunc('isoyear', DATE '2021-01-01')",
  "date_trunc('isoyear', DATE '2016-01-01')",
  "date_trunc('isoyear', DATE '1987-06-05')",
  "date_trunc('milliseconds', TIMESTAMP '1987-06-05 04:03:02.123456')",
  "date_trunc('epoch', TIMESTAMP '1987-06-05 04:03:02.123456')",
  "date_trunc('yrs', DATE '2024-03-14')",
  "date_trunc('mons', TIMESTAMP '2024-03-14 10:11:12')",
  "date_trunc('d', DATE '2024-03-14')",
  "date_trunc('weeks', DATE '2024-03-14')",
  "date_trunc('hrs', TIMESTAMP '2024-03-14 10:11:12')",
  "date_trunc('mins', TIMESTAMP '2024-03-14 10:11:12')",
  "date_trunc('secs', TIMESTAMP '2024-03-14 10:11:12.9')",
  # infix date arithmetic through graft_sub
  "DATE '2024-03-01' - DATE '2024-02-01'",
  "DATE '2024-01-01' - DATE '2024-03-01'",
  "DATE '2024-03-01' - 1",
  "DATE '2024-03-01' - INTERVAL 1 DAY",
  "TIMESTAMP '2024-03-01 10:00:00' - INTERVAL 90 MINUTE",
  "DATE '2024-03-31' - INTERVAL 1 MONTH",
  "(DATE '2024-03-01' - DATE '2024-02-01') + 1",
  # interval comparisons
  "INTERVAL 2 DAY > INTERVAL 90 MINUTE",
  "INTERVAL 1 DAY = INTERVAL 24 HOUR",
  "INTERVAL 90 MINUTE < INTERVAL 2 HOUR")
p("numeric",
  "7 // 0", "7.5 // 0", "CAST(7 AS DECIMAL(5,2)) // 0",
  "CAST(7 AS DOUBLE) / 0", "CAST(7 AS DOUBLE) % 0",
  "CAST(-7 AS DOUBLE) / CAST(0 AS DOUBLE)",
  "7 // 2.5", "-7 // 2",
  "fmod(7.5, 0)", "fdiv(7.5, 0)",
  "gcd(0, 0)", "lcm(0, 0)", "gcd(7, 7)", "lcm(-4, 6)",
  "CAST(1 AS TINYINT) - CAST(2 AS TINYINT)",
  "1 - 2.5", "1.5 - CAST(1 AS DOUBLE)",
  "CAST(10.50 AS DECIMAL(12,2)) - 3",
  "CAST(10.50 AS DECIMAL(12,2)) - CAST(0.123 AS DECIMAL(6,3))")
p("list",
  # nested list/struct/map compositions
  "list_transform([[1,2],[3]], l -> len(l))",
  "list_transform([1,2,3], x -> [x, x+1])[2]",
  "flatten(list_transform([1,2], x -> [x]))",
  "list_filter(list_transform([1,2,3], x -> x*x), v -> v > 2)",
  "[{'a': 1}, {'a': 2}][2].a",
  "list_transform([{'a': 1}, {'a': 4}], s -> s.a)",
  "map_values(MAP {'k': [1,2]})[1][2]",
  "len(map_keys(MAP {'a': 1, 'b': 2}))",
  "list_sort([[2],[1,2],[1]])",
  "list_contains([[1],[2]], [2])",
  "list_position([[1],[2],[3]], [3])",
  "list_unique([[1],[1],[2]])",
  "[1,2,3][2:2]", "[1,2,3][:2]", "[1,2,3][2:]",
  "list_slice([1,2,3,4,5], 2, -2)",
  "list_aggregate([[1],[2,3]], 'count')",
  "struct_extract({'x': {'y': 9}}, 'x').y",
  "{'x': [1,2]}.x[1]")
p("agg",
  # NULL/overflow edges: sum over BIGINT near the boundary (DuckDB
  # widens to HUGEINT — CAST pins the comparable shape), avg precision,
  # all-NULL groups, count_if, bit aggregates over negatives
  agg("CAST(sum(x) AS BIGINT)", "(9223372036854775806),(1)"),
  agg("CAST(sum(x) AS DOUBLE)", "(1.5e308),(1.5e308)"),
  agg("CAST(avg(x) AS DOUBLE)", "(1),(2),(NULL)"),
  agg("CAST(avg(x) AS DOUBLE)", "(NULL::INTEGER)"),
  agg("bit_and(x)", "(-1),(-2)"), agg("bit_or(x)", "(-8),(1)"),
  agg("bit_xor(x)", "(NULL::INTEGER)"),
  agg("bool_and(x)", "(NULL::BOOLEAN)"),
  agg("count_if(x)", "(true),(false),(NULL)"),
  agg("CAST(median(x) AS DOUBLE)", "(1),(2),(3),(4)"),
  agg("CAST(median(x) AS BIGINT)", "(NULL::INTEGER)"),
  agg("mode(x)", "('a'),('b'),('a')"),
  agg("CAST(quantile_cont(x, 0.5) AS DOUBLE)", "(1.0),(2.0),(4.0)"),
  agg("CAST(quantile_disc(x, 0.0) AS BIGINT)", "(5),(1),(3)"),
  agg("CAST(quantile_disc(x, 1.0) AS BIGINT)", "(5),(1),(3)"),
  agg("string_agg(x, '-' ORDER BY x DESC)", "('a'),('c'),('b')"),
  agg("CAST(sum(x) FILTER (WHERE x > 1) AS BIGINT)", "(1),(2),(NULL),(3)"),
  agg("max(x)", "(DATE '2024-01-01'),(DATE '2023-05-05')"),
  agg("CAST(max(x) - min(x) AS BIGINT)",
      "(DATE '2024-01-03'),(DATE '2024-01-01')"))

# round-14 quantile type edges: median over VARCHAR (discrete-lower,
# type-preserving), DATE/TIMESTAMP (microsecond interpolation → TIMESTAMP),
# quantile_cont over wide DECIMAL (unscaled-double arithmetic) and
# timestamps. Grid norm() strips fractional seconds — whole-second cases
# here; the .5-microsecond midpoint is pinned in QuantileParitySpec.
p("agg",
  agg("median(x)", "('a'),('b'),('c'),('d')"),
  agg("median(x)", "('b'),('a'),('c')"),
  agg("median(x)", "(TIMESTAMP '2024-01-01 00:00:00'),(TIMESTAMP '2024-01-02 00:00:00')"),
  agg("median(x)", "(DATE '2024-01-01'),(DATE '2024-01-03')"),
  agg("median(x)", "(DATE '2024-01-01'),(DATE '2024-01-02'),(DATE '2024-01-05')"),
  agg("median(DISTINCT x)", "('a'),('a'),('b'),('z')"),
  agg("quantile_cont(x, 0.5)",
      "(TIMESTAMP '2024-01-01 00:00:00'),(TIMESTAMP '2024-01-02 00:00:02')"),
  agg("quantile_cont(x, 0.25)",
      "(TIMESTAMP '2024-01-01 00:00:00'),(TIMESTAMP '2024-01-01 00:00:04'),(TIMESTAMP '2024-01-02 00:00:00')"),
  agg("CAST(quantile_cont(x, 0.3) AS DOUBLE)",
      "(CAST(1.5 AS DECIMAL(25,2))),(CAST(4.25 AS DECIMAL(25,2))),(CAST(9 AS DECIMAL(25,2)))"),
  agg("CAST(quantile_cont(x, 0.25) AS VARCHAR)",
      "(CAST('123456789012345678901.123' AS DECIMAL(38,3))),(CAST('123456789012345678909.125' AS DECIMAL(38,3)))"),
  agg("CAST(quantile_cont(x, 0.5) AS VARCHAR)",
      "(CAST('1000000000000000000000000000000' AS DECIMAL(38,0))),(CAST('1000000000000000000000000000003' AS DECIMAL(38,0)))"),
  agg("CAST(quantile_cont(x, [0.25, 0.75])[1] AS VARCHAR)",
      "(CAST(-1.37 AS DECIMAL(30,5))),(CAST(4.25001 AS DECIMAL(30,5))),(CAST(9.1 AS DECIMAL(30,5)))"),
  agg("median(x)", "(NULL::VARCHAR)"),
  agg("median(x)", "(NULL::TIMESTAMP)"))
p("string",
  "upper(NULL)", "lower(NULL)", "upper('')",
  "'é' < 'z'", "'Z' < 'a'", "greatest('ß', 'z')",
  "repeat('é', 2)", "reverse('héllo')")
p("datetime",
  "date_trunc('c', DATE '1987-06-05')",
  "date_trunc('mil', DATE '1987-06-05')",
  "date_trunc('dayofmonth', TIMESTAMP '2024-03-14 10:11:12')",
  "date_trunc('weekofyear', DATE '2024-03-14')",
  "DATE '2024-01-01' - DATE '2024-01-01'",
  "(DATE '2024-03-01' - DATE '2024-02-01') % 7",
  # ts − date agrees semantically (an interval) but interval VALUES have
  # no common textual normalization between the engines — spelled as a
  # datediff probe instead
  "datediff('hour', DATE '2024-02-29', TIMESTAMP '2024-03-01 00:00:00')")
p("json",
  """json_valid('null')""", """json_valid(' null ')""",
  """json_valid(NULL)""", """json_valid('"x"')""",
  """json_valid('[1,2]')""", """json_valid('true')""")
p("numeric",
  "lcm(4, 6) + gcd(12, 18)", "gcd(0, -7)", "lcm(1, 1)",
  "5 - 2 - 1", "2.5 - 1", "CAST(1 AS SMALLINT) - CAST(250 AS SMALLINT)")

# ----------------------------------------------------------- wave 5
# (round 14) quantile aggregates in WINDOW position — whole-partition
# frames ride the histogram group-join stitch, ordered/sliding frames
# the windowed collect_list composite
# (QuantileFallbackRule.rewriteWindow). x % 2 over NULL rows exercises
# NULL partition keys through the stitch's null-safe join and DuckDB's
# NULL/0.0 answers for empty frames.
p("window",
  win("list_sort(list(r))",
      "CAST(median(x) OVER (PARTITION BY x % 2) AS DOUBLE)",
      "(1),(2),(3),(4),(5)"),
  win("list_sort(list(r))", "CAST(median(x) OVER () AS DOUBLE)",
      "(1),(2),(30)"),
  win("max(r) IS NULL", "median(x) OVER (PARTITION BY x % 2)",
      "(NULL::INTEGER),(NULL::INTEGER)"),
  win("list_sort(list(r))", "quantile_disc(x, 0.25) OVER ()",
      "(10),(20),(30),(40)"),
  win("list_sort(list(r))", "quantile_disc(x, 0.5) OVER (ORDER BY x)",
      "(10),(20),(30)"),
  win("list_sort(list(r))",
      "CAST(quantile_cont(x, 0.5) OVER (ORDER BY x) AS DOUBLE)",
      "(10),(20),(30)"),
  win("list_sort(list(r))",
      "CAST(median(x) OVER (ORDER BY x ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS DOUBLE)",
      "(10),(20),(40)"),
  win("list_sort(list(r))", "median(x) OVER (ORDER BY x)",
      "('b'),('a'),('c')"),
  win("list_sort(list(r))",
      "CAST(entropy(x) OVER (ORDER BY x) AS DOUBLE)", "(1),(1),(2)"),
  win("max(r[2])", "quantile_disc(x, [0.25, 0.75]) OVER ()",
      "(10),(20),(30),(40)"),
  win("max(r)", "CAST(entropy(x) OVER (PARTITION BY x % 2) AS DOUBLE)",
      "(NULL::INTEGER),(NULL::INTEGER)"))

# wave 5b: date_part/extract over INTERVAL values (graft_datepart) —
# DuckDB's independent month/day/micros components: hours UNBOUNDED
# (26 stays 26, never rolls into days), minutes roll into hours,
# trunc-toward-zero month arithmetic, second/ms/us within the minute,
# DOUBLE epoch with 365.25-day years + 30-day month remainders. Also
# re-pins the epoch() rewrite (now routed through the marker) on
# date/timestamp sources.
p("temporal",
  "extract(hour FROM INTERVAL 90 MINUTE)",
  "extract(minute FROM INTERVAL 90 MINUTE)",
  "extract(year FROM INTERVAL 14 MONTH)",
  "extract(month FROM INTERVAL '-14' MONTH)",
  "extract(day FROM INTERVAL 26 HOUR)",
  "extract(hour FROM INTERVAL 26 HOUR)",
  "extract(quarter FROM INTERVAL 14 MONTH)",
  "extract(decade FROM INTERVAL '-25' YEAR)",
  "date_part('ms', INTERVAL '1.5' SECOND)",
  "date_part('us', INTERVAL '1.5' SECOND)",
  "date_part('s', INTERVAL '1.5' SECOND)",
  "date_part('mins', INTERVAL 3661 SECOND)",
  "CAST(date_part('epoch', INTERVAL 14 MONTH) AS DOUBLE)",
  "CAST(date_part('epoch', INTERVAL 90 MINUTE) AS DOUBLE)",
  "CAST(epoch(INTERVAL 2 DAY) AS DOUBLE)",
  "extract(day FROM TIMESTAMP '2024-03-05 10:00:00' - TIMESTAMP '2024-03-01 08:00:00')",
  "extract(hour FROM TIMESTAMP '2024-03-05 10:00:00' - TIMESTAMP '2024-03-01 08:00:00')",
  "extract(minute FROM INTERVAL 3661 SECOND)",
  "CAST(date_part('epoch', DATE '2024-01-02') AS DOUBLE)",
  "CAST(epoch(TIMESTAMP '2024-01-01 00:00:01.5') AS DOUBLE)")

# ----------------------------------------------------------- wave 6
# (round 14) families the earlier waves under-covered: hashing, the
# regex family, struct/map functions, hex/encode, arg-order-sensitive
# math (2-arg log, atan2), temporal constructors, list aggregation,
# three-valued boolean logic, and string-function edges.
p("string",
  "md5('abc')", "sha256('')",
  "regexp_matches('aaa', 'a+')", "regexp_matches('abc', '^b')",
  "regexp_replace('aaaa', 'aa', 'b')",
  "regexp_replace('aaaa', 'aa', 'b', 'g')",
  "regexp_extract('a1b22c', '[0-9]+', 0)",
  "regexp_extract('ab12', '([a-z]+)([0-9]+)', 2)",
  "regexp_extract_all('a1b22c', '[0-9]+')",
  "regexp_split_to_array('a,b;c', '[,;]')",
  "regexp_full_match('abc', 'a.c')", "regexp_full_match('abc', 'a.')",
  "translate('abcba', 'ab', 'xy')", "repeat('ab', 3)", "repeat('ab', 0)",
  "replace('aaa', '', 'x')", "ascii('xyz')", "chr(9731)",
  "strip_accents('piñata café')", "position('b' IN 'abcb')",
  "instr('abcb', 'b')", "starts_with('abc', 'ab')",
  "ends_with('abc', 'bc')", "contains('abc', 'z')",
  "concat_ws('-', 'a', NULL, 'b')", "to_base(255, 16)",
  "to_hex(255)", "hex('ab')", "unhex('6162')::VARCHAR",
  "to_base64('ab'::BLOB)", "from_base64('YWI=')::VARCHAR",
  "bit_length('abc')", "octet_length('abc')",
  "left('héllo', 2)", "right('héllo', 2)",
  "format('{:.2f}', 3.14159)", "printf('%05d', 42)",
  "printf('%.3f|%s', 2.5, 'x')")
p("numeric",
  "log(2, 8)", "atan2(1.0, 2.0)", "CAST(cbrt(27) AS DOUBLE)",
  "factorial(5)", "CAST(pow(2, -2) AS DOUBLE)", "2 ** 10",
  "CAST(round(2.5) AS DOUBLE)", "CAST(round(-2.5) AS DOUBLE)",
  "CAST(round(2.5::DOUBLE) AS DOUBLE)", "CAST(round(3.345, 1) AS DOUBLE)",
  "CAST(ceil(-0.5) AS DOUBLE)", "CAST(power(0, 0) AS DOUBLE)",
  "sign(-0.0::DOUBLE)", "CAST(0.1 + 0.2 AS DOUBLE)",
  "divide(7, 2)", "multiply(3, 4)", "add(1, 2)", "subtract(10, 3)")
p("predicate",
  "TRUE AND NULL", "FALSE AND NULL", "TRUE OR NULL", "FALSE OR NULL",
  "NOT NULL::BOOLEAN", "NULL = NULL", "NULL IS DISTINCT FROM NULL",
  "1 IS DISTINCT FROM NULL", "coalesce(NULL, NULL, 2)",
  "ifnull(NULL, 2)", "nullif(3, 3)", "nullif(3, 4)",
  "CAST(nvl2(NULL, 'a', 'b') AS VARCHAR)")
p("map",
  "map_keys(MAP {'a': 1, 'b': 2})", "map_values(MAP {'a': 1, 'b': 2})",
  "cardinality(MAP {'a': 1, 'b': 2})",
  "(MAP {'a': 1, 'b': 2}).a")
p("list",
  "list_aggregate([3, 1, 2], 'string_agg', '-')",
  "list_aggregate([3, 1, 2], 'sum')", "list_aggregate([3, 1, 2], 'min')",
  "flatten([[1, 2], [], [3]])", "list_concat([1], [2, 3])",
  "list_contains([1, 2], 2)", "list_position([7, 8, 9], 9)",
  "list_reverse([1, 2, 3])", "array_length([1, 2, 3])",
  "list_sum([1, NULL, 2])", "[1, 2] || [3]")
p("datetime",
  "make_date(2024, 2, 29)", "CAST(make_timestamp(2024, 1, 2, 3, 4, 5.5) AS VARCHAR)",
  "last_day(DATE '2024-02-05')", "monthname(DATE '2024-02-05')",
  "dayname(DATE '2024-02-05')",
  "date_add(DATE '2024-01-31', INTERVAL 1 MONTH)",
  "datediff('month', DATE '2024-01-15', DATE '2024-03-01')",
  "datesub('month', DATE '2024-01-15', DATE '2024-03-14')",
  "greatest(DATE '2024-01-01', DATE '2023-12-31')",
  # age(): the interval's TEXT rendering differs between engines, so the
  # probes read the components through date_part (full parity via the
  # CalendarInterval branch of graft_datepart)
  "date_part('month', age(TIMESTAMP '2024-03-05 10:00:00', TIMESTAMP '2024-01-01 08:30:00'))",
  "date_part('day', age(TIMESTAMP '2024-03-05 10:00:00', TIMESTAMP '2024-01-01 08:30:00'))",
  "date_part('hour', age(TIMESTAMP '2024-03-05 10:00:00', TIMESTAMP '2024-01-01 08:30:00'))",
  "date_part('day', age(TIMESTAMP '2024-03-31 10:00:00', TIMESTAMP '2024-01-31 11:00:00'))",
  "date_part('hour', age(TIMESTAMP '2024-03-31 10:00:00', TIMESTAMP '2024-01-31 11:00:00'))",
  "date_part('month', age(TIMESTAMP '2025-02-28 00:00:00', TIMESTAMP '2024-02-29 00:00:00'))",
  "date_part('day', age(TIMESTAMP '2025-02-28 00:00:00', TIMESTAMP '2024-02-29 00:00:00'))",
  "date_part('day', age(TIMESTAMP '2024-01-01 08:30:00', TIMESTAMP '2024-03-05 10:00:00'))",
  "datesub('month', DATE '2024-01-15', DATE '2024-03-14')",
  "datesub('month', DATE '2024-03-14', DATE '2024-01-15')",
  "datesub('month', DATE '2023-01-31', DATE '2023-02-28')",
  "datesub('year', DATE '2023-03-15', DATE '2024-03-14')",
  "datesub('quarter', DATE '2024-01-15', DATE '2024-07-14')",
  "datesub('week', DATE '2024-01-01', DATE '2024-01-16')",
  "datesub('day', TIMESTAMP '2024-01-01 09:00:00', TIMESTAMP '2024-01-02 10:00:00')",
  "datesub('hour', TIMESTAMP '2024-01-01 09:30:00', TIMESTAMP '2024-01-01 08:00:00')",
  "datesub('mins', TIMESTAMP '2024-01-01 09:00:00', TIMESTAMP '2024-01-01 09:59:30')")
p("numeric",
  "2 ** 3 ** 2", "-2 ** 2", "CAST(2 ** -2 AS DOUBLE)", "2 + 3 ** 2",
  "2 ** 2 * 3", "(1 + 1) ** 3", "abs(-2) ** 2",
  "divide(7.5, 2)", "divide(-7, 2)")
p("agg",
  agg("first(x ORDER BY k)", "(1,NULL),(2,5),(3,1)", t="t(x, k)"),
  agg("last(x ORDER BY k DESC)", "(1,NULL),(2,5),(3,1)", t="t(x, k)"),
  agg("arbitrary(x)", "(7),(8)"),
  agg("count(x) FILTER (x > 1)", "(1),(2),(3)"),
  agg("first(x ORDER BY k, x)", "(2,1),(1,1),(3,0)", t="t(x, k)"),
  agg("list(x ORDER BY k DESC, x DESC)", "(2,1),(1,1),(3,0)", t="t(x, k)"),
  agg("string_agg(x, '-' ORDER BY k, x)", "(2,1),(1,1),(3,0)", t="t(x, k)"))
p("agg",
  agg("string_agg(x, '|')", "('a'),('b'),(NULL),('c')"),
  agg("CAST(product(x) AS DOUBLE)", "(2.0),(3.0),(4.0)"),
  agg("bit_xor(x)", "(5),(3),(6)"),
  agg("arg_max(x, x % 3)", "(1),(2),(3),(4)"),
  agg("arg_min(x || '', x)", "(5),(2),(9)"),
  agg("first(x ORDER BY x DESC)", "(1),(3),(2)"),
  agg("last(x ORDER BY x)", "(1),(3),(2)"),
  agg("mode(x)", "(1),(2),(2),(3)"),
  agg("CAST(corr(x, x * 2) AS DOUBLE)", "(1.0),(2.0),(3.0)"),
  agg("CAST(covar_pop(x, x) AS DOUBLE)", "(1.0),(2.0),(3.0)"),
  agg("count(*) FILTER (x > 1)", "(1),(2),(3)"))

# ----------------------------------------------------------- wave 7
# (round 14) list lambdas, string-similarity metrics, blob functions,
# ILIKE spellings, greatest/least NULL edges, struct functions, bar().
p("list",
  "list_transform([1, 2, 3], x -> x * 2)",
  "list_filter([1, 2, 3, 4], x -> x % 2 = 0)",
  "list_reduce([1, 2, 3, 4], (a, b) -> a + b)",
  "list_transform(['a', 'b'], s -> upper(s))",
  "list_has_any([1, 2], [2, 3])", "list_has_all([1, 2, 3], [2, 3])",
  "list_sort([3, 1, 2], 'DESC')", "list_sort([3, NULL, 1], 'ASC', 'NULLS FIRST')",
  "list_value(1, 2, 3)", "len(list_value())",
  "list_cosine_similarity([1.0, 0.0], [0.0, 1.0])",
  "CAST(list_dot_product([1.0, 2.0], [3.0, 4.0]) AS DOUBLE)",
  "CAST(list_inner_product([1.0, 2.0], [3.0, 4.0]) AS DOUBLE)",
  "CAST(list_distance([0.0, 0.0], [3.0, 4.0]) AS DOUBLE)",
  "CAST(list_cosine_similarity([1.0, 2.0], [2.0, 4.0]) AS DOUBLE)",
  "list_reverse_sort([1, NULL, 3])",
  "list_sort([3, NULL, 1], 'DESC')",
  "list_sort([3, NULL, 1], 'DESC', 'NULLS FIRST')",
  "list_sort([3, NULL, 1], 'ASC', 'NULLS LAST')",
  "list_reduce([5], (a, b) -> a + b)",
  "list_reduce(['a', 'b', 'c'], (a, b) -> a || b)")
p("string",
  "CAST(jaro_similarity('martha', 'marhta') AS DOUBLE)",
  "CAST(jaro_winkler_similarity('martha', 'marhta') AS DOUBLE)",
  "damerau_levenshtein('abcd', 'acbd')",
  "CAST(jaccard('abc', 'bcd') AS DOUBLE)",
  "'AbC' ILIKE 'abc'", "'AbC' NOT ILIKE 'xyz'",
  "'abc' ILIKE 'A%'", "ilike_escape('A_C', 'a$_c', '$')",
  "like_escape('a_c', 'a$_c', '$')",
  "octet_length('ab'::BLOB)", "encode('abc')::VARCHAR",
  "decode('abc'::BLOB)",
  "bar(3, 0, 6, 6)", "bar(2.5, 0, 6, 6)", "bar(0.9, 0, 6, 6)",
  "bar(5.99, 0, 6, 6)", "bar(7, 0, 6, 6)", "bar(-1, 0, 6, 6)",
  "length(bar(2.5, 0, 6))")
p("predicate",
  "greatest(1, NULL, 3)", "least(NULL::INTEGER, NULL::INTEGER)",
  "greatest('b', 'a', 'c')", "least(1.5, 2)",
  "NULL IS NOT DISTINCT FROM NULL", "3 IS NOT DISTINCT FROM 3",
  "isnan('nan'::DOUBLE)", "isinf('-inf'::DOUBLE)",
  "signbit(-0.0::DOUBLE)")
p("map",
  "map_from_entries([{'k': 'a', 'v': 1}, {'k': 'b', 'v': 2}])['b']",
  "map_concat(MAP {'a': 1}, MAP {'b': 2})['b']",
  "element_at(MAP {'a': 1}, 'a')")
p("numeric",
  "nextafter(1.0, 2.0) = 1.0000000000000002",
  "nextafter(1.0, 0.0) < 1.0", "signbit(nextafter(-0.0, -1.0))",
  "nextafter(1.0, 2.0)", "CAST(ldexp(1.0, 3) AS DOUBLE)",
  "even(-2.5)", "CAST(cot(1.0) AS DOUBLE)",
  "CAST(degrees(pi()) AS DOUBLE)", "CAST(radians(180.0) AS DOUBLE)",
  "CAST(atanh(0.5) AS DOUBLE)", "bit_count(CAST(-1 AS BIGINT))",
  "CAST(exp(1) AS DOUBLE)")

# ----------------------------------------------------------- wave 8
# (round 14) regression aggregates, strftime specifier coverage, fmt
# thousands/alignment, epoch_us/ns, 1-arg to_timestamp, century/decade/
# millennium as date_part fields, approx_quantile (small-n exact).
p("agg",
  agg("CAST(regr_slope(y, x) AS DOUBLE)", "(1,2),(2,4),(3,7)", t="t(x, y)"),
  agg("CAST(regr_intercept(y, x) AS DOUBLE)", "(1,2),(2,4),(3,7)", t="t(x, y)"),
  agg("CAST(regr_r2(y, x) AS DOUBLE)", "(1,2),(2,4),(3,7)", t="t(x, y)"),
  agg("CAST(regr_count(y, x) AS BIGINT)", "(1,2),(2,NULL),(3,7)", t="t(x, y)"),
  agg("CAST(regr_avgx(y, x) AS DOUBLE)", "(1,2),(2,4),(3,7)", t="t(x, y)"),
  agg("CAST(regr_avgy(y, x) AS DOUBLE)", "(1,2),(2,4),(3,7)", t="t(x, y)"),
  agg("CAST(regr_sxy(y, x) AS DOUBLE)", "(1,2),(2,4),(3,7)", t="t(x, y)"),
  agg("CAST(regr_sxx(y, x) AS DOUBLE)", "(1,2),(2,4),(3,7)", t="t(x, y)"),
  agg("CAST(covar_samp(x, y) AS DOUBLE)", "(1,2),(2,4),(3,7)", t="t(x, y)"),
  agg("CAST(var_pop(x) AS DOUBLE)", "(1.0),(2.0),(4.0)"),
  agg("CAST(approx_quantile(x, 0.5) AS BIGINT)", "(1),(2),(3),(4),(5)"))
p("datetime",
  "strftime(DATE '2024-03-09', '%a %A %b %B %j')",
  "strftime(TIMESTAMP '2024-03-09 14:05:06', '%I %p %H:%M:%S')",
  "strftime(TIMESTAMP '2024-03-09 14:05:06.123456', '%f')",
  "strftime(TIMESTAMP '2024-03-09 14:05:06.123456', '%g')",
  "epoch_us(TIMESTAMP '2024-01-01 00:00:00.000123')",
  "epoch_ns(TIMESTAMP '2024-01-01 00:00:00.000123')",
  "CAST(epoch_us(1704067200000123) AS VARCHAR)",
  "CAST(date_part('epoch', to_timestamp(1700000000.5)) AS DOUBLE)",
  "date_part('century', DATE '2001-01-01')",
  "date_part('century', DATE '2000-01-01')",
  "extract(decade FROM DATE '1987-06-05')",
  "extract(millennium FROM TIMESTAMP '2001-01-01 00:00:00')",
  "dayofyear(DATE '2024-03-01')", "weekofyear(DATE '2024-01-01')")
p("string",
  "format('{:,}', 123456789)", "format('{:>6}', 'ab')",
  "format('{:<4}', 'ab') || '|'")

# ----------------------------------------------------------- wave 9
# (round 15) multi-unit INTERVAL literals (the round-14 "unrepresentable
# corner", now on make_interval/CalendarIntervalType), cross-family
# interval arithmetic, and interval comparison normalization (months at a
# flat 30 days, days at 24 h). Components compared via date_part — the
# engines' interval TEXT renderings differ (the age() convention).
p("interval",
  "date_part('day', INTERVAL '400 days 26 hours')",
  "date_part('hour', INTERVAL '400 days 26 hours')",
  "date_part('month', INTERVAL '1 month 5 days')",
  "date_part('day', INTERVAL '1 month 5 days')",
  "date_part('year', INTERVAL '2 years 3 months')",
  "date_part('month', INTERVAL '2 years 3 months')",
  "date_part('month', INTERVAL '1.5 months')",
  "date_part('day', INTERVAL '1.5 months')",
  "date_part('day', INTERVAL '1.5 weeks')",
  "date_part('hour', INTERVAL '1.5 weeks')",
  "date_part('hour', INTERVAL '1.5 hours 90 seconds')",
  "date_part('minute', INTERVAL '1.5 hours 90 seconds')",
  "date_part('day', INTERVAL '3 weeks 2 days')",
  "date_part('day', INTERVAL '-3 days 5 hours')",
  "date_part('hour', INTERVAL '-3 days 5 hours')",
  "date_part('hour', INTERVAL '04:05:06')",
  "date_part('minute', INTERVAL '04:05:06')",
  "date_part('day', INTERVAL '1 day 01:30:00')",
  "date_part('minute', INTERVAL '1 day 01:30:00')",
  "date_part('year', INTERVAL '1 decade 1 year')",
  "date_part('year', INTERVAL '2 quarters 1 week')",
  "date_part('month', INTERVAL '2 quarters 1 week')",
  "date_part('day', INTERVAL '2 quarters 1 week')",
  "CAST(date_part('epoch', INTERVAL '1 month 5 days') AS DOUBLE)",
  "date_part('second', INTERVAL '1.9999996 seconds')",
  "date_part('microsecond', INTERVAL '1.9999996 seconds')")
p("interval",
  "date_part('day', INTERVAL 400 DAYS + INTERVAL 26 HOURS)",
  "date_part('hour', INTERVAL 400 DAYS + INTERVAL 26 HOURS)",
  "date_part('month', INTERVAL 1 MONTH + INTERVAL 1 DAY)",
  "date_part('day', INTERVAL 1 MONTH + INTERVAL 1 DAY)",
  "date_part('day', INTERVAL '1 day' - INTERVAL '26 hours')",
  "date_part('hour', INTERVAL '1 day' - INTERVAL '26 hours')",
  "date_part('month', INTERVAL '1 month 5 days' - INTERVAL '2 days 26 hours')",
  "date_part('day', INTERVAL '1 month 5 days' - INTERVAL '2 days 26 hours')",
  "date_part('hour', INTERVAL '1 month 5 days' - INTERVAL '2 days 26 hours')",
  "date_part('day', (TIMESTAMP '2024-01-03 20:00:00' - TIMESTAMP"
  " '2024-01-01 00:00:00') + (TIMESTAMP '2024-01-03 20:00:00' - TIMESTAMP"
  " '2024-01-01 00:00:00'))",
  "date_part('hour', (TIMESTAMP '2024-01-03 20:00:00' - TIMESTAMP"
  " '2024-01-01 00:00:00') + (TIMESTAMP '2024-01-03 20:00:00' - TIMESTAMP"
  " '2024-01-01 00:00:00'))",
  "CAST(TIMESTAMP '2024-01-31 00:00:00' + INTERVAL '1 month 2 days' AS VARCHAR)",
  "CAST(DATE '2024-01-31' + INTERVAL '1 month 26 hours' AS VARCHAR)")
# comparison normalization is duckdb's normalize-entries shape, NOT a
# flat total: days/30 and micros/(30 d) carry into months, remaining
# micros/(1 d) into days, and the carried days do NOT re-carry into
# months — '31 days' → (1 mo, 1 d) but '24 days 168 hours' → (0, 31 d),
# so they compare UNEQUAL despite equal flat hours (round-15 probe
# matrix; the second block below pins the distinguishing cases)
p("interval",
  "INTERVAL '31 days' = INTERVAL '24 days 168 hours'",
  "INTERVAL '31 days' > INTERVAL '24 days 168 hours'",
  "INTERVAL '744 hours' = INTERVAL '31 days'",
  "INTERVAL '744 hours' = INTERVAL '1 month 1 day'",
  "INTERVAL '1 month' = INTERVAL '720 hours'",
  "INTERVAL '1 month' = INTERVAL '20 days 240 hours'",
  "INTERVAL '1 month 1 day' > INTERVAL '24 days 200 hours'",
  "INTERVAL '1 month' > INTERVAL '29 days 23 hours'",
  "INTERVAL '1 month' < INTERVAL '29 days 25 hours'",
  "INTERVAL '1 month 1 day' > INTERVAL '31 days 1 hour'",
  "INTERVAL '50 hours' = INTERVAL '2 days 2 hours'",
  "INTERVAL '1441 minutes' > INTERVAL '1 day'",
  "INTERVAL '31 days' = INTERVAL '30 days 24 hours'",
  "INTERVAL '2 days' = INTERVAL '1 day 24 hours'",
  "INTERVAL '1 month' = INTERVAL '4 weeks 2 days'")
p("interval",
  "INTERVAL '1 month' = INTERVAL '30 days'",
  "INTERVAL '1 month' > INTERVAL '29 days'",
  "INTERVAL '1 month' < INTERVAL '31 days'",
  "INTERVAL '1 day' = INTERVAL '24 hours'",
  "INTERVAL '1 year' = INTERVAL '360 days'",
  "INTERVAL '1 year' = INTERVAL '365 days'",
  "INTERVAL '1 day 2 hours' > INTERVAL '25 hours'",
  "INTERVAL '1 month 1 day' > INTERVAL '31 days'",
  "INTERVAL '1 month 1 day' >= INTERVAL '31 days'",
  "INTERVAL '-1 month' < INTERVAL '-29 days'",
  "INTERVAL '1 month 5 days' <> INTERVAL '35 days'")

out_path = os.path.join(os.path.dirname(__file__),
                        "..", "src", "test", "resources", "probe_grid.tsv")
os.makedirs(os.path.dirname(out_path), exist_ok=True)
rows, skipped = [], []
for cat, sql in PROBES:
    try:
        v = con.sql(f"SELECT ({sql}) AS v").fetchone()[0]
        rows.append((cat, sql, norm(v)))
    except Exception as e:
        skipped.append((sql, str(e).split("\n")[0][:90]))
        # a Not-implemented class error ABORTS the duckdb transaction and
        # would poison every later probe — start fresh
        con = duckdb.connect()
with open(out_path, "w") as f:
    f.write("# category\tsql\texpected — generated by scripts/probe_grid.py "
            "against duckdb %s\n" % duckdb.__version__)
    for cat, sql, exp in rows:
        assert "\t" not in sql and "\t" not in exp, sql
        f.write(f"{cat}\t{sql}\t{exp}\n")
print(f"{len(rows)} probes written to {out_path}; {len(skipped)} skipped")
for s, e in skipped:
    print("  skipped:", s, "→", e)
