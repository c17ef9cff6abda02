#!/usr/bin/env python3
"""Query-SHAPE fuzzing (round 15, r14 verdict task 5): the scalar probe
grid is saturated (wave 8 dry, 870 probes), so composition bugs are the
remaining place for divergences to hide — the QUALIFY / frame-EXCLUDE /
ordered-aggregate / set-op rewriters compose with joins and aggregation in
ways single-feature oracles never exercise.

This generator builds ~260 deterministic pseudo-random FULL queries over
the sf0.001 fixture tables — 2-3-way joins, GROUP BY + HAVING, window
frames (ROWS/RANGE/GROUPS × EXCLUDE), set operations, QUALIFY, ordered
aggregates, correlated/IN subqueries — evaluates each in python-duckdb
(the driver's oracle engine), and pins the normalized result into a TSV
fixture that QueryFuzzSpec replays through the engine's SQL path.

Determinism rules the shapes obey (so a hash compare is meaningful):
  - rows are SORTED by their normalized text on both sides — queries don't
    need a total ORDER BY unless they use LIMIT;
  - LIMIT only rides a total (unique-key) ORDER BY;
  - window ORDER BY always ends in a unique key, so ROWS frames and
    lag/lead are deterministic; RANGE frames use a single numeric key;
  - double-typed SUM/AVG results are wrapped in round(x, 3) IN THE SQL:
    the two engines accumulate in different orders, and the ~1e-9
    accumulation error must not flip the 6dp normalization (sums of the
    integer-valued l_quantity are exact and stay unrounded).

Usage: python3 scripts/query_fuzz.py → src/test/resources/query_fuzz.tsv
Lines: <name>\t<sql>\t<nrows>\t<md5-of-normalized-sorted-rows>
Normalization mirrors QueryFuzzSpec.norm exactly (probe_grid conventions).
"""
import duckdb, hashlib, math, datetime, decimal, os, random

SF_DIR = "/root/testdata/sf0.001"
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

rng = random.Random(15)  # the round number; never reseed


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


def digest(rows):
    lines = sorted("|".join(norm(v) for v in r) for r in rows)
    return hashlib.md5("\n".join(lines).encode("utf-8")).hexdigest()


QUERIES = []


def q(sql):
    QUERIES.append(" ".join(sql.split()))


# ---------------------------------------------------------------- pools
LI_PRED = [
    "l_quantity BETWEEN 5 AND 20", "l_discount > 0.05",
    "l_returnflag = 'R'", "l_linestatus = 'F'",
    "l_shipdate < TIMESTAMP '1997-06-01 00:00:00'",
    "l_extendedprice > 20000", "l_tax <= 0.04",
    "l_linenumber <= 3", "l_partkey % 7 = 0"]
ORD_PRED = [
    "o_orderstatus = 'O'", "o_totalprice > 100000",
    "o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'",
    "o_orderpriority LIKE '1%'", "o_custkey % 5 = 1"]
CUST_PRED = [
    "c_mktsegment = 'BUILDING'", "c_acctbal > 0",
    "c_nationkey < 13", "c_name LIKE '%5%'"]
LI_GROUP = ["l_returnflag", "l_linestatus", "l_linenumber"]
AGGS = [
    "count(*) AS cnt", "sum(l_quantity) AS sq",
    "round(sum(l_extendedprice), 3) AS se",
    "round(avg(l_discount), 6) AS ad",
    "min(l_shipdate) AS ms", "max(l_extendedprice) AS mx",
    "count(DISTINCT l_orderkey) AS cdo"]
HAVINGS = [
    "count(*) > 3", "sum(l_quantity) > 50", "min(l_linenumber) = 1",
    "max(l_extendedprice) < 90000"]

# ------------------------------------------------------- 1. join + agg
for i in range(45):
    three = rng.random() < 0.5
    joins = ("lineitem JOIN orders ON l_orderkey = o_orderkey" +
             (" JOIN customer ON o_custkey = c_custkey" if three else ""))
    preds = [rng.choice(LI_PRED), rng.choice(ORD_PRED)]
    if three:
        preds.append(rng.choice(CUST_PRED))
    gcols = rng.sample(LI_GROUP, rng.randint(1, 2))
    if three and rng.random() < 0.5:
        gcols.append("c_mktsegment")
    aggs = rng.sample(AGGS, rng.randint(1, 3))
    having = f" HAVING {rng.choice(HAVINGS)}" if rng.random() < 0.5 else ""
    q(f"SELECT {', '.join(gcols)}, {', '.join(aggs)} FROM {joins} "
      f"WHERE {' AND '.join(preds)} GROUP BY {', '.join(gcols)}{having}")

# implicit comma joins + mixed filters, no grouping (row-shape checks)
for i in range(12):
    p1, p2 = rng.choice(LI_PRED), rng.choice(ORD_PRED)
    q(f"SELECT l_orderkey, l_linenumber, o_orderstatus, "
      f"round(l_extendedprice * (1 - l_discount), 3) AS net "
      f"FROM lineitem, orders WHERE l_orderkey = o_orderkey AND {p1} "
      f"AND {p2} AND l_orderkey % 37 = 3")

# ---------------------------------------------------- 2. window frames
# Windows ride `orders` — o_orderkey is the fixtures' only UNIQUE key, so
# ROWS frames and lag/lead are deterministic (lineitem's (okey, lineno)
# has 1161 duplicate pairs at sf0.001: a running sum ordered by it is
# tie-order-defined and the first fuzz run diverged on exactly that).
# Frame aggregates use INTEGER-VALUED expressions (sums exact in any
# accumulation order); RANGE-mode positional fns are skipped (the first/
# last row among order-by peers is physical-order-defined in both
# engines); min/max with RANGE k-offsets and first/last_value with
# EXCLUDE GROUP/TIES are documented loud pass-throughs.
FRAMES_ROWS = [
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
    "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW",
    "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING",
    "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING",
    "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING"]
# (GROUPS mode is a parser error in the oracle's duckdb build — the
# engine's GROUPS support is pinned by WindowExcludeSpec instead)
FRAMES_RANGE_NOOFF = [
    "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
    "RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING",
    "RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING"]
FRAMES_RANGE_OFF = [
    "RANGE BETWEEN 5 PRECEDING AND CURRENT ROW",
    "RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING"]
EXCLUDES = ["", " EXCLUDE CURRENT ROW", " EXCLUDE GROUP", " EXCLUDE TIES",
            " EXCLUDE NO OTHERS"]
AGG_FNS = ["count(*)", "sum(o_orderkey % 100)", "min(o_custkey)",
           "max(o_custkey)", "avg(o_custkey)"]
POS_FNS = ["first_value(o_custkey)", "last_value(o_custkey)"]
RANK_FNS = ["row_number()", "rank()", "dense_rank()",
            "lag(o_custkey, 1)", "lead(o_custkey, 1)"]
FRAMES_ROWS_NOOFF = [f for f in FRAMES_ROWS
                     if not any(c.isdigit() for c in f)]


def win_expr(fn, over):
    # avg divides exact integer sums but the DOUBLE quotient still gets
    # rounded outside the window (both engines compute the same division)
    if fn.startswith("avg("):
        return f"round({fn} OVER ({over}), 6)"
    return f"{fn} OVER ({over})"


for i in range(50):
    kind = rng.choice(["agg_rows", "agg_rows", "pos_rows", "rank",
                       "agg_range"])
    part = "PARTITION BY o_orderstatus"
    if kind == "agg_rows":
        fn = rng.choice(AGG_FNS)
        exc = rng.choice(EXCLUDES)
        # min/max cannot ride the ROWS-offset difference path for
        # GROUP/TIES (documented loud pass-through) — keep those on
        # non-offset frames
        frames = (FRAMES_ROWS_NOOFF
                  if ("GROUP" in exc or "TIES" in exc) and
                  (fn.startswith("min") or fn.startswith("max"))
                  else FRAMES_ROWS)
        over = (f"{part} ORDER BY o_totalprice, o_orderkey "
                f"{rng.choice(frames)}{exc}")
    elif kind == "pos_rows":
        fn = rng.choice(POS_FNS)
        over = (f"{part} ORDER BY o_totalprice, o_orderkey "
                f"{rng.choice(FRAMES_ROWS)}"
                f"{rng.choice(['', ' EXCLUDE CURRENT ROW', ' EXCLUDE NO OTHERS'])}")
    elif kind == "rank":
        fn = rng.choice(RANK_FNS)
        over = f"{part} ORDER BY o_totalprice, o_orderkey"
    else:  # agg_range — single numeric order key, repeats are real peers
        off = rng.random() < 0.5
        frame = rng.choice(FRAMES_RANGE_OFF if off else FRAMES_RANGE_NOOFF)
        fn = rng.choice(["count(*)", "sum(o_orderkey % 100)",
                         "avg(o_orderkey % 100)"] +
                        ([] if off else ["min(o_orderkey)", "max(o_orderkey)"]))
        over = f"{part} ORDER BY o_custkey % 50 {frame}{rng.choice(EXCLUDES)}"
    pred = rng.choice(ORD_PRED)
    q(f"SELECT o_orderkey, {win_expr(fn, over)} AS w "
      f"FROM orders WHERE {pred} AND o_orderkey % 7 = 2")

# two windows in one select + expression over a window
for i in range(10):
    pred = rng.choice(ORD_PRED)
    q(f"SELECT o_orderkey, "
      f"sum(o_orderkey % 100) OVER (PARTITION BY o_orderstatus ORDER BY "
      f"o_totalprice, o_orderkey ROWS BETWEEN 3 PRECEDING AND CURRENT ROW"
      f"{rng.choice(EXCLUDES)}) AS s, "
      f"rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, "
      f"o_orderkey) AS r "
      f"FROM orders WHERE {pred} AND o_orderkey % 13 = 5")

# ---------------------------------------------------------- 3. QUALIFY
for i in range(18):
    k = rng.randint(1, 4)
    fn = rng.choice(["row_number()", "rank()", "dense_rank()"])
    part = rng.choice(["l_returnflag", "l_linestatus",
                       "l_returnflag, l_linestatus"])
    pred = rng.choice(LI_PRED)
    q(f"SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem "
      f"WHERE {pred} QUALIFY {fn} OVER (PARTITION BY {part} "
      f"ORDER BY l_quantity DESC, l_orderkey, l_linenumber) <= {k}")
for i in range(6):
    q(f"SELECT o_custkey, o_orderkey, o_totalprice FROM orders "
      f"WHERE {rng.choice(ORD_PRED)} "
      f"QUALIFY o_totalprice = max(o_totalprice) OVER (PARTITION BY o_custkey)")

# ------------------------------------------------------- 4. set operations
SETOP_COLS = ["l_returnflag", "l_linestatus", "l_linenumber"]
for i in range(24):
    op = rng.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"])
    cols = ", ".join(rng.sample(SETOP_COLS, rng.randint(1, 2)))
    p1, p2 = rng.sample(LI_PRED, 2)
    q(f"SELECT {cols} FROM lineitem WHERE {p1} {op} "
      f"SELECT {cols} FROM lineitem WHERE {p2}")
for i in range(8):
    op = rng.choice(["UNION", "INTERSECT", "EXCEPT"])
    q(f"SELECT n_regionkey AS k FROM nation WHERE n_nationkey % 2 = {i % 2} "
      f"{op} SELECT r_regionkey AS k FROM region WHERE r_regionkey < {2 + i % 3}")

# ------------------------------------------------- 5. ordered aggregates
for i in range(16):
    dirn = rng.choice(["ASC", "DESC"])
    sep = rng.choice(["','", "'-'", "'|'"])
    g = rng.choice(["n_regionkey", "n_name IS NOT NULL"])
    q(f"SELECT n_regionkey, string_agg(n_name, {sep} ORDER BY n_name {dirn}) "
      f"AS names FROM nation GROUP BY n_regionkey")
    break
for i in range(14):
    dirn = rng.choice(["ASC", "DESC"])
    src, key, val, grp = rng.choice([
        ("nation", "n_name", "n_name", "n_regionkey"),
        ("region", "r_name", "r_name", "r_regionkey % 2"),
        ("supplier", "s_name", "s_name", "s_nationkey"),
    ])
    agg = rng.choice([
        f"string_agg({val}, ',' ORDER BY {key} {dirn})",
        f"array_agg({val} ORDER BY {key} {dirn})",
        f"first({val} ORDER BY {key} {dirn})",
        f"last({val} ORDER BY {key} {dirn})"])
    q(f"SELECT {grp} AS g, {agg} AS a FROM {src} GROUP BY {grp}")

# --------------------------------------------------------- 6. subqueries
for i in range(10):
    q(f"SELECT o_orderkey, o_totalprice FROM orders o WHERE "
      f"{rng.choice(ORD_PRED)} AND o_totalprice > (SELECT avg(o2.o_totalprice)"
      f" * {rng.choice(['1.5', '1.8', '2.0'])} FROM orders o2 "
      f"WHERE o2.o_custkey = o.o_custkey)")
for i in range(8):
    q(f"SELECT c_custkey, c_acctbal FROM customer WHERE "
      f"{rng.choice(CUST_PRED)} AND c_custkey IN (SELECT o_custkey FROM "
      f"orders WHERE {rng.choice(ORD_PRED)} AND o_orderkey % {3 + i} = 1)")
for i in range(8):
    kind = "EXISTS" if i % 2 == 0 else "NOT EXISTS"
    q(f"SELECT s_suppkey, s_name FROM supplier s WHERE {kind} "
      f"(SELECT 1 FROM lineitem WHERE l_suppkey = s.s_suppkey AND "
      f"{rng.choice(LI_PRED)})")

# ------------------------------------------- 7. ORDER BY + LIMIT (top-k)
for i in range(12):
    k = rng.choice([5, 10, 25])
    dirn = rng.choice(["ASC", "DESC"])
    q(f"SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem "
      f"WHERE {rng.choice(LI_PRED)} "
      f"ORDER BY l_quantity {dirn}, l_orderkey, l_linenumber LIMIT {k}")

# --------------------------------- 8. expression salad over a join
for i in range(14):
    q(f"SELECT o_orderkey, CASE WHEN o_totalprice > 150000 THEN 'big' "
      f"WHEN o_totalprice > 50000 THEN 'mid' ELSE 'small' END AS bucket, "
      f"round(o_totalprice / {rng.choice([7, 13, 29])}, 3) AS slice, "
      f"extract(year FROM o_orderdate) AS yr, "
      f"substr(o_orderpriority, 1, 1) AS pr "
      f"FROM orders WHERE {rng.choice(ORD_PRED)} AND o_orderkey % 17 = {i % 6}")

# GROUP BY ALL / ORDER BY ALL sugar composition
for i in range(8):
    q(f"SELECT l_returnflag, l_linestatus, count(*) AS c, "
      f"sum(l_quantity) AS s FROM lineitem WHERE {rng.choice(LI_PRED)} "
      f"GROUP BY ALL")

# distinct + scalar fns
for i in range(8):
    q(f"SELECT DISTINCT upper(l_returnflag) AS f, l_linenumber % 3 AS m "
      f"FROM lineitem WHERE {rng.choice(LI_PRED)}")

# ---------------------------------------------------- wave 2 (round 15)
# CTE chains, ROLLUP/CUBE/GROUPING SETS, ASOF joins, DISTINCT ON,
# FROM-first + GROUP BY ALL + star-EXCLUDE sugar, list comprehensions,
# string-function salads — the dialect rewriters composed inside full
# queries rather than probed one feature at a time.

# CTE chains (a reused CTE must evaluate consistently at both use sites)
BASE_PRED = ["l_quantity BETWEEN 5 AND 20", "l_linenumber <= 3",
             "l_orderkey % 3 = 1", "l_quantity > 30"]
for i in range(10):
    p1 = rng.choice(LI_PRED)
    p2 = rng.choice(BASE_PRED)  # must resolve against base's projection
    q(f"WITH base AS (SELECT l_orderkey, l_linenumber, l_quantity, "
      f"l_returnflag FROM lineitem WHERE {p1}), "
      f"agg AS (SELECT l_returnflag, sum(l_quantity) AS sq, count(*) AS c "
      f"FROM base GROUP BY l_returnflag) "
      f"SELECT b.l_returnflag, a.sq, a.c, count(*) AS n FROM base b "
      f"JOIN agg a ON b.l_returnflag = a.l_returnflag WHERE {p2} "
      f"GROUP BY b.l_returnflag, a.sq, a.c")

# ROLLUP / CUBE / GROUPING SETS (exact aggregates only)
for i in range(14):
    kind = rng.choice([
        "ROLLUP(l_returnflag, l_linestatus)",
        "CUBE(l_returnflag, l_linestatus)",
        "GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus), ())"])
    q(f"SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sq, "
      f"count(*) AS c FROM lineitem WHERE {rng.choice(LI_PRED)} "
      f"GROUP BY {kind}")

# ASOF JOIN — the right side is pre-aggregated to a UNIQUE (key, time)
# frame so the picked row is deterministic on both engines
for i in range(10):
    op = rng.choice([">=", ">"])
    left_pred = rng.choice(ORD_PRED)
    q(f"WITH r AS (SELECT o_custkey AS ck, o_orderdate AS d, "
      f"round(max(o_totalprice), 3) AS mp FROM orders GROUP BY 1, 2) "
      f"SELECT o.o_orderkey, r.mp FROM orders o ASOF JOIN r "
      f"ON o.o_custkey = r.ck AND o.o_orderdate {op} r.d "
      f"WHERE {left_pred} AND o.o_orderkey % 9 = {i % 5}")

# DISTINCT ON with a total order
for i in range(8):
    q(f"SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey, o_totalprice "
      f"FROM orders WHERE {rng.choice(ORD_PRED)} "
      f"ORDER BY o_custkey, o_totalprice DESC, o_orderkey")

# FROM-first + GROUP BY ALL + star-EXCLUDE sugar
for i in range(6):
    q(f"FROM orders SELECT o_orderstatus, count(*) AS c, "
      f"round(sum(o_totalprice), 3) AS s WHERE {rng.choice(ORD_PRED)} "
      f"GROUP BY ALL")
for i in range(6):
    q(f"SELECT * EXCLUDE (o_orderdate, o_orderpriority) FROM orders "
      f"WHERE {rng.choice(ORD_PRED)} AND o_orderkey % 101 = {i}")

# list comprehensions / list lambdas over tokenized documents
for i in range(8):
    inner = rng.choice([
        "[length(t) FOR t IN regexp_split_to_array(trim(text), '\\s+') IF length(t) > 4]",
        "list_transform(regexp_split_to_array(trim(text), '\\s+'), t -> length(t))",
        "list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> length(t) > 6)"])
    q(f"SELECT doc_id, len({inner}) AS n FROM documents "
      f"WHERE doc_id % 17 = {i % 9}")

# string-function salads with grouping
for i in range(10):
    fn = rng.choice([
        "upper(substr(trim(text), 1, 3))",
        "split_part(trim(text), ' ', 2)",
        "left(trim(text), 4)", "right(trim(text), 4)",
        "regexp_extract(text, '([a-z]+)', 1)"])
    q(f"SELECT {fn} AS k, count(*) AS c, sum(n_chars) AS s FROM documents "
      f"WHERE doc_id % 5 = {i % 5} GROUP BY 1")

# windows + correlated subquery composed
for i in range(6):
    q(f"SELECT o_orderkey, o_custkey, "
      f"rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, "
      f"o_orderkey) AS r FROM orders o WHERE {rng.choice(ORD_PRED)} AND "
      f"EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o.o_orderkey AND "
      f"{rng.choice(LI_PRED)}) QUALIFY r <= 2")

# HAVING with a scalar subquery
for i in range(6):
    q(f"SELECT l_returnflag, sum(l_quantity) AS sq FROM lineitem "
      f"WHERE {rng.choice(LI_PRED)} GROUP BY l_returnflag "
      f"HAVING sum(l_quantity) > (SELECT avg(l_quantity) * "
      f"{rng.choice([10, 50, 200])} FROM lineitem)")

# ---------------------------------------------------- wave 3 (round 15)
# The round-15 interval surface inside FULL queries: multi-unit literal
# comparisons against timestamp differences, interval arithmetic in
# projections (components extracted — the engines' interval text
# renderings differ), and INTERVAL-bounded RANGE window frames.

IV_LITS = ["'3 months 10 days'", "'100 days'", "'1 month 2 days 12 hours'",
           "'90 days 36 hours'", "'2 months'", "'1 month 1 day'"]
for i in range(12):
    lit = rng.choice(IV_LITS)
    op = rng.choice(["<", "<=", ">", ">=", "="])
    q(f"SELECT o_orderkey FROM orders WHERE (CAST(o_orderdate AS TIMESTAMP)"
      f" - TIMESTAMP '1995-06-01 00:00:00') {op} INTERVAL {lit} "
      f"AND o_orderkey % 19 = {i % 7}")

for i in range(10):
    lit = rng.choice(IV_LITS)
    q(f"SELECT o_orderkey, "
      f"CAST(o_orderdate AS TIMESTAMP) + INTERVAL {lit} AS plus_iv, "
      f"CAST(date_part('day', (CAST(o_orderdate AS TIMESTAMP) "
      f"- TIMESTAMP '1994-01-01 00:00:00') + INTERVAL {lit}) AS BIGINT) AS dd, "
      f"CAST(date_part('hour', (CAST(o_orderdate AS TIMESTAMP) "
      f"- TIMESTAMP '1994-01-01 00:00:00') + INTERVAL {lit}) AS BIGINT) AS dh "
      f"FROM orders WHERE o_orderkey % 23 = {i % 8}")

# INTERVAL-bounded RANGE frames over event time (value-bounded frames
# make the aggregate deterministic regardless of intra-peer order)
for i in range(10):
    span = rng.choice(["'1 day'", "'12 hours'", "'3 days'"])
    agg = rng.choice(["count(*)", "sum(event_id % 100)",
                      "min(event_id)", "max(event_id)"])
    q(f"SELECT event_id, {agg} OVER (PARTITION BY event_type ORDER BY ts "
      f"RANGE BETWEEN INTERVAL {span} PRECEDING AND CURRENT ROW) AS w "
      f"FROM events WHERE event_id % 29 = {i % 9}")

# GROUP BY on an interval-derived bucket
for i in range(6):
    q(f"SELECT CAST(date_part('month', CAST(o_orderdate AS TIMESTAMP) "
      f"- TIMESTAMP '1993-01-01 00:00:00') AS BIGINT) AS m, count(*) AS c, "
      f"sum(o_orderkey % 50) AS s FROM orders "
      f"WHERE {rng.choice(ORD_PRED)} GROUP BY 1")

# ---------------------------------------------------- wave 4 (round 16)
# Multi-feature STITCH interaction: every in-round catch of rounds 14-15
# (interval comparator, stacked-stitch bail, extension rule placement)
# was an interaction bug, so this wave stacks the rewriters — quantile
# window stitches × frame-EXCLUDE × QUALIFY × set ops × CTE chains ×
# PIVOT × list comprehensions × interval frames — in single statements.

# (a) two quantile windows + an EXCLUDE window in ONE select (the
# literal r15 verdict shape): whole-partition stitch + running histogram
# + WindowExclude all rewriting the same statement
QUANT_WINS = [
    "median(o_custkey) OVER (PARTITION BY o_orderstatus)",
    "quantile_disc(o_custkey, 0.5) OVER (PARTITION BY o_orderstatus)",
    "quantile_disc(o_totalprice, 0.25) OVER (PARTITION BY o_orderstatus "
    "ORDER BY o_totalprice, o_orderkey)",
    "quantile_cont(o_custkey, 0.75) OVER (PARTITION BY o_orderstatus "
    "ORDER BY o_orderdate)",
    "median(o_orderstatus) OVER (ORDER BY o_orderdate)",
    "entropy(o_orderstatus) OVER (PARTITION BY o_orderpriority "
    "ORDER BY o_orderdate)",
]
EXC_WINS = [
    "sum(o_orderkey % 100) OVER (PARTITION BY o_orderstatus ORDER BY "
    "o_totalprice, o_orderkey ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING "
    "EXCLUDE CURRENT ROW)",
    "count(*) OVER (PARTITION BY o_orderstatus ORDER BY o_custkey % 50 "
    "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE GROUP)",
    "avg(o_orderkey % 100) OVER (PARTITION BY o_orderstatus ORDER BY "
    "o_custkey % 50 RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING "
    "EXCLUDE CURRENT ROW)",
    "sum(o_orderkey % 100) OVER (PARTITION BY o_orderstatus ORDER BY "
    "o_custkey % 50 RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING "
    "EXCLUDE TIES)",
]
for i in range(16):
    qw1, qw2 = rng.sample(QUANT_WINS, 2)
    ew = rng.choice(EXC_WINS)
    def rq(e):
        return (f"round({e}, 3)"
                if e.startswith(("entropy", "quantile_cont", "avg")) or
                e.startswith("median(o_custkey") else e)
    ew_r = f"round({ew}, 3)" if ew.startswith("avg") else ew
    q(f"SELECT o_orderkey, {rq(qw1)} AS w1, {rq(qw2)} AS w2, {ew_r} AS w3 "
      f"FROM orders WHERE {rng.choice(ORD_PRED)} AND o_orderkey % 11 = {i % 6}")

# (b) QUALIFY over a stitched quantile window (QUALIFY rewriter feeds the
# stitch's helper columns through its subquery wrap)
for i in range(10):
    qw = rng.choice(QUANT_WINS[:4])
    op = rng.choice(["<=", ">", ">="])
    q(f"SELECT o_orderkey, o_custkey FROM orders "
      f"WHERE o_orderkey % 13 = {i % 5} "
      f"QUALIFY {qw} {op} o_custkey")

# (c) grouped EXCLUDE windows inside set-operation branches (each branch
# rewritten independently, then SetOpsByName aligns)
for i in range(12):
    ew1, ew2 = rng.sample(EXC_WINS, 2)
    setop = rng.choice(["UNION ALL", "UNION", "INTERSECT", "EXCEPT"])
    e1 = f"round({ew1}, 3)" if ew1.startswith("avg") else ew1
    e2 = f"round({ew2}, 3)" if ew2.startswith("avg") else ew2
    q(f"SELECT o_orderkey, {e1} AS w FROM orders WHERE o_orderkey % 4 = {i % 2} "
      f"{setop} "
      f"SELECT o_orderkey, {e2} AS w FROM orders WHERE o_orderkey % 4 <= 1")

# (d) interval-bounded RANGE frames × EXCLUDE over event time
for i in range(10):
    span = rng.choice(["'1 day'", "'12 hours'", "'2 days'"])
    exc = rng.choice([" EXCLUDE CURRENT ROW", " EXCLUDE GROUP",
                      " EXCLUDE TIES"])
    agg = rng.choice(["count(*)", "sum(event_id % 100)",
                      "avg(event_id % 100)"])
    expr_ = (f"{agg} OVER (PARTITION BY event_type ORDER BY ts "
             f"RANGE BETWEEN INTERVAL {span} PRECEDING AND CURRENT ROW{exc})")
    if agg.startswith("avg"):
        expr_ = f"round({expr_}, 3)"
    q(f"SELECT event_id, {expr_} AS w "
      f"FROM events WHERE event_id % 31 = {i % 9}")

# (e) the round-16 fixed frame: [CURRENT ROW, UNBOUNDED FOLLOWING] with
# every EXCLUDE mode over sum/count/avg (the silent partition−self bug)
for i in range(9):
    agg = ["sum(o_orderkey % 100)", "count(o_custkey)",
           "avg(o_orderkey % 100)"][i % 3]
    exc = [" EXCLUDE CURRENT ROW", " EXCLUDE GROUP", " EXCLUDE TIES"][i // 3]
    expr_ = (f"{agg} OVER (PARTITION BY o_orderstatus ORDER BY o_custkey % 50 "
             f"RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING{exc})")
    if agg.startswith("avg"):
        expr_ = f"round({expr_}, 3)"
    q(f"SELECT o_orderkey, {expr_} AS w FROM orders "
      f"WHERE o_orderkey % 9 = {i % 4}")

# (f) interval ORDER BY + LIMIT on the ts-difference subdomain, where
# duck's raw-triple sort ≡ total-micros order (the q133 contract)
for i in range(8):
    anchor = rng.choice(["'1995-06-01 12:00:00'", "'1994-01-01 00:00:00'",
                         "'1997-03-15 06:30:00'"])
    d = rng.choice(["ASC", "DESC"])
    q(f"SELECT o_orderkey FROM orders WHERE o_orderkey % 5 = {i % 4} "
      f"ORDER BY (CAST(o_orderdate AS TIMESTAMP) - TIMESTAMP {anchor}) {d}, "
      f"o_orderkey LIMIT 40")

# (g) CTE chains where one stage computes EXCLUDE windows and the next
# takes quantile windows (or GROUP-BY quantiles) over the result
for i in range(10):
    ew = rng.choice(EXC_WINS)
    e = f"round({ew}, 3)" if ew.startswith("avg") else ew
    stat = rng.choice(["median(w)", "quantile_disc(w, 0.5)",
                       "quantile_cont(w, 0.25)", "entropy(w % 10)"])
    q(f"WITH base AS (SELECT o_orderkey, o_orderstatus, {e} AS w "
      f"FROM orders WHERE o_orderkey % 6 = {i % 3}) "
      f"SELECT o_orderstatus, round({stat}, 3) AS s, count(*) AS c "
      f"FROM base GROUP BY o_orderstatus")

# (h) PIVOT over a window-derived frame and list comprehensions over
# split() arrays composed with lambdas (text-layer rewriters stacked)
for i in range(6):
    q(f"PIVOT (SELECT o_orderpriority, o_orderstatus, o_orderkey % 100 "
      f"AS v FROM orders WHERE o_orderkey % 7 = {i % 4}) "
      f"ON o_orderstatus USING sum(v) GROUP BY o_orderpriority")
for i in range(6):
    q(f"SELECT doc_id, [upper(x) FOR x IN string_split(lower(trim(text)), "
      f"' ') IF length(x) > {3 + i % 3}][1] AS first_long, "
      f"len([x FOR x IN string_split(lower(trim(text)), ' ') "
      f"IF length(x) > {3 + i % 3}]) AS n_long "
      f"FROM documents WHERE doc_id % 17 = {i % 8}")

# (i) IGNORE NULLS positionals × frame EXCLUDE (round-16 rewrite: the
# two-half coalesce; r15 rejected these loudly)
for i in range(10):
    fn = ["first_value", "last_value"][i % 2]
    frame = rng.choice(["ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING",
                        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
                        "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING",
                        "ROWS BETWEEN 3 PRECEDING AND 1 FOLLOWING"])
    exc = rng.choice([" EXCLUDE CURRENT ROW", " EXCLUDE NO OTHERS"])
    q(f"SELECT event_id, {fn}(CASE WHEN event_id % 4 = 0 THEN NULL "
      f"ELSE event_id % 97 END IGNORE NULLS) "
      f"OVER (PARTITION BY event_type ORDER BY ts, event_id {frame}{exc}) AS w "
      f"FROM events WHERE event_id % 3 = {i % 3}")

# ------------------------------------------------------------ evaluate
out_path = os.path.join(os.path.dirname(__file__),
                        "..", "src", "test", "resources", "query_fuzz.tsv")
os.makedirs(os.path.dirname(out_path), exist_ok=True)
rows_out, failed = [], []
for idx, sql in enumerate(QUERIES):
    name = f"fz{idx:03d}"
    try:
        rows = con.sql(sql).fetchall()
        rows_out.append((name, sql, len(rows), digest(rows)))
    except Exception as e:
        failed.append((name, sql, str(e).split("\n")[0][:110]))
        con = duckdb.connect()
        for t in ["region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents"]:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
with open(out_path, "w") as f:
    f.write("# name\tsql\tnrows\tmd5 — generated by scripts/query_fuzz.py "
            "(seed 15) against duckdb %s on sf0.001\n" % duckdb.__version__)
    for name, sql, n, h in rows_out:
        assert "\t" not in sql
        f.write(f"{name}\t{sql}\t{n}\t{h}\n")
print(f"{len(rows_out)} fuzz queries written to {out_path}; "
      f"{len(failed)} failed in duckdb")
for name, sql, e in failed:
    print("  failed:", name, sql[:80], "→", e)
