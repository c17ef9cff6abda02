#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables, compare against the Spark result dumped
by graft.Verify (columns sorted by name, rows sorted, float-tolerant)."""
import duckdb, glob, json, math, os, sys

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
def norm(v):
    # Everything normalizes to str so mixed NULL/value columns still sort
    # (tuple sort compares positionally; a "nan" str vs float crashed).
    if isinstance(v, float):
        if math.isnan(v): return "nan"
        return str(round(v, 6))
    return str(v)

n_pass = n_fail = 0
for name in sorted(oracle):
    sql = oracle[name]
    spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not spark_files:
        print(f"FAIL {name}: no spark output"); n_fail += 1; continue
    try:
        odf = con.sql(sql).df()
        sdf = con.sql(f"SELECT * FROM read_parquet({spark_files!r})").df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); n_fail += 1; continue
    ocols, scols = sorted(odf.columns), sorted(sdf.columns)
    if ocols != scols:
        print(f"FAIL {name}: columns oracle={ocols} spark={scols}"); n_fail += 1; continue
    # The driver's hash is type-sensitive at the DECIMAL level (q45 round-1
    # lesson: value-equal sums, DECIMAL(25,2) vs DECIMAL(38,2), hash FAIL)
    # but tolerates int32-vs-int64 width differences (q07/q25/... were green
    # with exactly that skew). Compare DuckDB-inferred types with integer /
    # float widths normalized, keeping DECIMAL(p,s) exact.
    def duck_types(rel_sql):
        rows = con.sql(f"DESCRIBE ({rel_sql})").fetchall()
        out = {}
        for r in rows:
            t = r[1].upper()
            if t in ("TINYINT","SMALLINT","INTEGER","BIGINT","HUGEINT",
                     "UTINYINT","USMALLINT","UINTEGER","UBIGINT"): t = "INT"
            elif t in ("FLOAT","DOUBLE"): t = "FLOAT"
            out[r[0]] = t
        return out
    try:
        ot = duck_types(sql)
        st = duck_types(f"SELECT * FROM read_parquet({spark_files!r})")
    except Exception as e:
        print(f"FAIL {name}: describe: {e}"); n_fail += 1; continue
    bad = [(c, ot[c], st[c]) for c in ocols if ot.get(c) != st.get(c)]
    if bad:
        print(f"FAIL {name}: type mismatch {bad}"); n_fail += 1; continue
    if len(odf) != len(sdf):
        print(f"FAIL {name}: rows oracle={len(odf)} spark={len(sdf)}"); n_fail += 1; continue
    orows = sorted(tuple(norm(v) for v in r) for r in odf[ocols].itertuples(index=False))
    srows = sorted(tuple(norm(v) for v in r) for r in sdf[scols].itertuples(index=False))
    if orows != srows:
        diffs = [(a, b) for a, b in zip(orows, srows) if a != b][:3]
        print(f"FAIL {name}: value mismatch, first diffs: {diffs}"); n_fail += 1; continue
    print(f"PASS {name} ({len(odf)} rows)"); n_pass += 1
print(f"\n{n_pass} pass, {n_fail} fail; {len(oracle)} oracle queries")
sys.exit(1 if n_fail else 0)
