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
    if isinstance(v, float):
        if math.isnan(v): return "nan"
        return round(v, 6)
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
