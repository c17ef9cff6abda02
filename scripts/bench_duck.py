#!/usr/bin/env python3
"""Time the oracle SQLs in single-threaded DuckDB over a scale-factor
directory — the baseline proxy for the bench ratio (the reference is a
single-threaded wasm DuckDB; native DuckDB is ~2-3x faster than wasm, so
engine_time / duck_time / 2.5 approximates the true-baseline ratio).

Usage: bench_duck.py <sf_dir> <oracle_sql.json> [runs=3]
Prints one JSON line: {"total": sec, "queries": {name: sec}}.
"""
import duckdb, json, sys, time

sf_dir = sys.argv[1]
oracle = json.load(open(sys.argv[2]))
runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3

con = duckdb.connect(config={"threads": 1})
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    try:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    except Exception as e:
        print(f"[duck] no view {t}: {e}", file=sys.stderr)

# Untimed warm-up: pull every parquet file through the OS page cache so the
# first timed sample is not also the cold-I/O run (count(*) would only read
# row-group metadata). graft.Bench warms its join/window path the same way
# before its timed loop — symmetric estimators on both sides.
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    try:
        with open(f"{sf_dir}/{t}.parquet", "rb") as f:
            while f.read(1 << 24):
                pass
    except OSError:
        pass

out = {}
for name in sorted(oracle):
    times = []
    for i in range(runs):
        t0 = time.time()
        try:
            con.sql(oracle[name]).fetchall()  # materialize fully
            times.append(time.time() - t0)
        except Exception as e:
            times.append(-1.0)
            break
        # queries dominated by compute don't need repeat sampling — the
        # fixed-cost noise repeat runs guard against is negligible there
        if times[-1] > 10.0:
            break
    ok = [t for t in times if t >= 0]
    # min over runs, matching graft.Bench's sampling (co-tenant noise is
    # additive; same estimator on both sides keeps the ratio fair)
    out[name] = min(ok) if ok else -1.0
    print(f"[duck] {name}: {out[name]:.3f}s", file=sys.stderr, flush=True)
total = sum(v for v in out.values() if v >= 0)
print(json.dumps({"total": round(total, 3), "sf": sf_dir,
                  "queries": {k: round(v, 4) for k, v in out.items()}}))
