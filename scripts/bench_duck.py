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

# Optional per-query wall cap (seconds): a recursive-CTE oracle that is
# pathological for a single-threaded engine at sf10 must not stall the
# whole sweep. A capped query records -2.0 and lands in "timeouts" with
# the cap — the comparison then reports "duck DNF within cap" instead of
# a ratio (a LOWER bound on the duck time, never an inflated claim).
import os, threading
cap = float(os.environ.get("DUCK_QUERY_CAP_S", "0") or 0)

InterruptErr = getattr(duckdb, "InterruptException", None)


def is_interrupt(e):
    if InterruptErr is not None and isinstance(e, InterruptErr):
        return True
    return "interrupt" in str(e).lower()


out, timeouts = {}, {}
for name in sorted(oracle):
    times = []
    timed_out = False
    attempt = 0
    while attempt < runs:
        attempt += 1
        t0 = time.time()
        timer = None
        # DNF is classified by the INTERRUPT actually having fired for THIS
        # run (exception type + flag), never by elapsed-time proximity to
        # the cap — a genuine query error near the cap is an error, and a
        # timer that fires just as a run completes is detected as a leak
        # and the run retried, instead of mislabeling the next query.
        fired = threading.Event()
        active = threading.Event()
        active.set()

        def _interrupt(active=active, fired=fired):
            if active.is_set():
                fired.set()
                con.interrupt()

        if cap > 0:
            timer = threading.Timer(cap, _interrupt)
            timer.start()
        try:
            con.sql(oracle[name]).fetchall()  # materialize fully
            active.clear()
            times.append(time.time() - t0)
        except Exception as e:
            active.clear()
            if is_interrupt(e) and not fired.is_set() and (
                    cap <= 0 or time.time() - t0 < cap):
                # a previous run's late-firing interrupt leaked into this
                # execution — not this query's fault; retry the run
                print(f"[duck] {name}: leaked interrupt, retrying",
                      file=sys.stderr)
                continue
            if fired.is_set() or is_interrupt(e):
                timed_out = True
            else:
                print(f"[duck] {name} error: {e}", file=sys.stderr)
            times.append(-1.0)
            break
        finally:
            if timer is not None:
                timer.cancel()
        # queries dominated by compute don't need repeat sampling — the
        # fixed-cost noise repeat runs guard against is negligible there
        if times[-1] > 10.0:
            break
    ok = [t for t in times if t >= 0]
    # min over runs, matching graft.Bench's sampling (co-tenant noise is
    # additive; same estimator on both sides keeps the ratio fair)
    if timed_out and not ok:
        out[name] = -2.0
        timeouts[name] = cap
    else:
        out[name] = min(ok) if ok else -1.0
    print(f"[duck] {name}: {out[name]:.3f}s", file=sys.stderr, flush=True)
total = sum(v for v in out.values() if v >= 0)
res = {"total": round(total, 3), "sf": sf_dir,
       "queries": {k: round(v, 4) for k, v in out.items()}}
if timeouts:
    res["timeouts"] = timeouts
print(json.dumps(res))
