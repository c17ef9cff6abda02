#!/usr/bin/env python3
"""Assemble BENCH_DUCK_r14_sf10.json from the round-14 sweep pieces:

  - BENCH_DUCK_r14_sf10_heavyp.json  (p01-p19, earlier clean window)
  - the salvaged run-A measurements   (micro + p20-p23, pre-cap run)
  - /tmp/duck_runC.json               (the capped remainder)

Queries the cap interrupted carry -2.0 and are listed in "timeouts" —
the suite total EXCLUDES them (a DNF is a lower bound, not a sample).
"""
import json, sys

heavyp = json.load(open("BENCH_DUCK_r14_sf10_heavyp.json"))
salvage = json.load(open("/tmp/duck_runA_salvage.json"))
runc = json.load(open("/tmp/duck_runC.json"))

queries = {}
queries.update({k: v for k, v in heavyp["queries"].items()})
queries.update(salvage)
queries.update(runc["queries"])

timeouts = dict(runc.get("timeouts", {}))
total = sum(v for v in queries.values() if v is not None and v >= 0)
out = {
    "total": round(total, 3),
    "sf": "/tmp/sf10",
    "note": ("merged: heavyp window (p01-p19) + pre-cap run (micro, "
             "p20-p23; p20/p22 measured ~705 s under light repo "
             "co-tenancy, min-estimator) + capped run "
             "(DUCK_QUERY_CAP_S=900). -2.0 = DuckDB DNF within the "
             "900 s cap; excluded from the total."),
    "queries": {k: (round(v, 4) if v is not None else None)
                for k, v in sorted(queries.items())},
}
if timeouts:
    out["timeouts"] = timeouts
json.dump(out, open("BENCH_DUCK_r14_sf10.json", "w"))
n_ok = sum(1 for v in queries.values() if v is not None and v >= 0)
n_dnf = sum(1 for v in queries.values() if v == -2.0)
n_err = sum(1 for v in queries.values() if v == -1.0)
print(f"{len(queries)} queries: {n_ok} measured ({total:.1f}s), "
      f"{n_dnf} DNF@cap, {n_err} errors")
