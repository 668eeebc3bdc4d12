"""Build EVERY declared query's physical plan (no execution beyond
the few bounded driver-side collects some operators perform) and run
``profiling.plan_lint`` over each — the per-round plan-shape board
the judge reads as PLANBOARD_r{N}.json.

Usage: python scripts/planboard.py [out.json] [sf_dir]
       python scripts/planboard.py --diff OLD.json NEW.json

Each entry: {query: {rules: {rule: n_hits}, global_windows: N,
shuffles: N, err: ...}}; the summary line totals rule hits so a
round-over-round diff shows shuffle/plan regressions immediately.
"""
import json
import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession

import __spark_entry__ as e
from big_data_instacart_market_basket_analysis_spark.operators import (
    profiling as P,
)

def _diff(old_path: str, new_path: str) -> None:
    """Per-query plan-shape deltas between two boards: shuffle-count
    and global-window changes, plus added/removed queries — the
    one-command round-over-round regression readout."""
    old = json.load(open(old_path))["plans"]
    new = json.load(open(new_path))["plans"]
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    moved = []
    for name in sorted(set(old) & set(new)):
        o, n = old[name], new[name]
        if "err" in o or "err" in n:
            if o.get("err") != n.get("err"):
                moved.append((name, "err", o.get("err"), n.get("err")))
            continue
        for k in ("shuffles", "global_windows"):
            if o.get(k) != n.get(k):
                moved.append((name, k, o.get(k), n.get(k)))
    print(f"added {len(added)}: {added}")
    print(f"removed {len(removed)}: {removed}")
    if not moved:
        print("no plan-shape deltas on shared queries")
    for name, k, ov, nv in moved:
        print(f"  {name}: {k} {ov} -> {nv}")


if len(sys.argv) > 1 and sys.argv[1] == "--diff":
    _diff(sys.argv[2], sys.argv[3])
    sys.exit(0)

out_path = sys.argv[1] if len(sys.argv) > 1 else "PLANBOARD.json"
sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"
)
master = "local[%s]" % os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = (
    SparkSession.builder.master(master)
    .appName("planboard")
    .config("spark.sql.shuffle.partitions", "32")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

board = {}
totals = {}
t0 = time.time()
qs = e.queries()
for i, (name, fn) in enumerate(sorted(qs.items())):
    t = time.time()
    try:
        df = fn(spark, sf_dir)
        findings = P.plan_lint(df, name)
        rules = {
            f["rule"]: f["n_hits"]
            for f in findings
            if f["rule"] not in ("shuffle-count", "global-window")
        }
        gw = next(
            (f["n_hits"] for f in findings if f["rule"] == "global-window"),
            0,
        )
        sh = next(
            (f["n_hits"] for f in findings if f["rule"] == "shuffle-count"),
            0,
        )
        board[name] = {
            "rules": rules,
            "global_windows": gw,
            "shuffles": sh,
            "plan_secs": round(time.time() - t, 2),
        }
        for r, n in rules.items():
            totals[r] = totals.get(r, 0) + n
        totals["global-window"] = totals.get("global-window", 0) + gw
        totals["shuffles"] = totals.get("shuffles", 0) + sh
    except Exception as ex:  # board must be complete even on failure
        board[name] = {"err": f"{type(ex).__name__}: {ex}"[:300]}
        totals["err"] = totals.get("err", 0) + 1
    if (i + 1) % 50 == 0:
        print(f"... {i + 1}/{len(qs)} plans", flush=True)

summary = {
    "n_queries": len(qs),
    "totals": totals,
    "sf_dir": sf_dir,
    "wall_secs": round(time.time() - t0, 1),
}
with open(out_path, "w") as fh:
    json.dump({"summary": summary, "plans": board}, fh, indent=1, sort_keys=True)
print(json.dumps(summary))
offenders = {
    n: b["global_windows"]
    for n, b in board.items()
    if b.get("global_windows")
}
print("global-window offenders:", json.dumps(offenders, sort_keys=True))
