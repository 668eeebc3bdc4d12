"""Build EVERY declared query's physical plan (no execution beyond
the few bounded driver-side collects some operators perform) and run
``profiling.plan_lint`` over each — the per-round plan-shape board
the judge reads as PLANBOARD_r{N}.json.

Usage: python scripts/planboard.py [out.json] [sf_dir] [baseline.json]
       python scripts/planboard.py --diff OLD.json NEW.json

Each entry: {query: {rules: {rule: n_hits}, global_windows: N,
shuffles: N, err: ...}}.

ROUND-OVER-ROUND GATE (r5 verdict #2): the board embeds a ``diff``
section against the newest committed PLANBOARD_r*.json (or an
explicit baseline path) — per-query global-window and shuffle-count
deltas plus added/removed queries — and the run EXITS NONZERO on any
global_windows increase (the regression the full-board sweep exists
to prevent); shuffle jumps > +2 are flagged by name but do not fail
(a deliberate rank-kernel/bucketing conversion legitimately adds an
exchange — those are adjudicated in review, not auto-blocked).
"""
import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession

import __spark_entry__ as e
from big_data_instacart_market_basket_analysis_spark.operators import (
    profiling as P,
)

def _latest_board(exclude: str) -> str | None:
    """Newest committed PLANBOARD_r*.json by round number."""
    cands = []
    for p in glob.glob("PLANBOARD_r*.json"):
        if os.path.abspath(p) == os.path.abspath(exclude):
            continue
        m = re.search(r"PLANBOARD_r(\d+)\.json$", p)
        if m:
            cands.append((int(m.group(1)), p))
    return max(cands)[1] if cands else None


if len(sys.argv) > 1 and sys.argv[1] == "--diff":
    old = json.load(open(sys.argv[2]))["plans"]
    new = json.load(open(sys.argv[3]))["plans"]
    d = P.planboard_diff(old, new)
    print(json.dumps(d, indent=1, sort_keys=True))
    sys.exit(0 if d["gate"] == "PASS" else 1)

out_path = sys.argv[1] if len(sys.argv) > 1 else "PLANBOARD.json"
sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"
)
baseline = sys.argv[3] if len(sys.argv) > 3 else _latest_board(out_path)
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
doc = {"summary": summary, "plans": board}
if baseline and os.path.exists(baseline):
    diff = P.planboard_diff(json.load(open(baseline))["plans"], board)
    diff["baseline"] = baseline
    doc["diff"] = diff
    summary["gate"] = diff["gate"]
with open(out_path, "w") as fh:
    json.dump(doc, fh, indent=1, sort_keys=True)
print(json.dumps(summary))
offenders = {
    n: b["global_windows"]
    for n, b in board.items()
    if b.get("global_windows")
}
print("global-window offenders:", json.dumps(offenders, sort_keys=True))
if "diff" in doc:
    d = doc["diff"]
    print(
        "diff vs %s: gate=%s +%d/-%d queries, gw_up=%s, shuffle_jumps=%s"
        % (
            baseline,
            d["gate"],
            len(d["added"]),
            len(d["removed"]),
            json.dumps(d["global_window_increases"]),
            json.dumps(d["shuffle_jumps_flagged"]),
        )
    )
    if d["gate"] != "PASS":
        sys.exit(1)
