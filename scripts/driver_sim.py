"""Driver simulation: run every declared query on a BARE SparkSession.

The grading driver supplies its own session (none of the engine's
``get_spark()`` confs), so declared queries must be correct on a stock
``SparkSession.builder.getOrCreate()``. This script replays the full
CORRECTNESS contract that way: every ``queries()`` entry at sf0.01,
value-hash-compared to ``oracle_sql()`` where declared, rows-only
otherwise.

Usage: python scripts/driver_sim.py [sf_dir] [out.json]

Writes the full per-query board to ``out.json`` (default
``DRIVERSIM.json`` at the repo root) — committed per round as
``DRIVERSIM_r{N}.json`` so the 310-query green status is in-repo
evidence, not just the driver's 50-query sample (round-2 verdict #2).
"""

from __future__ import annotations

import json
import sys
import time
import traceback

sys.path.insert(0, ".")

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as e  # noqa: E402
from tests.oracle_harness import compare  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "DRIVERSIM.json"
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("driver_sim")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    oracles = e.oracle_sql()
    results: dict[str, dict] = {}
    t_all = time.time()
    for name, fn in e.queries().items():
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if name in oracles:
                res = compare(df, oracles[name], sf_dir)
                ok = res["rows_match"] and res["schema_match"] and res["hash_match"]
                status = "HASH-OK" if ok else "MISMATCH"
                detail = "" if ok else json.dumps(
                    {k: res[k] for k in ("rows_spark", "rows_duckdb",
                                         "rows_match", "schema_match",
                                         "hash_match")}
                )
            else:
                n = df.count()
                status, detail = "ROWS-ONLY", f"rows={n}"
            results[name] = {"status": status, "detail": detail}
        except Exception:
            results[name] = {
                "status": "ERROR",
                "detail": traceback.format_exc(limit=3).splitlines()[-1],
            }
            status, detail = "ERROR", results[name]["detail"]
        results[name]["sec"] = round(time.time() - t0, 1)
        print(f"{name:28s} {status:9s} {time.time()-t0:6.1f}s {detail}",
              flush=True)

    bad = {n: r for n, r in results.items() if r["status"] in ("MISMATCH", "ERROR")}
    board = {
        "sf_dir": sf_dir,
        "total_sec": round(time.time() - t_all, 1),
        "n_queries": len(results),
        "n_oracle": sum(
            1 for r in results.values() if r["status"] in ("HASH-OK", "MISMATCH")
        ),
        "n_bad": len(bad),
        "bad": sorted(bad),
        "results": results,
    }
    # board-tail timing diff gate (r7 verdict task 1): every slow
    # board line — including the streaming queries the warm bench
    # loop cannot re-run — is diffed vs the last committed round's
    # board, with planboard adjudication (see bench.boardtail_diff).
    try:
        import bench

        board["tail_diff"] = bench.boardtail_diff(
            {q: r["sec"] for q, r in results.items()}
        )
    except Exception:
        board["tail_diff"] = {
            "gate": "UNKNOWN (boardtail_diff raised)",
            "err": traceback.format_exc(limit=2).splitlines()[-1],
        }
    with open(out_path, "w") as fh:
        json.dump(board, fh, indent=1, sort_keys=True)
    print(f"\ntotal {board['total_sec']:.0f}s; {len(results)} queries; "
          f"{len(bad)} bad: {sorted(bad)}; board -> {out_path}")
    print("tail_diff gate:", board["tail_diff"].get("gate"),
          "flagged:", sorted(board["tail_diff"].get("flagged", {})))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
