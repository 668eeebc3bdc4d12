"""Build a synthetic larger-scale fixture from sf0.1 for the
scale-proof tier (round-10 VERDICT item 7) — NOT part of the bench
contract and never read by bench.py/queries(); evidence-only.

Each big table is replicated K times with entity keys shifted by
i*OFFSET per copy, so FK joins stay linear (K disjoint subgraphs) and
the co-purchase graph becomes K disconnected components — the shape a
driver sees when data grows with constant key density. Dimension
lookups (nation/region/supplier) are left as-is and keys that
reference them are NOT shifted. Text/embeddings payloads are kept
verbatim (cross-copy exact duplicates; the scale queries chosen in
BENCH_SF1.json avoid the pair-forming dedup kernels whose workload
that would reshape).

Usage: python scripts/make_scale_fixture.py <src_sf_dir> <out_dir> [K]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

OFFSET = 10_000_000

#: per-table entity keys shifted per copy (dimension FKs untouched)
SHIFT = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey"],
    "part": ["p_partkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
    "nation": [],
    "region": [],
    "supplier": [],
}


def main() -> None:
    src, out = sys.argv[1], sys.argv[2]
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("make_scale_fixture")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)
    for name, keys in SHIFT.items():
        df = spark.read.parquet(f"{src}/{name}.parquet")
        if not keys or k == 1:
            copies = df
        else:
            parts = []
            for i in range(k):
                p = df
                for c in keys:
                    p = p.withColumn(c, F.col(c) + F.lit(i * OFFSET))
                parts.append(p)
            copies = parts[0]
            for p in parts[1:]:
                copies = copies.unionByName(p)
        # enough row groups that scans split at the HIGH core count —
        # 32 files per table so the 8-vs-32 ratio measures compute
        # scale-out, not input-split starvation
        copies.repartition(32).write.mode("overwrite").parquet(
            f"{out}/{name}.parquet"
        )
        print(name, "rows:", spark.read.parquet(f"{out}/{name}.parquet").count())
    spark.stop()


if __name__ == "__main__":
    main()
