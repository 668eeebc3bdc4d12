"""SparkSession factory.

Defaults are tuned for the local[32] test harness but every knob is
cluster-safe: on a real deployment the same settings (AQE, skew-join
handling, broadcast threshold, shuffle partitions sized to the data)
are what you'd want at 100 TB — only the numbers change, via env vars
or ``extra_conf``.

Notable choices
---------------
- ``spark.sql.ansi.enabled=false``: the reference's arithmetic
  (F.py:72,106,151,157,159-160) relies on null-on-divide-by-zero, and the
  DuckDB oracles use ``NULLIF`` to match. ANSI mode (Spark 4 default)
  would raise instead.
- ``spark.sql.session.timeZone=UTC``: fixture timestamps are UTC-naive;
  DuckDB compares in UTC.
- shuffle partitions default to cpu count (local): 200 would
  over-parallelize tiny test data; a cluster run overrides via
  ``SPARK_GRAFT_SHUFFLE_PARTITIONS``.
- AQE with coalesce + skew-join: the candidate-expansion explode join
  (SURVEY.md §4 "Generate") is the row-amplifying operator at scale;
  AQE re-plans the post-explode shuffles at runtime.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _cpus() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(
    app_name: str = "big_data_instacart_market_basket_analysis_spark",
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession."""
    cpus = _cpus()
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    shuffle = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(cpus))
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", driver_mem)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # scan-split sizing: the lever that keeps per-task input within
        # executor memory at any SF (at 100 TB, smaller splits -> more,
        # cheaper tasks; AQE coalesces the resulting shuffles).
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "128m"),
        )
        # events fixture carries TIMESTAMP(NANOS) which Spark's reader
        # rejects; read as epoch-nanos long, converted in the loader.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
