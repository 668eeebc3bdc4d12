"""Parquet fixture loaders (S1 replacement).

One ``spark.read.parquet`` per table — columnar scan, predicate pushdown
and column pruning come free from the vectorized reader. At cluster scale
the same call reads a partitioned directory instead of a single file; no
code change needed.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def ensure_nanos_conf(spark: SparkSession) -> None:
    """Make TIMESTAMP(NANOS) parquet readable on *any* session.

    The events fixture carries INT64 TIMESTAMP(NANOS), which Spark's
    reader rejects unless ``spark.sql.legacy.parquet.nanosAsLong`` is
    set. Queries must be correct on whatever session is handed to them
    (the ``__spark_entry__`` contract), so set the conf at runtime here
    rather than relying on our own ``get_spark()`` builder defaults.
    """
    try:
        if spark.conf.get(NANOS_CONF, "false") != "true":
            spark.conf.set(NANOS_CONF, "true")
    except Exception:
        # Conf not recognized / not settable on this session: fall
        # through and let the read surface the real error.
        pass


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        ensure_nanos_conf(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # ts is TIMESTAMP(NANOS) in the fixture; Spark reads it as
        # epoch-nanos long (legacy.parquet.nanosAsLong) — truncate to
        # the engine's microsecond timestamps.
        from pyspark.sql import functions as F

        df = df.withColumn(
            "ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))")
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use.

    Per-table failure tolerance: one unreadable table must not take
    down queries that never touch it (round-1 lesson — the events
    nanos-timestamp read aborted unrelated ``sql_*`` queries). A table
    that fails to load is skipped; the query that actually needs it
    surfaces the real error at its own read.
    """
    errors: dict[str, Exception] = {}
    for name in TABLES:
        try:
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
        except Exception as exc:  # defer: only the dependent query fails
            errors[name] = exc
    if errors:
        import warnings

        warnings.warn(
            "register_views skipped unreadable tables: "
            + ", ".join(f"{n} ({type(e).__name__})" for n, e in errors.items())
        )
