"""ORC ingest path (S1-family, sixth input format).

Unlike the XML path (which must integer-encode doubles to survive
decimal-string serialization), ORC is a typed columnar format: the
round trip carries timestamps, doubles, and strings at full fidelity,
so the contract is the strongest of the ingest family — events
round-tripped through a distributed ORC write and re-read with the
PINNED schema must hash-equal the parquet-derived table COLUMN FOR
COLUMN, no encoding transform at all. (Schema-driven read for the same
reason as XML/CSV: inference costs an extra scan.)

Scale: ORC writes are per-partition and splittable on read — the same
ingestion geometry as parquet; at 100 TB this path is how an
ORC-standardized lake (Hive/Trino estates) feeds the engine without a
conversion hop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .loaders import load_table

_ROUNDTRIP_CACHE: dict[tuple[int, str], DataFrame] = {}

_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def events_orc_roundtrip(
    spark: SparkSession,
    sf_dir: str,
    tmp_base: str = "/tmp/spark_graft_orc",
) -> DataFrame:
    key = (id(spark), sf_dir)
    if key in _ROUNDTRIP_CACHE:
        return _ROUNDTRIP_CACHE[key]
    events = load_table(spark, sf_dir, "events").select(*_COLS)
    path = f"{tmp_base}/{sf_dir.strip('/').replace('/', '_')}/events"
    events.write.mode("overwrite").orc(path)
    df = spark.read.schema(events.schema).orc(path).select(*_COLS)
    _ROUNDTRIP_CACHE[key] = df
    return df


ORACLE_EVENTS_ORC_ROUNDTRIP = """
events_orc_roundtrip AS (
  SELECT event_id, ts, user_id, event_type, value, props FROM events
)
"""
