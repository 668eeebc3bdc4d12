"""[EXT] Data-layout operators: Z-order (Morton) clustering keys.

Multi-dimensional data skipping at 100 TB: sorting files by a Z-order
key over (user_id, time) makes min/max file statistics selective for
BOTH dimensions at once, so a `user_id = ? AND ts BETWEEN ?` scan
prunes most files — a plain sort on one column only prunes that
column. The key is a pure integer expression (bit interleave via
DIV/%/pow arithmetic, exact in doubles up to 2^31), identical in the
DuckDB oracle; the write path is `sortWithinPartitions(zkey)` ahead of
a parquet write, which costs a local sort and no extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: bits per dimension (16 -> 32-bit Morton key).
Z_BITS = 16
Z_MASK = (1 << Z_BITS) - 1


def _interleave_expr(x: str, y: str) -> str:
    """Morton interleave of two Z_BITS-wide nonneg ints: bit i of x
    lands at position 2i, bit i of y at 2i+1. pow(2,i)/pow(4,i) are
    exact powers of two in double, so the DIV/% arithmetic is integral
    end-to-end and engine-portable (no shift-operator dialect)."""
    return (
        f"CAST(aggregate(sequence(0, {Z_BITS - 1}), 0L, (acc, i) ->"
        f" acc + (({x} DIV CAST(pow(2, i) AS BIGINT)) % 2)"
        "        * CAST(pow(4, i) AS BIGINT)"
        f"     + (({y} DIV CAST(pow(2, i) AS BIGINT)) % 2)"
        "        * 2 * CAST(pow(4, i) AS BIGINT)) AS BIGINT)"
    )


def zorder_keys(events: DataFrame) -> DataFrame:
    """Z-order clustering key per event over (user_id, hour-of-epoch),
    both masked to 16 bits. Map-only — the key computation adds no
    shuffle; the layout win comes from sorting the write by it."""
    prepared = events.select(
        "event_id",
        (F.col("user_id") % (Z_MASK + 1)).alias("zx"),
        (
            F.floor(F.unix_millis("ts") / F.lit(3_600_000))
            % (Z_MASK + 1)
        ).alias("zy"),
    )
    return prepared.select(
        "event_id",
        "zx",
        "zy",
        F.expr(_interleave_expr("zx", "zy")).alias("zkey"),
    )


ORACLE_ZORDER_KEYS = f"""
zorder_base AS (
  SELECT event_id,
         user_id % {Z_MASK + 1} AS zx,
         CAST(floor(epoch_ms(ts) / 3600000) AS BIGINT)
           % {Z_MASK + 1} AS zy
  FROM events
),
zorder_keys AS (
  SELECT event_id, zx, zy,
         CAST(list_sum(list_transform(range(0, {Z_BITS}), i ->
           ((zx // CAST(pow(2, i) AS BIGINT)) % 2)
             * CAST(pow(4, i) AS BIGINT)
           + ((zy // CAST(pow(2, i) AS BIGINT)) % 2)
             * 2 * CAST(pow(4, i) AS BIGINT)
         )) AS BIGINT) AS zkey
  FROM zorder_base
)
"""


def write_zordered(events: DataFrame, path: str) -> None:
    """Cluster the physical layout: local sort by zkey inside each
    partition, then parquet. File-level min/max stats become selective
    on both interleaved dimensions; no global sort (and no extra
    shuffle) is required for the skipping win."""
    keyed = events.join(zorder_keys(events).select("event_id", "zkey"),
                        "event_id")
    keyed.sortWithinPartitions("zkey").write.mode("overwrite").parquet(
        path
    )
