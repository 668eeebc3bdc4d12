"""[EXT] Custom stateful streaming operator via applyInPandasWithState.

Per-user running event counts with explicit GroupState — the template
for stateful operators Spark lacks natively (custom sessionizers,
decaying counters, CDC reducers). State is a typed struct sharded by
the grouping key across the state store; at scale the key count, not
the event count, bounds memory.

The fixture is one parquet file -> the file source delivers exactly one
micro-batch, so update-mode output equals the final per-user counts and
the declared query is DuckDB-oracle-checkable (GROUP BY user_id).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .events import _event_stream


def _count_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: Any
) -> Iterator[pd.DataFrame]:
    n = state.get[0] if state.exists else 0
    for pdf in pdfs:
        n += len(pdf)
    state.update((n,))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})


def run_stream_stateful_counts(
    spark: SparkSession, sf_dir: str, name: str = "stream_stateful"
) -> DataFrame:
    stream = _event_stream(spark, sf_dir)
    counted = stream.groupBy("user_id").applyInPandasWithState(
        _count_fn,
        outputStructType="user_id bigint, n_events bigint",
        stateStructType="n bigint",
        outputMode="update",
        timeoutConf="NoTimeout",
    )
    q = (
        counted.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


ORACLE_STATEFUL_COUNTS = """
stateful_counts AS (
  SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id
)
"""
