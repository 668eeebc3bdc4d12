"""[EXT] Custom Python DataSource (Spark 4 DataSource API): a
deterministic synthetic-documents generator.

The reference's only extensibility story is "edit the script"; Spark 4
lets an engine ship first-class pluggable sources. This one is a load
generator for corpus-pipeline testing: ``doc_id`` split into N input
partitions, each partition generating its slice independently — reads
scale linearly with parallelism and there is no driver-side
materialization. Rows are pure functions of ``doc_id`` (md5-derived
words), so the same table is replayable in any engine — the DuckDB
oracle regenerates it from ``range()`` and value-hash-compares.

Usage::

    spark.dataSource.register(SyntheticDocsDataSource)
    spark.read.format("synthetic_docs").option("n", 512).load()
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

#: defaults: corpus size and input-partition count.
SYNTH_DOCS_N = 512
SYNTH_DOCS_PARTITIONS = 8


class _Slice(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


def synth_words(doc_id: int) -> list[str]:
    """1 + doc_id % 8 words, each the first 6 hex chars of
    md5("{doc_id}-{i}") — deterministic and engine-replayable."""
    return [
        hashlib.md5(f"{doc_id}-{i}".encode()).hexdigest()[:6]
        for i in range(1 + doc_id % 8)
    ]


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n = int(options.get("n", SYNTH_DOCS_N))
        self.num_partitions = int(
            options.get("partitions", SYNTH_DOCS_PARTITIONS)
        )

    def partitions(self) -> list[InputPartition]:
        step = max(1, -(-self.n // self.num_partitions))
        return [
            _Slice(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: _Slice) -> Iterator[tuple]:
        for doc_id in range(partition.start, partition.end):
            yield (doc_id, " ".join(synth_words(doc_id)))


class SyntheticDocsStreamReader(SimpleDataSourceStreamReader):
    """Streaming form (SimpleDataSourceStreamReader): each micro-batch
    emits the next ``batch_size`` doc_ids. Offsets are plain dicts
    checkpointed by the engine — restart-safe, exactly-once delivery
    into the sink, same deterministic rows as the batch reader."""

    def __init__(self, options: dict) -> None:
        self.batch_size = int(options.get("batch_size", 64))
        self.n = int(options.get("n", SYNTH_DOCS_N))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        lo = start["next"]
        hi = min(lo + self.batch_size, self.n)
        rows = [
            (doc_id, " ".join(synth_words(doc_id)))
            for doc_id in range(lo, hi)
        ]
        return iter(rows), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            (doc_id, " ".join(synth_words(doc_id)))
            for doc_id in range(start["next"], end["next"])
        )

    def commit(self, end: dict) -> None:
        pass


class SyntheticDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id bigint, text string"

    def reader(self, schema) -> SyntheticDocsReader:
        return SyntheticDocsReader(self.options)

    def simpleStreamReader(self, schema) -> SyntheticDocsStreamReader:
        return SyntheticDocsStreamReader(self.options)


def register(spark) -> None:
    """Idempotently register the source on any session (driver
    contract: queries must work on a stock SparkSession)."""
    spark.dataSource.register(SyntheticDocsDataSource)


def synthetic_docs(spark, n: int = SYNTH_DOCS_N):
    register(spark)
    return (
        spark.read.format("synthetic_docs")
        .option("n", n)
        .option("partitions", SYNTH_DOCS_PARTITIONS)
        .load()
    )


ORACLE_SYNTHETIC_DOCS = f"""
synthetic_docs AS (
  SELECT doc_id,
         array_to_string(list_transform(range(0, 1 + doc_id % 8),
           i -> substr(md5(CAST(doc_id AS VARCHAR) || '-'
                           || CAST(i AS VARCHAR)), 1, 6)), ' ') AS text
  FROM range({SYNTH_DOCS_N}) t(doc_id)
)
"""
