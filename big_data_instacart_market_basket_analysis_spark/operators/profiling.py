"""[EXT] Data-quality profiling: per-column stats in one pass.

The first thing a pipeline does to an unfamiliar 100 TB table is
profile it: row count, per-column null counts, distinct cardinality,
min/max. This operator computes all of it in ONE aggregation over the
table (the multi-distinct plan Spark lowers to a single Expand +
hash-agg — one scan, no per-column jobs) and returns a long-format
DataFrame: one row per column.

Determinism: min/max are computed in the column's native type and cast
to string afterwards (so numeric columns get numeric min/max, not
lexicographic); all counters are integral. At 100 TB swap
``countDistinct`` for ``approx_count_distinct`` — exact distincts are
kept here because the DuckDB differential needs exact equality; the
plan shape is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: profiled columns of the documents fixture.
DOC_PROFILE_COLUMNS = ("doc_id", "lang", "n_chars", "source", "text")


def profile_documents(docs: DataFrame) -> DataFrame:
    """One row per column: nulls, distincts, min/max (stringified)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in DOC_PROFILE_COLUMNS:
        aggs += [
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = docs.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c in DOC_PROFILE_COLUMNS
    )
    return wide.select(
        "n_rows",
        F.expr(
            f"stack({len(DOC_PROFILE_COLUMNS)}, {stack_args})"
            " AS (col_name, n_nulls, n_distinct, min_val, max_val)"
        ),
    )


def oracle_profile_documents() -> str:
    branches = "\n  UNION ALL\n".join(
        f"""  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         '{c}' AS col_name,
         CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_nulls,
         CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
         CAST(min({c}) AS VARCHAR) AS min_val,
         CAST(max({c}) AS VARCHAR) AS max_val
  FROM documents"""
        for c in DOC_PROFILE_COLUMNS
    )
    return f"profile_documents AS (\n{branches}\n)"
