"""[EXT] Arrow-batched GROUPED_AGG pandas UDF — the custom-aggregate
cell of the UDF surface matrix (scalar pandas UDF: similarity.
cosine_pandas_udf; UDTF: textstats.chunk_documents_udtf; mapInPandas:
multimodal; applyInPandasWithState / transformWithState: streaming).

The demo aggregate is deliberately one a native expression can also
compute, so the UDF path is hash-pinned against the engine's own
native twin AND the DuckDB oracle — proving the Arrow grouped-agg
transport is lossless, which is the property that matters before
putting a genuinely-custom reducer (a model update, an exotic sketch)
on this path. Per the repo design rules the native form is what the
hot path uses; this module exists to keep the custom-aggregate escape
hatch exercised and tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_agg_spend(events: DataFrame) -> DataFrame:
    """Per-type value stats where the mean comes from a GROUPED_AGG
    pandas UDF (Arrow-batched per-group reduction) next to the native
    aggregate — both rounded(6), required identical. Scale: grouped-
    agg UDFs get partial aggregation disabled (all group rows ship to
    one executor batch), so the native twin is the 100 TB path; the
    UDF path is for reducers SQL cannot express, on bounded groups.
    Output: event_type, n, mean_udf, mean_native.
    """
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # defined annotation-free: `from __future__ import annotations`
    # stringifies inline hints, which pandas_udf's signature inference
    # rejects (same workaround as similarity.cosine_pandas_udf)
    def _mean_impl(v):
        return float(v.sum() / v.count())

    _mean = pandas_udf("double", PandasUDFType.GROUPED_AGG)(_mean_impl)

    base = events.filter(F.col("value").isNotNull())
    # Spark forbids mixing grouped-agg pandas UDFs with native
    # aggregates in one agg() — compute the two paths separately and
    # join on the group key (both are |types|-row tables)
    udf_side = base.groupBy("event_type").agg(
        F.round(_mean("value"), 6).alias("mean_udf")
    )
    native = base.groupBy("event_type").agg(
        F.count("value").alias("n"),
        F.round(F.sum("value") / F.count("value"), 6).alias(
            "mean_native"
        ),
    )
    return native.join(udf_side, "event_type").select(
        "event_type", "n", "mean_udf", "mean_native"
    )


ORACLE_GROUPED_AGG = """
grouped_agg_spend AS (
  SELECT event_type, CAST(count(value) AS BIGINT) AS n,
         round(sum(value) / count(value), 6) AS mean_udf,
         round(sum(value) / count(value), 6) AS mean_native
  FROM events WHERE value IS NOT NULL
  GROUP BY 1
)
"""
