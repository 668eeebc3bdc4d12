"""Observation metrics + Arrow-UDF parity checks.

``df.observe`` collects pipeline invariants during the job itself (no
second pass over the data — the metric rides the action), which is how
a 100 TB run self-reports row counts and quality tallies. The Arrow
test pins the Pandas-UDF cosine to the native Catalyst expression so a
custom Python scorer can be swapped into the ANN operators without a
correctness cliff.
"""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from big_data_instacart_market_basket_analysis_spark.operators import (
    similarity,
    textstats,
)
from tests.conftest import SF_ORACLE


def _docs(spark):
    return spark.read.parquet(f"{SF_ORACLE}/documents.parquet")


def _emb(spark):
    return spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")


def test_observe_collects_metrics_in_one_pass(spark):
    """Quality scoring with an attached Observation: the row count and
    below-threshold tally arrive with the action, no extra job."""
    obs = Observation("quality")
    scored = textstats.quality_scores(_docs(spark)).observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((F.col("quality_score") < 0.5).cast("bigint")).alias(
            "n_low_quality"
        ),
    )
    n = scored.count()
    got = obs.get
    assert got["n_rows"] == n
    direct = scored.filter(F.col("quality_score") < 0.5).count()
    assert got["n_low_quality"] == direct


def test_pandas_udf_cosine_matches_native(spark):
    """The Arrow-batched cosine equals the Catalyst-expression cosine
    on every query/neighbor pair (1e-9 — float assoc differences
    only)."""
    emb = _emb(spark).limit(80)
    pairs = (
        emb.select(F.col("vec_id").alias("qid"),
                   F.col("embedding").cast("array<double>").alias("qv"))
        .crossJoin(
            emb.select(F.col("vec_id").alias("nid"),
                       F.col("embedding").cast("array<double>").alias("cv"))
        )
        .filter(F.col("qid") < F.col("nid"))
        .limit(500)
    )
    cos_pd = similarity.cosine_pandas_udf()
    both = pairs.select(
        "qid", "nid",
        similarity._cosine("qv", "cv").alias("native"),
        cos_pd("qv", "cv").alias("arrow"),
    ).collect()
    assert both
    for r in both:
        assert abs(r["native"] - r["arrow"]) < 1e-9, (r["qid"], r["nid"])
