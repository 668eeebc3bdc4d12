"""Spark 4 front-end features: SQL scripting (loop-carried state) and
the VARIANT semi-structured type — invariants beyond the DuckDB hash.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from big_data_instacart_market_basket_analysis_spark.plans import sqlapi
from big_data_instacart_market_basket_analysis_spark.sources import (
    json_ingest,
)
from big_data_instacart_market_basket_analysis_spark.sources.loaders import (
    load_table,
)
from tests.conftest import SF_ORACLE


def test_sql_scripting_peel_raises_threshold_monotonically(spark):
    """The iterated-mean peel can never lower the bar: the final
    threshold is >= the round-1 threshold (the floored global mean),
    and the survivor count is a strict subset of the order table."""
    row = sqlapi.sql_scripting_peel(spark, SF_ORACLE).collect()[0]
    orders = load_table(spark, SF_ORACLE, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    agg = orders.agg(
        F.count("*").alias("n"),
        (F.sum(cents) / F.count("*")).cast("bigint").alias("mean0"),
    ).collect()[0]
    assert row["n_rounds"] == sqlapi.SCRIPT_PEEL_ROUNDS
    assert row["threshold_cents"] >= agg["mean0"]
    assert 0 < row["n_above"] < agg["n"]


def test_variant_rollup_equals_native_twin(spark):
    """The VARIANT path (to_json -> parse_json -> typed extraction ->
    rollup) must equal the same rollup computed directly on the raw
    columns — the in-engine losslessness proof, independent of the
    cross-engine oracle."""
    events = load_table(spark, SF_ORACLE, "events")
    via_variant = {
        (r["event_type"], r["day"]): (
            r["n_events"],
            r["cents"],
            r["max_item0"],
        )
        for r in json_ingest.variant_daily_rollup(events).collect()
    }
    native = {
        (r["event_type"], r["day"]): (
            r["n_events"],
            r["cents"],
            r["max_item0"],
        )
        for r in events.groupBy(
            "event_type",
            F.date_format(F.col("ts").cast("timestamp"), "yyyy-MM-dd")
            .alias("day"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(
                F.round(F.col("value") * 100, 0).cast("bigint")
            ).alias("cents"),
            F.max("event_id").alias("max_item0"),
        )
        .collect()
    }
    assert via_variant == native


def test_rouge_pairs_hand_computed(spark):
    """ROUGE-1/2 F1 against a hand-worked example: ref 'a b c a' vs
    cand 'a b d' — clipped unigram overlap 2 (a:min(2,1) + b:1), F1 =
    2*2/(4+3); bigram overlap 1 ('a b'), F1 = 2*1/(3+2)."""
    from big_data_instacart_market_basket_analysis_spark.operators import (
        textstats as TS,
    )

    docs = spark.createDataFrame(
        [(0, "a b  c a"), (1, "a b d"), (2, "x"), (3, "y x")],
        "doc_id long, text string",
    )
    rows = {r["ref_id"]: r for r in TS.rouge_pairs(docs).collect()}
    r0 = rows[0]
    assert (r0["n1_ref"], r0["n1_cand"], r0["overlap1"]) == (4, 3, 2)
    assert abs(r0["rouge1_f"] - round(4 / 7, 6)) < 1e-9
    assert (r0["n2_ref"], r0["n2_cand"], r0["overlap2"]) == (3, 2, 1)
    assert abs(r0["rouge2_f"] - 0.4) < 1e-9
    r2 = rows[2]  # ref 'x' has no bigrams: rouge2 undefined (null)
    assert (r2["overlap1"], r2["n2_ref"]) == (1, 0)
    assert r2["rouge2_f"] is None
