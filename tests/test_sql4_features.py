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
