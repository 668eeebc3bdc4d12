"""Market-basket operator tests: oracle parity is covered by
test_oracle_queries; here we cross-check the two independent
implementations of arity-2 support (DataFrame self-join vs FP-Growth)
and sanity-check rule statistics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_instacart_market_basket_analysis_spark.operators import basket
from big_data_instacart_market_basket_analysis_spark.plans.instacart import (
    instacart_tables,
)
from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def tables(spark):
    return instacart_tables(spark, SF_ORACLE)


def test_fpgrowth_pairs_match_frequent_pairs(tables):
    """FP-Growth's arity-2 itemsets must equal the self-join pair counts
    — two algorithms, one statistic."""
    fp = {
        (r["itemset"], r["freq"])
        for r in basket.fpgrowth_itemsets(tables)
        .filter(F.col("arity") == 2)
        .collect()
    }
    sj = {
        (f"{r['p1']} {r['p2']}", r["pair_count"])
        for r in basket.frequent_pairs(tables).collect()
    }
    assert fp == sj
    assert len(sj) > 0


def test_pair_rules_statistics(tables):
    rows = basket.pair_rules(tables).collect()
    assert rows
    for r in rows:
        assert 0.0 < r["confidence"] <= 1.0
        assert r["lift"] > 0.0
        assert r["pair_count"] <= r["ante_count"]
        assert r["pair_count"] <= r["cons_count"]


def test_fpgrowth_rules_nonempty(tables):
    rows = basket.fpgrowth_rules(tables).limit(5).collect()
    assert rows
    for r in rows:
        assert 0.0 < r["confidence"] <= 1.0
