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


def test_prefixspan_pairs_match_sequential_pairs(tables):
    """PrefixSpan's two-singleton-itemset patterns must equal the
    span-self-join sequential pair counts — two algorithms (distributed
    PrefixSpan vs first/last-occurrence algebra), one statistic."""
    ps = {
        (r["pattern"], r["freq"])
        for r in basket.prefixspan_patterns(tables)
        .filter(
            (F.col("n_itemsets") == 2)
            # two singleton itemsets: "p | q" renders with no spaces
            # inside either itemset
            & (~F.col("pattern").rlike(r"\d \d"))
        )
        .collect()
    }
    sj = {
        (f"{r['antecedent']} | {r['consequent']}", r["n_users"])
        for r in basket.sequential_pairs(tables).collect()
    }
    assert ps == sj
    assert len(sj) > 0


def test_prefixspan_singletons_match_user_counts(tables):
    """Length-1 patterns count users whose history contains the
    product — must equal a direct distinct-user aggregation."""
    ps = {
        (r["pattern"], r["freq"])
        for r in basket.prefixspan_patterns(tables)
        .filter(F.col("n_itemsets") == 1)
        .filter(~F.col("pattern").contains(" "))
        .collect()
    }
    direct = {
        (str(r["productID"]), r["n_users"])
        for r in basket.product_order_spans(tables)
        .groupBy("productID")
        .agg(F.count("*").alias("n_users"))
        .filter(F.col("n_users") >= basket.MIN_SEQ_COUNT)
        .collect()
    }
    assert ps == direct


def test_fpgrowth_triples_match_apriori(tables):
    """FP-Growth's arity-3 itemsets must equal the Apriori pruned
    triple counts — two algorithms (distributed PFP vs downward-closure
    candidate join), one statistic."""
    fp = {
        (r["itemset"], r["freq"])
        for r in basket.fpgrowth_itemsets(tables)
        .filter(F.col("arity") == 3)
        .collect()
    }
    ap = {
        (f"{r['p1']} {r['p2']} {r['p3']}", r["triple_count"])
        for r in basket.apriori_triples(tables).collect()
    }
    assert fp == ap
    assert len(ap) > 0


def test_apriori_triples_synthetic(spark):
    """Engineered fixture where pruning is load-bearing: (1,2,3) is the
    only frequent triple; (4,5) is a frequent pair whose extensions all
    fail downward closure, so no (4,5,x) triple may appear."""
    from big_data_instacart_market_basket_analysis_spark.plans.instacart import (
        InstacartTables,
    )

    baskets = {
        101: [1, 2, 3, 9],
        102: [1, 2, 3],
        103: [1, 2, 3, 4, 5],
        104: [4, 5, 6],
        105: [4, 5, 7],
        106: [6, 8],
    }
    orders = spark.createDataFrame(
        [(oid, 1, 0, 1, 0, 0, 0) for oid in baskets],
        "orderID int, userID int, eval_set int, order_number int,"
        " order_dow int, order_hod int, days_since int",
    )
    op = spark.createDataFrame(
        [
            (oid, pid, i + 1, 0)
            for oid, pids in baskets.items()
            for i, pid in enumerate(pids)
        ],
        "orderID int, productID int, cart_order int, reordered int",
    )
    products = spark.createDataFrame(
        [(p, "a", "d") for p in range(1, 10)],
        "productID int, aisle_id string, dep_id string",
    )
    t = InstacartTables(orders=orders, order_products=op, products=products)
    got = {
        (r["p1"], r["p2"], r["p3"]): r["triple_count"]
        for r in basket.apriori_triples(t).collect()
    }
    # min_count=2: only (1,2,3) survives the HAVING; the frequent pair
    # (4,5) generates candidates but every extension fails the count.
    assert got == {(1, 2, 3): 3}
