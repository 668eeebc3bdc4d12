"""Bucketed-table co-located join: the pay-the-shuffle-once pattern.

Two tables bucketed on the same key with the same bucket count must
join with ZERO exchanges — the property that makes repeated
fact-to-fact joins affordable at 100 TB. This is a plan assertion, not
just a result check: if bucketing metadata stops lining up (bucket
count drift, missing sortBy, disabled bucketed scan), the exchange
reappears and this test fails.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from big_data_instacart_market_basket_analysis_spark.plans.instacart import (
    instacart_tables,
)
from big_data_instacart_market_basket_analysis_spark.sources.sinks import (
    write_bucketed,
)
from tests.conftest import SF_SMOKE

N_BUCKETS = 8


@pytest.fixture()
def no_broadcast(spark):
    """Force a sort-merge-eligible join so the assertion tests
    bucketing, not the broadcast fallback that small fixtures get."""
    keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    )
    old = {k: spark.conf.get(k, None) for k in keys}
    for k in keys:
        spark.conf.set(k, "-1")
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_bucketed_join_has_no_exchange(spark, no_broadcast):
    t = instacart_tables(spark, SF_SMOKE)
    orders_by_user = t.orders.groupBy("userID").agg(
        F.count("*").alias("n_orders")
    )
    prior_by_user = (
        t.prior_products.join(
            t.orders.select("orderID", "userID"), "orderID"
        )
        .groupBy("userID")
        .agg(F.count("*").alias("n_items"))
    )
    write_bucketed(orders_by_user, "b_orders_by_user",
                   ["userID"], N_BUCKETS)
    write_bucketed(prior_by_user, "b_prior_by_user",
                   ["userID"], N_BUCKETS)
    try:
        joined = spark.table("b_orders_by_user").join(
            spark.table("b_prior_by_user"), "userID"
        )
        buf = io.StringIO()
        with redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        # and the result is the same as the direct (shuffling) join
        direct = orders_by_user.join(prior_by_user, "userID")
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, direct.collect())
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders_by_user")
        spark.sql("DROP TABLE IF EXISTS b_prior_by_user")


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """Hive-partitioned parquet + a filter on the partition column must
    prune at planning time: the scan's PartitionFilters carries the
    predicate, and only the matching directory is read."""
    import io
    from contextlib import redirect_stdout

    from big_data_instacart_market_basket_analysis_spark.sources.sinks import (
        write_parquet,
    )

    t = instacart_tables(spark, SF_SMOKE)
    path = str(tmp_path / "products_by_dep")
    write_parquet(t.products, path, partition_by=["dep_id"])
    back = spark.read.parquet(path).filter(F.col("dep_id") == 3)
    buf = io.StringIO()
    with redirect_stdout(buf):
        back.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "dep_id" in plan.split("PartitionFilters", 1)[1].splitlines()[0]
    expected = t.products.filter(F.col("dep_id") == 3).count()
    assert back.count() == expected
