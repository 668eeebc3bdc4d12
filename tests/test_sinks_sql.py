"""Sink round-trips and SQL front-end checks (oracle parity for the
sql_* queries is in test_oracle_queries)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_instacart_market_basket_analysis_spark.operators.features import (
    product_features,
)
from big_data_instacart_market_basket_analysis_spark.plans.instacart import (
    instacart_tables,
)
from big_data_instacart_market_basket_analysis_spark.plans.sqlapi import (
    register_all,
)
from big_data_instacart_market_basket_analysis_spark.sources import sinks
from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def feats(spark):
    return product_features(instacart_tables(spark, SF_ORACLE))


def test_parquet_roundtrip_partitioned(spark, feats, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("sink") / "pf")
    sinks.write_parquet(feats, path, partition_by=["dep_id"])
    back = spark.read.parquet(path)
    assert back.count() == feats.count()
    # partition pruning: a dep_id filter must prune directories, so the
    # scan's partition filter is present in the plan
    one = back.select("dep_id").limit(1).collect()[0][0]
    plan = back.filter(F.col("dep_id") == one)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan

def test_parquet_roundtrip_sized(spark, feats, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("sink") / "sized")
    n = feats.count()
    sinks.write_parquet(feats, path, target_file_rows=max(1, n // 4))
    assert spark.read.parquet(path).count() == n


def test_csv_roundtrip(spark, feats, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("sink") / "csv")
    sinks.write_csv(feats.select("productID", "numorders"), path)
    back = spark.read.csv(path, header=True, inferSchema=True)
    assert back.count() == feats.count()
    assert set(back.columns) == {"productID", "numorders"}


def test_sql_views_queryable(spark):
    register_all(spark, SF_ORACLE)
    n = spark.sql(
        "SELECT count(*) AS n FROM user_product_features_v WHERE numorders >= 1"
    ).collect()[0]["n"]
    assert n > 0
    # view chain pushes filters: candidates_v filtered by eval_set
    assert (
        spark.sql("SELECT * FROM frequent_pairs_v WHERE p1 < p2").count() > 0
    )


def test_orc_roundtrip_with_pushdown(spark, feats, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("sink") / "orc")
    sinks.write_orc(feats, path)
    back = spark.read.orc(path)
    assert back.count() == feats.count()
    # nullability flags may flip on round-trip; names/types must hold
    assert [(f.name, f.dataType) for f in back.schema] == [
        (f.name, f.dataType) for f in feats.schema
    ]
    plan = (
        back.filter(F.col("numorders") > 5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [IsNotNull(numorders), GreaterThan(numorders" in plan


def test_upsert_partitions_replaces_only_touched(spark, tmp_path_factory):
    """Dynamic partition overwrite: restating one day replaces that
    day's partition and leaves every other partition untouched."""
    path = str(tmp_path_factory.mktemp("sink") / "upsert")
    base = spark.createDataFrame(
        [(1, "d1", 10.0), (2, "d2", 20.0), (3, "d3", 30.0)],
        ["id", "day", "v"],
    )
    sinks.write_parquet(base, path, partition_by=["day"])
    restated = spark.createDataFrame(
        [(2, "d2", 99.0), (4, "d2", 42.0)], ["id", "day", "v"]
    )
    sinks.upsert_partitions(spark, restated, path, ["day"])
    back = {(r["id"], r["day"], r["v"])
            for r in spark.read.parquet(path).collect()}
    assert back == {
        (1, "d1", 10.0), (3, "d3", 30.0),   # untouched partitions
        (2, "d2", 99.0), (4, "d2", 42.0),   # d2 fully replaced
    }


def test_merge_schema_evolution_read(spark, tmp_path):
    """Schema evolution across parquet batches: a later batch adds a
    column; mergeSchema reads both as one table with nulls filling the
    missing columns — the append-only lakehouse evolution story."""
    p = str(tmp_path / "evolving")
    spark.range(3).selectExpr("id", "id * 2 AS a").write.parquet(
        p + "/batch=1"
    )
    spark.range(3, 6).selectExpr("id", "id * 2 AS a", "id * 3 AS b").write.parquet(
        p + "/batch=2"
    )
    df = spark.read.option("mergeSchema", "true").parquet(p)
    assert {"id", "a", "b"}.issubset(set(df.columns))
    assert df.count() == 6
    assert df.filter("b IS NULL").count() == 3
    assert df.filter("b IS NOT NULL").count() == 3


def test_compact_parquet_reduces_files(spark, tmp_path):
    """Compaction: 64 tiny files rewritten into byte-sized targets;
    row set unchanged, file count collapses."""
    import glob

    from big_data_instacart_market_basket_analysis_spark.sources import (
        sinks,
    )

    p = str(tmp_path / "frag")
    spark.range(10_000).repartition(64).write.parquet(p)
    before = len(glob.glob(p + "/*.parquet"))
    assert before >= 32
    n = sinks.compact_parquet(spark, p, target_bytes=1 << 20)
    after = len(glob.glob(p + "/*.parquet"))
    df = spark.read.parquet(p)
    assert after <= max(n, 4) < before
    assert df.count() == 10_000
    assert df.agg({"id": "sum"}).collect()[0][0] == 10_000 * 9_999 // 2
