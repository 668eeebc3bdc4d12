"""Instacart-format CSV ingest (reference parity path; SURVEY.md §2a).

Replaces the reference's RDD ingest (F.py:16-30) one-for-one with
DataFrame reads — header strip (S2) becomes ``header=True``; per-row
``int()`` lambdas (S3) become read-time schemas; the products
malformed-row drop (S4) keeps ``mode=DROPMALFORMED``; the eval_set enum
encode (S5) and days_since null default (S6) become Catalyst
expressions. Zero Python UDFs, so the scan stays inside whole-stage
codegen and the CSV parse is JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schemas import INSTACART_SCHEMAS

# eval_set enum encoding, F.py:26: prior->0, train->1, test->2.
EVAL_PRIOR, EVAL_TRAIN, EVAL_TEST = 0, 1, 2


def encode_eval_set(col: F.Column) -> F.Column:
    """S5 (F.py:26): ``0 if eval_set=="prior" else 1 if =="train" else 2``."""
    return (
        F.when(col == "prior", F.lit(EVAL_PRIOR))
        .when(col == "train", F.lit(EVAL_TRAIN))
        .otherwise(F.lit(EVAL_TEST))
    )


def read_order_products(spark: SparkSession, path: str) -> DataFrame:
    """S1-S3 (F.py:16-22): order_products__{prior,train}.csv."""
    return spark.read.csv(
        path, schema=INSTACART_SCHEMAS["order_products"], header=True
    )


def read_orders(spark: SparkSession, path: str) -> DataFrame:
    """S1-S3 + S5 + S6 (F.py:24-26): orders.csv with enum + null default."""
    raw = spark.read.csv(path, schema=INSTACART_SCHEMAS["orders"], header=True)
    return raw.select(
        "orderID",
        "userID",
        encode_eval_set(F.col("eval_set")).alias("eval_set"),
        "order_number",
        "order_dow",
        "order_hod",
        # F.py:26: "" -> 0; cast("int") yields null for "" (ANSI off).
        F.coalesce(F.col("days_since").cast("int"), F.lit(0)).alias(
            "days_since"
        ),
    )


def read_products(spark: SparkSession, path: str) -> DataFrame:
    """S4 + P1 (F.py:28-30): malformed-row drop, product-name column pruned."""
    return spark.read.csv(
        path,
        schema=INSTACART_SCHEMAS["products"],
        header=True,
        mode="DROPMALFORMED",
    ).select("productID", "aisle_id", "dep_id")
