"""Feature-family operators (SURVEY.md §2c-§2d: A1-A11, J2-J5).

Each builder takes the Instacart-shaped views and returns a DataFrame;
the matching DuckDB oracle CTE lives next to it. All aggregations are
single-pass hash aggs (partial+final, map-side combine); joins on
dimension-sized inputs are broadcast, fact-fact joins shuffle on their
keys under AQE.

Reference lineage is cited per function (F.py = the reference notebook).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.columns import safe_div
from ..plans.instacart import InstacartTables


def product_features(t: InstacartTables) -> DataFrame:
    """A1-A3 + J2 (F.py:69-74): per-product order/reorder stats ⋈ dim.

    One hash-agg pass over prior order_products, then a broadcast join to
    the products dimension (dims stay broadcastable at any fact scale).
    ``numreorders`` is double to mirror the reference's float32 cast
    (F.py:71).
    """
    stats = t.prior_products.groupBy("productID").agg(
        F.count("*").alias("numorders"),
        F.sum("reordered").cast("double").alias("numreorders"),
    )
    stats = stats.withColumn(
        "reorder_ratio", safe_div(F.col("numreorders"), F.col("numorders"))
    )
    return F.broadcast(t.products).join(stats, "productID", "inner").select(
        "productID",
        "aisle_id",
        "dep_id",
        "numorders",
        "numreorders",
        "reorder_ratio",
    )


ORACLE_PRODUCT_FEATURES = """
product_features AS (
  SELECT p.productID, p.aisle_id, p.dep_id,
         s.numorders, s.numreorders, s.reorder_ratio
  FROM iproducts p
  JOIN (
    SELECT productID,
           count(*) AS numorders,
           CAST(CAST(sum(reordered) AS BIGINT) AS DOUBLE) AS numreorders,
           CAST(sum(reordered) AS DOUBLE) / NULLIF(count(*), 0) AS reorder_ratio
    FROM iprior_products
    GROUP BY productID
  ) s USING (productID)
)
"""


def prior_enriched(t: InstacartTables) -> DataFrame:
    """J3 (F.py:82-84): prior order_products ⋈ orders on orderID.

    Fact-fact equi-join; at scale this shuffles both sides on orderID
    (AQE handles skew). Using the ``on=str`` form keeps a single orderID
    column (P8: the reference drops the duplicate manually, F.py:84).
    """
    return t.prior_products.join(t.orders, "orderID", "inner")


ORACLE_PRIOR_ENRICHED = """
prior_enriched AS (
  SELECT op.orderID, op.productID, op.cart_order, op.reordered,
         o.userID, o.eval_set, o.order_number, o.order_dow, o.order_hod,
         o.days_since
  FROM iprior_products op
  JOIN iorders o USING (orderID)
)
"""


def user_order_features(t: InstacartTables) -> DataFrame:
    """A4-A5 (F.py:89-91): per-user ordering-gap mean + order count.

    Over *all* sampled orders (the reference groups the full ordersDF,
    not just priors).
    """
    return t.orders.groupBy("userID").agg(
        F.avg("days_since").alias("avg_orderingGap"),
        F.count("*").alias("total_orders"),
    )


ORACLE_USER_ORDER_FEATURES = """
user_order_features AS (
  SELECT userID,
         avg(days_since) AS avg_orderingGap,
         count(*)        AS total_orders
  FROM iorders
  GROUP BY userID
)
"""


def user_prior_features(t: InstacartTables) -> DataFrame:
    """A6-A8 (F.py:97-100): per-user basket totals + item set.

    ``all_items`` is the reference's set-valued column (F.py:99) as a
    sorted array (determinism rule, SURVEY.md §5); ``all_items_str`` is
    its hash-stable string rendering used in declared query output.
    ``distinct_items`` = set size (F.py:100).
    """
    return prior_enriched(t).groupBy("userID").agg(
        F.count("*").alias("items_purchased_total"),
        F.array_sort(F.collect_set("productID")).alias("all_items"),
        F.size(F.array_sort(F.collect_set("productID"))).alias(
            "distinct_items"
        ),
    )


ORACLE_USER_PRIOR_FEATURES = """
user_prior_features AS (
  SELECT userID,
         count(*) AS items_purchased_total,
         list_sort(list(DISTINCT productID)) AS all_items,
         CAST(len(list(DISTINCT productID)) AS INT) AS distinct_items
  FROM prior_enriched
  GROUP BY userID
)
"""


def users_final(t: InstacartTables) -> DataFrame:
    """J4 + A9 (F.py:105-106): user features assembled.

    Left join from the prior-derived side (pandas ``.join`` default) +
    ``average_items`` ratio. Both sides are per-user aggregates sharing
    the userID hash partitioning — one shuffle each, co-located join.
    """
    joined = user_prior_features(t).join(
        user_order_features(t), "userID", "left"
    )
    return joined.withColumn(
        "average_items",
        safe_div(F.col("items_purchased_total"), F.col("total_orders")),
    )


ORACLE_USERS_FINAL = """
users_final AS (
  SELECT up.userID, up.items_purchased_total, up.all_items,
         up.distinct_items, uo.avg_orderingGap, uo.total_orders,
         CAST(up.items_purchased_total AS DOUBLE) / NULLIF(uo.total_orders, 0)
           AS average_items
  FROM user_prior_features up
  LEFT JOIN user_order_features uo USING (userID)
)
"""


def user_product_features(t: InstacartTables) -> DataFrame:
    """A10-A11 + J10 (F.py:111-118): per-(user,product) aggregates.

    The reference fakes the composite key as ``userID*100000+productID``
    (collision-prone, F.py:112) and uses order-sensitive pandas ``last``
    after a sort (F.py:113-114). Here: a true composite grouping key and
    ``max_by(orderID, order_number)`` — the deterministic "orderID of the
    user's latest order containing this product" (SURVEY.md A11; ties in
    order_number can only be the same order, so the result is unique).
    """
    return prior_enriched(t).groupBy("userID", "productID").agg(
        F.count("*").alias("numorders"),
        F.expr("max_by(orderID, order_number)").alias("final_orderId"),
        F.sum("cart_order").alias("sum_cartOrder"),
    )


ORACLE_USER_PRODUCT_FEATURES = """
user_product_features AS (
  SELECT userID, productID,
         count(*) AS numorders,
         max_by(orderID, order_number) AS final_orderId,
         CAST(sum(cart_order) AS BIGINT) AS sum_cartOrder
  FROM prior_enriched
  GROUP BY userID, productID
)
"""


# ---------------------------------------------------------------------------
# leave-one-out target encoding (ML feature engineering, leakage-safe)
# ---------------------------------------------------------------------------


def loo_target_encoding(t) -> DataFrame:
    """Leave-one-out target encoding of productID against the
    ``reordered`` target over the prior split: each row's encoding is
    the mean target of all OTHER rows of the same product —
    ``(sum(product) - own) / (n(product) - 1)`` — null for singleton
    products. The standard leakage-safe categorical encoder for
    gradient-boosted models.

    Plan: one hash-agg to the product grain (dim-sized), broadcast
    back onto the fact rows, then row-local arithmetic — no per-row
    window, no second fact shuffle. At 100 TB the sums table stays
    |products|-sized regardless of fact growth.
    """
    sums = t.prior_products.groupBy("productID").agg(
        F.sum("reordered").alias("t_sum"),
        F.count("*").alias("t_cnt"),
    )
    return (
        t.prior_products.select("orderID", "productID", "reordered")
        .join(F.broadcast(sums), "productID")
        .select(
            "orderID",
            "productID",
            "reordered",
            F.round(
                F.when(
                    F.col("t_cnt") > 1,
                    (F.col("t_sum") - F.col("reordered"))
                    / (F.col("t_cnt") - F.lit(1)).cast("double"),
                ),
                6,
            ).alias("loo_enc"),
        )
    )


ORACLE_LOO_TARGET_ENCODING = """
loo_sums AS (
  SELECT productID,
         CAST(sum(reordered) AS BIGINT) AS t_sum,
         CAST(count(*) AS BIGINT) AS t_cnt
  FROM iprior_products GROUP BY productID
),
loo_target_encoding AS (
  SELECT op.orderID, op.productID, op.reordered,
         round(CASE WHEN s.t_cnt > 1
               THEN (s.t_sum - op.reordered)
                    / CAST(s.t_cnt - 1 AS DOUBLE) END, 6) AS loo_enc
  FROM iprior_products op JOIN loo_sums s ON op.productID = s.productID
)
"""
