"""Kaggle-style submission formatting (SURVEY.md A12, J9, F7, F8, P5).

The reference builds ``orderID -> "productID productID ..." | 'None'``
with driver-side dict loops (F.py:296-318, 335-357, 374-396). Here it is
one plan: threshold-filter the scored candidates (P5), group-concat the
product list (A12, sorted for determinism), left-join back to the full
test-order set and fill misses with 'None' (J9/F8).

``submission`` is generic over any scored column so the same operator
serves the ML models (prediction) and the deterministic proxy score
used by the oracle-checked query (prod_reorderProportion — a pure
function of the data, unlike tree-model outputs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.columns import space_joined_products
from ..plans.instacart import EVAL_TEST, InstacartTables
from .candidates import candidates_staged

#: F.py:241,297,336,375 — the reference's hard-coded decision threshold.
THRESHOLD = 0.19


def submission(
    t: InstacartTables, scored: DataFrame, score_col: str = "prediction"
) -> DataFrame:
    """Format scored test candidates into the submission table.

    scored: candidate rows (must carry orderID/productID/eval_set) with a
    score column. Strictly-greater comparison mirrors F.py:300.
    """
    picked = scored.filter(
        (F.col("eval_set") == EVAL_TEST)
        & (F.col(score_col) > F.lit(THRESHOLD))
    )
    per_order = picked.groupBy("orderID").agg(
        space_joined_products("productID").alias("products")
    )
    return (
        t.test_orders.select("orderID")
        .join(per_order, "orderID", "left")
        .select(
            "orderID",
            F.coalesce(F.col("products"), F.lit("None")).alias("products"),
        )
    )


def proxy_submission(t: InstacartTables) -> DataFrame:
    """Oracle-checkable submission using reorder_ratio as the score."""
    return submission(
        t, candidates_staged(t), score_col="prod_reorderProportion"
    )


ORACLE_PROXY_SUBMISSION = """
proxy_submission AS (
  SELECT o.orderID,
         coalesce(p.products, 'None') AS products
  FROM itest_orders o
  LEFT JOIN (
    SELECT orderID,
           array_to_string(list_sort(list(productID)), ' ') AS products
    FROM candidates
    WHERE eval_set = 2 AND prod_reorderProportion > 0.19
    GROUP BY orderID
  ) p USING (orderID)
)
"""


# ---------------------------------------------------------------------------
# expected-F1-optimal submission (per-order adaptive k)
# ---------------------------------------------------------------------------


def ef1_submission(t: InstacartTables) -> DataFrame:
    """Expected-F1-optimal basket selection: instead of the
    reference's one global threshold (F.py:300, 0.19 for every
    order), pick PER ORDER the k that maximizes the expected F1 under
    independent Bernoulli items — EF1(k) ≈ 2·Σ_{i<=k} p_i / (k + Σp)
    on the probability-sorted candidates (the first-order version of
    the exact DP that won the reference's Kaggle task), plus the
    P(empty basket) = Π(1−p_i) signal that drives the 'None' call.

    Everything is window arithmetic on basket-bounded partitions, and
    every float is derived through ORDERED cumulative sums (totals
    are max/min of the running values), so both engines produce
    bit-identical EF1 curves before the 9-dp rounding; the argmax
    tie-breaks to the smaller k.

    Output per test order: orderID, products, k_star, ef1_star,
    predict_none.
    """
    cand = (
        candidates_staged(t)
        .filter(F.col("eval_set") == EVAL_TEST)
        .select(
            "orderID",
            "productID",
            F.round("prod_reorderProportion", 6).alias("p"),
        )
    )
    wr = Window.partitionBy("orderID").orderBy(
        F.desc("p"), F.asc("productID")
    )
    wc = wr.rowsBetween(Window.unboundedPreceding, 0)
    ranked = cand.select(
        "orderID",
        "productID",
        "p",
        F.row_number().over(wr).alias("k"),
        F.sum("p").over(wc).alias("cum"),
        F.sum(
            F.log(1.0 - F.least(F.col("p"), F.lit(0.999999)))
        ).over(wc).alias("cumln"),
    )
    wo = Window.partitionBy("orderID").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    scored = ranked.select(
        "orderID",
        "productID",
        "k",
        F.round(
            2.0 * F.col("cum") / (F.col("k") + F.max("cum").over(wo)), 9
        ).alias("ef1"),
        F.min("cumln").over(wo).alias("lnm"),
    )
    m1 = scored.select(
        "orderID",
        "productID",
        "k",
        "ef1",
        "lnm",
        F.max("ef1").over(wo).alias("ef1_max"),
    )
    m2 = m1.select(
        "orderID",
        "productID",
        "k",
        "ef1_max",
        "lnm",
        F.min(
            F.when(F.col("ef1") == F.col("ef1_max"), F.col("k"))
        ).over(wo).alias("k_star"),
    )
    per_order = (
        m2.filter(F.col("k") <= F.col("k_star"))
        .groupBy("orderID")
        .agg(
            space_joined_products("productID").alias("products"),
            F.max("k_star").alias("k_star"),
            F.max("ef1_max").alias("ef1_star"),
            F.round(F.exp(F.max("lnm")), 9).alias("pnone"),
        )
    )
    return (
        t.test_orders.select("orderID")
        .join(per_order, "orderID", "left")
        .select(
            "orderID",
            F.coalesce("products", F.lit("None")).alias("products"),
            F.coalesce("k_star", F.lit(0)).alias("k_star"),
            F.coalesce("ef1_star", F.lit(0.0)).alias("ef1_star"),
            F.coalesce(
                (F.col("pnone") > F.col("ef1_star")).cast("int"),
                F.lit(1),
            ).alias("predict_none"),
        )
    )


ORACLE_EF1_SUBMISSION = """
ef1_ranked AS (
  SELECT orderID, productID,
         round(prod_reorderProportion, 6) AS p,
         CAST(row_number() OVER wr AS INT) AS k,
         sum(round(prod_reorderProportion, 6)) OVER wc AS cum,
         sum(ln(1.0 - least(round(prod_reorderProportion, 6),
                            0.999999))) OVER wc AS cumln
  FROM candidates WHERE eval_set = 2
  WINDOW wr AS (PARTITION BY orderID
                ORDER BY round(prod_reorderProportion, 6) DESC,
                         productID),
         wc AS (PARTITION BY orderID
                ORDER BY round(prod_reorderProportion, 6) DESC,
                         productID
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
ef1_scored AS (
  SELECT orderID, productID, k,
         round(2.0 * cum / (k + max(cum) OVER wo), 9) AS ef1,
         min(cumln) OVER wo AS lnm
  FROM ef1_ranked WINDOW wo AS (PARTITION BY orderID)
),
ef1_m1 AS (
  SELECT *, max(ef1) OVER wo AS ef1_max
  FROM ef1_scored WINDOW wo AS (PARTITION BY orderID)
),
ef1_m2 AS (
  SELECT *, min(CASE WHEN ef1 = ef1_max THEN k END) OVER wo AS k_star
  FROM ef1_m1 WINDOW wo AS (PARTITION BY orderID)
),
ef1_per_order AS (
  SELECT orderID,
         array_to_string(list_sort(list(productID)), ' ') AS products,
         CAST(max(k_star) AS INT) AS k_star,
         max(ef1_max) AS ef1_star,
         round(exp(max(lnm)), 9) AS pnone
  FROM ef1_m2 WHERE k <= k_star
  GROUP BY orderID
),
ef1_submission AS (
  SELECT o.orderID,
         coalesce(p.products, 'None') AS products,
         coalesce(p.k_star, 0) AS k_star,
         coalesce(p.ef1_star, CAST(0.0 AS DOUBLE)) AS ef1_star,
         coalesce(CAST(p.pnone > p.ef1_star AS INT), 1)
           AS predict_none
  FROM itest_orders o
  LEFT JOIN ef1_per_order p USING (orderID)
)
"""
