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

from pyspark.sql import DataFrame
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
