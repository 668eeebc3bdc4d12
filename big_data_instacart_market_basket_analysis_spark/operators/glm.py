"""[EXT] Verified generalized linear models: logistic regression by
full-batch gradient descent, engine-exact under the hash gate.

Completes the verified-training family (CART / GBM in ``trees.py``)
with the GLM member: the reference's MLlib trees (F.py:219-225) are
rows-only by nature, but batch GD over a fixed feature set is a pure
dataflow — per round ONE aggregation produces the gradient, so the
entire training trajectory (weights, log-loss curve, accuracy) is a
deterministic function of the data and replayable in DuckDB as
unrolled per-round CTEs.

Cross-engine float protocol (the repo's standard): probabilities are
rounded to 12 dp after the sigmoid (absorbs libm exp() ulp skew),
weights to 9 dp after each update (absorbs aggregation fold-order
ulps — gradient magnitudes are O(1), so 1e-13 relative noise never
reaches the 9th decimal), loss/accuracy rounded at the output edge.
Features are ratios of integer counts — bit-identical in both
engines by construction.

The (disclosed) modeling setup: predict y = [n_chars > 300] from
x1 = 'dup'-token density x10 and x2 = centered word count /50. x2
nearly determines y, so the curve must show real learning (loss
0.69 -> ~0.48, accuracy 0.49 -> ~0.96 in 4 rounds) — the gate then
verifies the *mechanics* of training, which is the point: the same
plan trains any (x, y) at any scale.

Scale: each round = one crossJoin with the broadcast 1-row weight
table + one hash-agg over the feature table (map-side partials — no
shuffle wider than 3 doubles), exactly the shape distributed LR uses
at 100 TB (a full-batch L-BFGS/GD step IS this aggregation). The
feature table is localCheckpointed once; rounds grow the plan by one
tiny join each, never rescan text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LR_ROUNDS = 4
LR_RATE = 2.0
LR_CHARS_THRESHOLD = 300
_P_FLOOR = 1e-12


def _lr_features(docs: DataFrame) -> DataFrame:
    """doc-grain features: x1 = 'dup' occurrences x10 / words,
    x2 = words/50 - 1, y = [n_chars > threshold]. All ratios of
    integer counts — engine-exact doubles."""
    occ = (
        F.length("text") - F.length(F.replace(F.col("text"), F.lit("dup")))
    ) / F.lit(3)
    words = F.size(F.split(F.col("text"), " "))
    return docs.select(
        (occ * F.lit(10.0) / words).alias("x1"),
        (words / F.lit(50.0) - F.lit(1.0)).alias("x2"),
        (F.col("n_chars") > LR_CHARS_THRESHOLD).cast("int").alias("y"),
    )


def logreg_train(docs: DataFrame, rounds: int = LR_ROUNDS) -> DataFrame:
    """Full-batch GD logistic regression; one row per round with the
    post-update weights and the PRE-update loss/accuracy (the metrics
    that motivated the step — same convention as the oracle)."""
    feats = _lr_features(docs).localCheckpoint(eager=True)
    w = None  # 1-row (w0, w1, w2)
    out = None
    for rnd in range(1, rounds + 1):
        if w is None:
            scored_src = feats.select(
                "*",
                F.lit(0.0).alias("w0"),
                F.lit(0.0).alias("w1"),
                F.lit(0.0).alias("w2"),
            )
        else:
            scored_src = feats.crossJoin(F.broadcast(w))
        m = F.col("w0") + F.col("w1") * F.col("x1") + F.col("w2") * F.col(
            "x2"
        )
        p = F.least(
            F.greatest(
                F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-m)), 12),
                F.lit(_P_FLOOR),
            ),
            F.lit(1.0 - _P_FLOOR),
        )
        scored = scored_src.select("*", p.alias("p"))
        d = F.col("p") - F.col("y")
        stats = scored.agg(
            F.avg(d).alias("g0"),
            F.avg(d * F.col("x1")).alias("g1"),
            F.avg(d * F.col("x2")).alias("g2"),
            F.round(
                F.avg(
                    -(
                        F.col("y") * F.log("p")
                        + (F.lit(1) - F.col("y")) * F.log(F.lit(1.0) - F.col("p"))
                    )
                ),
                6,
            ).alias("log_loss"),
            F.round(
                F.avg(
                    ((F.col("p") > 0.5) == (F.col("y") == 1)).cast("double")
                ),
                4,
            ).alias("accuracy"),
            F.first("w0").alias("w0"),
            F.first("w1").alias("w1"),
            F.first("w2").alias("w2"),
        )
        w = stats.select(
            F.round(F.col("w0") - F.lit(LR_RATE) * F.col("g0"), 9).alias(
                "w0"
            ),
            F.round(F.col("w1") - F.lit(LR_RATE) * F.col("g1"), 9).alias(
                "w1"
            ),
            F.round(F.col("w2") - F.lit(LR_RATE) * F.col("g2"), 9).alias(
                "w2"
            ),
        ).localCheckpoint(eager=True)
        row = w.crossJoin(
            F.broadcast(stats.select("log_loss", "accuracy"))
        ).select(
            F.lit(rnd).alias("round"),
            "w0",
            "w1",
            "w2",
            "log_loss",
            "accuracy",
        )
        out = row if out is None else out.unionByName(row)
    return out


def _sql_round(prev_w: str, rnd: int) -> str:
    """One unrolled GD round: score with prev weights, aggregate
    gradient + metrics, update weights."""
    return f"""
lr_s{rnd} AS (
  SELECT f.*, w.w0, w.w1, w.w2,
         least(greatest(round(CAST(1.0 AS DOUBLE)
                 / (1.0 + exp(-(w.w0 + w.w1 * f.x1 + w.w2 * f.x2))), 12),
               CAST({_P_FLOOR!r} AS DOUBLE)),
               CAST({1.0 - _P_FLOOR!r} AS DOUBLE)) AS p
  FROM lr_feats f, {prev_w} w
),
lr_g{rnd} AS (
  SELECT avg(p - y) AS g0,
         avg((p - y) * x1) AS g1,
         avg((p - y) * x2) AS g2,
         round(avg(-(y * ln(p) + (1 - y) * ln(1.0 - p))), 6) AS log_loss,
         round(avg(CASE WHEN (p > 0.5) = (y = 1)
                        THEN CAST(1.0 AS DOUBLE)
                        ELSE CAST(0.0 AS DOUBLE) END), 4) AS accuracy
  FROM lr_s{rnd}
),
lr_w{rnd} AS (
  SELECT round(w.w0 - {LR_RATE!r} * g.g0, 9) AS w0,
         round(w.w1 - {LR_RATE!r} * g.g1, 9) AS w1,
         round(w.w2 - {LR_RATE!r} * g.g2, 9) AS w2
  FROM {prev_w} w, lr_g{rnd} g
)"""


def oracle_logreg(rounds: int = LR_ROUNDS) -> str:
    parts = [
        f"""
lr_feats AS (
  SELECT CAST((len(text) - len(replace(text, 'dup', ''))) / 3 AS DOUBLE)
           * 10.0 / len(split(text, ' ')) AS x1,
         len(split(text, ' ')) / CAST(50.0 AS DOUBLE)
           - CAST(1.0 AS DOUBLE) AS x2,
         CAST(n_chars > {LR_CHARS_THRESHOLD} AS INT) AS y
  FROM documents
),
lr_w0 AS (SELECT CAST(0.0 AS DOUBLE) AS w0, CAST(0.0 AS DOUBLE) AS w1,
                 CAST(0.0 AS DOUBLE) AS w2)"""
    ]
    for rnd in range(1, rounds + 1):
        parts.append(_sql_round(f"lr_w{rnd - 1}", rnd))
    selects = [
        f"SELECT {r} AS round, w.w0, w.w1, w.w2, g.log_loss, g.accuracy"
        f" FROM lr_w{r} w, lr_g{r} g"
        for r in range(1, rounds + 1)
    ]
    union = "\nUNION ALL\n".join(selects)
    return ",".join(parts) + f",\nlogreg_train AS (\n{union}\n)"
