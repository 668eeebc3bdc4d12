"""[EXT] Privacy operators over the event stream: deterministic
pseudonymization and a k-anonymity audit.

Training-data and analytics pipelines routinely have to strip direct
identifiers while keeping joins and per-user aggregation working —
that is keyed tokenization, not deletion — and then prove that the
quasi-identifier combinations they still publish cannot single out
small groups. Both are map/agg-shaped and run at scan speed.

Scale shape: pseudonymization is map-only (one hash per row, zero
shuffle; the token preserves equality so every downstream user-keyed
operator works unchanged on the token column). The k-anonymity audit
is one hash-agg over the generalized quasi-identifier tuple — group
cardinality is bounded by the generalization grid, not the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: pipeline tokenization salt. In production this is a SECRET pulled
#: from a vault (making the mapping non-invertible without it — keyed
#: pseudonymization per GDPR Art. 4(5)); a fixed constant here keeps
#: the DuckDB oracle able to replay the mapping.
PSEUDO_SALT = "spark-graft-pepper-v1"

#: k-anonymity threshold: quasi-identifier groups smaller than this
#: are re-identification risks.
K_ANON = 5

#: generalization grid for the audit's quasi-identifiers.
HOUR_BAND_WIDTH = 6
VALUE_BAND_WIDTH = 100


def pseudonymize_events(events: DataFrame) -> DataFrame:
    """Keyed tokenization of the user identifier: token =
    md5(salt || ':' || user_id), truncated to 16 hex chars. Equality
    is preserved (same user -> same token), so joins, sessionization,
    and per-user features all run unchanged on ``user_token``; the raw
    id never leaves this projection. The free-text ``props`` column is
    dropped (it is the unbounded-PII channel; the redaction operator
    handles text that must survive).
    """
    return events.select(
        "event_id",
        F.substring(
            F.md5(
                F.concat(
                    F.lit(PSEUDO_SALT),
                    F.lit(":"),
                    F.col("user_id").cast("string"),
                )
            ),
            1,
            16,
        ).alias("user_token"),
        "event_type",
        "ts",
        "value",
    )


ORACLE_PSEUDONYMIZE = f"""
pseudonymize_events AS (
  SELECT event_id,
         substr(md5('{PSEUDO_SALT}' || ':' || CAST(user_id AS VARCHAR)),
                1, 16) AS user_token,
         event_type, ts, value
  FROM events
)
"""


def k_anonymity_audit(events: DataFrame, k: int = K_ANON) -> DataFrame:
    """k-anonymity over the generalized quasi-identifier tuple
    (event_type, hour band, value band): group sizes plus an
    ``at_risk`` flag for groups smaller than k — the audit that
    decides whether a generalization grid is safe to publish. Distinct
    users per group is reported too (group size alone overstates
    safety when one user dominates a cell).
    """
    g = events.select(
        "event_type",
        (
            F.floor(F.hour("ts") / HOUR_BAND_WIDTH) * HOUR_BAND_WIDTH
        ).alias("hour_band"),
        (
            F.floor(F.col("value") / VALUE_BAND_WIDTH) * VALUE_BAND_WIDTH
        ).alias("value_band"),
        "user_id",
    )
    return (
        g.groupBy("event_type", "hour_band", "value_band")
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .withColumn("at_risk", F.col("n_users") < k)
    )


ORACLE_K_ANONYMITY = f"""
k_anonymity_audit AS (
  SELECT event_type,
         CAST(floor(hour(ts) / {HOUR_BAND_WIDTH})
              * {HOUR_BAND_WIDTH} AS BIGINT) AS hour_band,
         CAST(floor(value / {VALUE_BAND_WIDTH})
              * {VALUE_BAND_WIDTH} AS BIGINT) AS value_band,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
         count(DISTINCT user_id) < {K_ANON} AS at_risk
  FROM events
  GROUP BY 1, 2, 3
)
"""
