"""[EXT] Temporal joins & state reconstruction: as-of join, bucketed range join, point-in-time enrichment, SCD2, gap interpolation.

Split from the monolithic ``operators/temporal.py`` (r8 verdict task 2); see the package ``__init__`` for provenance. All docstring citations to the reference (F.py) are preserved on the operators themselves.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from big_data_instacart_market_basket_analysis_spark.operators import (
    ranking as _rank,
)


#: as-of reference stream and probe stream (event_type values).
ASOF_REF_TYPE = "click"


ASOF_PROBE_TYPE = "purchase"



#: range-join window: probe events count reference events within +/-.
RANGE_REF_TYPE = "click"


RANGE_PROBE_TYPE = "error"


RANGE_MS = 30 * 60 * 1000




def asof_last_click(events: DataFrame) -> DataFrame:
    """For every purchase, attach the latest click of the same user at
    or before the purchase (ties on ts broken by event_id — a total
    order, so the result is unique and oracle-checkable).

    Plan: tag clicks 0 / purchases 1, one window per user ordered by
    (ts, tag, event_id), ``last(click_col, ignorenulls=True)`` over the
    unbounded-preceding frame, keep purchase rows. The three carried
    columns come from the same click row by construction (they are null
    on exactly the same input rows), so three scalar ``last`` calls are
    equivalent to carrying a struct but stay codegen-friendly.

    Scale: one shuffle (user_id), sort within partition; a user's
    timeline must be colocated — inherent to as-of semantics. Skewed
    users are bounded by their own history length, never by the join
    product.
    """
    ev = events.select(
        "event_id",
        F.unix_millis("ts").alias("ts_ms"),
        "user_id",
        "event_type",
        "value",
    )
    tagged = (
        ev.filter(F.col("event_type") == ASOF_REF_TYPE)
        .select("event_id", "ts_ms", "user_id", "value", F.lit(0).alias("tag"))
        .unionByName(
            ev.filter(F.col("event_type") == ASOF_PROBE_TYPE).select(
                "event_id", "ts_ms", "user_id", "value",
                F.lit(1).alias("tag"),
            )
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ms", "tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    is_ref = F.col("tag") == 0
    carried = tagged.select(
        "event_id",
        "ts_ms",
        "user_id",
        "value",
        "tag",
        F.last(F.when(is_ref, F.col("event_id")), ignorenulls=True)
        .over(w)
        .alias("last_click_id"),
        F.last(F.when(is_ref, F.col("ts_ms")), ignorenulls=True)
        .over(w)
        .alias("last_click_ts_ms"),
        F.last(F.when(is_ref, F.col("value")), ignorenulls=True)
        .over(w)
        .alias("last_click_value"),
    )
    return carried.filter(F.col("tag") == 1).select(
        "event_id",
        "user_id",
        "ts_ms",
        "value",
        "last_click_id",
        "last_click_ts_ms",
        (F.col("ts_ms") - F.col("last_click_ts_ms")).alias("ms_since_click"),
        "last_click_value",
    )




ORACLE_ASOF_LAST_CLICK = f"""
asof_tagged AS (
  SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, value,
         CASE WHEN event_type = '{ASOF_REF_TYPE}' THEN 0 ELSE 1 END AS tag
  FROM events
  WHERE event_type IN ('{ASOF_REF_TYPE}', '{ASOF_PROBE_TYPE}')
),
asof_carried AS (
  SELECT event_id, ts_ms, user_id, value, tag,
         last_value(CASE WHEN tag = 0 THEN event_id END IGNORE NULLS)
           OVER w AS last_click_id,
         last_value(CASE WHEN tag = 0 THEN ts_ms END IGNORE NULLS)
           OVER w AS last_click_ts_ms,
         last_value(CASE WHEN tag = 0 THEN value END IGNORE NULLS)
           OVER w AS last_click_value
  FROM asof_tagged
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, tag, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
asof_last_click AS (
  SELECT event_id, user_id, ts_ms, value, last_click_id,
         last_click_ts_ms, ts_ms - last_click_ts_ms AS ms_since_click,
         last_click_value
  FROM asof_carried WHERE tag = 1
)
"""




def range_join_nearby_clicks(events: DataFrame) -> DataFrame:
    """For every error event, count and sum the clicks of the same user
    within +/- RANGE_MS.

    Plan: bucket width == range, clicks replicated into buckets
    {{b-1, b, b+1}} (3x the SMALL filtered side, not the corpus),
    equi-join on (user_id, bucket), exact |dt| <= range filter, then a
    hash-agg per error and a left join back so zero-match errors emit
    (0, 0.0). Every candidate pair shares a bucket, so the worst case
    is events-per-bucket^2, not events-per-user^2.
    """
    ev = events.select(
        "event_id",
        F.unix_millis("ts").alias("ts_ms"),
        "user_id",
        "event_type",
        "value",
    )
    probes = ev.filter(F.col("event_type") == RANGE_PROBE_TYPE).select(
        "event_id",
        "user_id",
        "ts_ms",
        F.floor(F.col("ts_ms") / RANGE_MS).alias("bucket"),
    )
    refs = (
        ev.filter(F.col("event_type") == RANGE_REF_TYPE)
        .select(
            "user_id",
            F.col("ts_ms").alias("click_ts_ms"),
            F.col("value").alias("click_value"),
            F.explode(
                F.array(
                    F.floor(F.col("ts_ms") / RANGE_MS) - 1,
                    F.floor(F.col("ts_ms") / RANGE_MS),
                    F.floor(F.col("ts_ms") / RANGE_MS) + 1,
                )
            ).alias("bucket"),
        )
    )
    hits = (
        probes.join(refs, ["user_id", "bucket"])
        .filter(
            F.abs(F.col("click_ts_ms") - F.col("ts_ms")) <= RANGE_MS
        )
        .groupBy("event_id")
        .agg(
            F.count("*").alias("n_clicks_nearby"),
            F.round(F.sum("click_value"), 4).alias("sum_click_value"),
        )
    )
    return (
        probes.select("event_id", "user_id", "ts_ms")
        .join(hits, "event_id", "left")
        .select(
            "event_id",
            "user_id",
            "ts_ms",
            F.coalesce("n_clicks_nearby", F.lit(0)).alias(
                "n_clicks_nearby"
            ),
            F.coalesce(
                "sum_click_value", F.lit(0.0).cast("double")
            ).alias("sum_click_value"),
        )
    )




ORACLE_RANGE_JOIN_NEARBY_CLICKS = f"""
range_probes AS (
  SELECT event_id, user_id, epoch_ms(ts) AS ts_ms
  FROM events WHERE event_type = '{RANGE_PROBE_TYPE}'
),
range_refs AS (
  SELECT user_id, epoch_ms(ts) AS click_ts_ms, value AS click_value
  FROM events WHERE event_type = '{RANGE_REF_TYPE}'
),
range_join_nearby_clicks AS (
  SELECT p.event_id, p.user_id, p.ts_ms,
         CAST(count(r.click_ts_ms) AS BIGINT) AS n_clicks_nearby,
         coalesce(round(sum(r.click_value), 4), 0.0) AS sum_click_value
  FROM range_probes p
  LEFT JOIN range_refs r
    ON p.user_id = r.user_id
   AND abs(r.click_ts_ms - p.ts_ms) <= {RANGE_MS}
  GROUP BY 1, 2, 3
)
"""




def user_state_scd2(events: DataFrame) -> DataFrame:
    """SCD Type-2 dimension build from an event log: collapse each
    user's consecutive runs of the same ``event_type`` into versioned
    validity intervals (``valid_from``/``valid_to``/``is_current``) —
    the change-data-capture staple for maintaining a history dimension
    from a stream of observations.

    Gaps-and-islands, pure window algebra (zero UDFs):

      1. ``lag(event_type)`` over (user_id | ts, event_id) marks run
         starts;
      2. a running sum of the start flags numbers each run (the SCD
         version);
      3. one hash-agg per (user_id, version) takes the run's bounds;
      4. ``lead(valid_from)`` closes each interval at the next run's
         start; the open interval is ``is_current``.

    Both windows and the agg share the single user_id shuffle — the
    whole plan is ONE exchange, so at 100 TB it runs at shuffle speed
    partitioned by user. Timestamps surface as epoch millis (the repo's
    cross-engine determinism rule); ties break on event_id (unique).
    """
    order_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changed = (
        F.lag("event_type").over(order_w).isNull()
        | (F.lag("event_type").over(order_w) != F.col("event_type"))
    ).cast("int")
    runs = events.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.sum(changed)
        .over(order_w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("version"),
    )
    intervals = runs.groupBy("user_id", "version").agg(
        F.min("event_type").alias("state"),  # run-constant by construction
        (F.unix_millis(F.min("ts"))).alias("valid_from_ms"),
        F.count("*").alias("n_events"),
    )
    version_w = Window.partitionBy("user_id").orderBy("version")
    return intervals.select(
        "user_id",
        "version",
        "state",
        "valid_from_ms",
        F.lead("valid_from_ms").over(version_w).alias("valid_to_ms"),
        F.lead("valid_from_ms").over(version_w).isNull().alias(
            "is_current"
        ),
        "n_events",
    )




ORACLE_USER_STATE_SCD2 = """
scd_runs AS (
  SELECT user_id, event_type, ts, event_id,
         sum(CASE WHEN prev_type IS NULL OR prev_type <> event_type
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS version
  FROM (SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events)
),
scd_intervals AS (
  SELECT user_id, version,
         min(event_type) AS state,
         epoch_ms(min(ts)) AS valid_from_ms,
         count(*) AS n_events
  FROM scd_runs
  GROUP BY user_id, version
),
user_state_scd2 AS (
  SELECT user_id, version, state, valid_from_ms,
         lead(valid_from_ms) OVER (PARTITION BY user_id
                                   ORDER BY version) AS valid_to_ms,
         lead(valid_from_ms) OVER (PARTITION BY user_id
                                   ORDER BY version) IS NULL
           AS is_current,
         n_events
  FROM scd_intervals
)
"""




# ---------------------------------------------------------------------------
# time-series imputation: per-user linear interpolation of missing values
# ---------------------------------------------------------------------------

#: deterministic missingness stand-in: every 7th event_id is treated as
#: a dropped reading (the fixture has no real nulls; production would
#: filter on ``value IS NULL`` instead — the plan is identical).
INTERP_MISSING_MOD = 7




def interpolate_missing_values(events: DataFrame) -> DataFrame:
    """Per-user LINEAR interpolation of missing sensor values — the
    standard time-series imputation pass before model training. A
    value is missing when ``event_id % 7 == 0``; it is filled by
    interpolating between the nearest present values before and after
    (weighted by timestamp distance), falling back to
    forward-/backward-fill at the series edges.

    Plan: both direction scans are IGNORE NULLS window functions
    (``last``/``first`` with unbounded frames) over ONE user_id
    partitioning ordered by (ts, event_id) — a single Exchange; the
    interpolation itself is pure row-local arithmetic in codegen.
    State per user is O(1) per direction (the last seen value), which
    is exactly how a streaming forward-fill would carry it at 100 TB.
    """
    missing = F.col("event_id") % INTERP_MISSING_MOD == 0
    present_val = F.when(~missing, F.col("value"))
    present_ts = F.when(~missing, F.unix_millis("ts"))

    w_back = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    prev_val = F.last(present_val, ignorenulls=True).over(w_back)
    prev_ts = F.last(present_ts, ignorenulls=True).over(w_back)
    next_val = F.first(present_val, ignorenulls=True).over(w_fwd)
    next_ts = F.first(present_ts, ignorenulls=True).over(w_fwd)

    ts_ms = F.unix_millis("ts")
    interp = (
        F.when(~missing, F.col("value"))
        .when(prev_val.isNull(), next_val)
        .when(next_val.isNull(), prev_val)
        .when(next_ts == prev_ts, prev_val)
        .otherwise(
            prev_val
            + (next_val - prev_val)
            * (ts_ms - prev_ts)
            / (next_ts - prev_ts)
        )
    )
    return events.select(
        "event_id",
        "user_id",
        missing.cast("int").alias("was_missing"),
        F.round(interp, 6).alias("value_filled"),
    )




ORACLE_INTERPOLATE_MISSING = f"""
imp_marked AS (
  SELECT event_id, user_id, ts, value,
         (event_id % {INTERP_MISSING_MOD} = 0) AS missing,
         epoch_ms(ts) AS ts_ms
  FROM events
),
imp_scanned AS (
  SELECT event_id, user_id, missing, value, ts_ms,
         last_value(CASE WHEN NOT missing THEN value END IGNORE NULLS)
           OVER w_back AS prev_val,
         last_value(CASE WHEN NOT missing THEN ts_ms END IGNORE NULLS)
           OVER w_back AS prev_ts,
         first_value(CASE WHEN NOT missing THEN value END IGNORE NULLS)
           OVER w_fwd AS next_val,
         first_value(CASE WHEN NOT missing THEN ts_ms END IGNORE NULLS)
           OVER w_fwd AS next_ts
  FROM imp_marked
  WINDOW
    -- order by the RAW ts (microsecond precision), not the truncated
    -- ts_ms, to match the Spark window's ordering exactly
    w_back AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    w_fwd AS (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
),
interpolate_missing AS (
  SELECT event_id, user_id,
         CAST(missing AS INTEGER) AS was_missing,
         round(CASE
           WHEN NOT missing THEN value
           WHEN prev_val IS NULL THEN next_val
           WHEN next_val IS NULL THEN prev_val
           WHEN next_ts = prev_ts THEN prev_val
           ELSE prev_val + (next_val - prev_val)
                * (ts_ms - prev_ts) / (next_ts - prev_ts)
         END, 6) AS value_filled
  FROM imp_scanned
)
"""




# ---------------------------------------------------------------------------
# point-in-time (PIT) dimension join against the SCD2 history
# ---------------------------------------------------------------------------

#: fact slice enriched by the PIT lookup; the dim is built from the
#: complementary observation stream, so the lookup is a genuine
#: cross-interval probe, not each event finding its own run.
PIT_FACT_TYPE = "purchase"




def pit_enrich_purchases(events: DataFrame) -> DataFrame:
    """Point-in-time-correct dimension join: each purchase event is
    enriched with the user state (SCD2 interval from the NON-purchase
    observation stream) valid AT the purchase timestamp — the
    lakehouse staple for joining facts to a history dimension without
    leaking future attribute values.

    Because SCD2 intervals tile each user's timeline without overlap,
    the interval predicate matches at most one dim row per fact — the
    LEFT join preserves fact cardinality exactly (purchases before
    any observed state keep a null state). Plan: equi-join on user_id
    with the interval filter as a join residual; per-user dim rows are
    bounded by the user's state-change count, so the probe is
    hash-join-shaped, never a time-sorted merge. (For an unbounded dim
    the as-of union-tag-window form in ``asof_last_click`` is the
    fallback — same semantics at the interval starts.)
    """
    dim = user_state_scd2(
        events.filter(F.col("event_type") != PIT_FACT_TYPE)
    ).select("user_id", "version", "state", "valid_from_ms", "valid_to_ms")
    fact = events.filter(F.col("event_type") == PIT_FACT_TYPE).select(
        "event_id",
        "user_id",
        F.unix_millis("ts").alias("ts_ms"),
        F.round("value", 4).alias("value"),
    )
    cond = (
        (fact.user_id == dim.user_id)
        & (dim.valid_from_ms <= fact.ts_ms)
        & (dim.valid_to_ms.isNull() | (fact.ts_ms < dim.valid_to_ms))
    )
    return fact.join(dim, cond, "left").select(
        fact.event_id,
        fact.user_id,
        fact.ts_ms,
        fact.value,
        dim.state.alias("state_at_purchase"),
        dim.version.alias("state_version"),
    )




def _oracle_scd2_over(source_cte: str, prefix: str) -> str:
    """The SCD2 CTE chain parameterized over its input relation —
    kept textually in sync with ORACLE_USER_STATE_SCD2 (which is this
    template applied to the full events table)."""
    return f"""
{prefix}_runs AS (
  SELECT user_id, event_type, ts, event_id,
         sum(CASE WHEN prev_type IS NULL OR prev_type <> event_type
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS version
  FROM (SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM {source_cte})
),
{prefix}_intervals AS (
  SELECT user_id, version,
         min(event_type) AS state,
         epoch_ms(min(ts)) AS valid_from_ms,
         count(*) AS n_events
  FROM {prefix}_runs
  GROUP BY user_id, version
),
{prefix}_scd2 AS (
  SELECT user_id, version, state, valid_from_ms,
         lead(valid_from_ms) OVER (PARTITION BY user_id
                                   ORDER BY version) AS valid_to_ms
  FROM {prefix}_intervals
)"""




ORACLE_PIT_ENRICH = (
    f"""
pit_obs AS (
  SELECT * FROM events WHERE event_type <> '{PIT_FACT_TYPE}'
),"""
    + _oracle_scd2_over("pit_obs", "pit")
    + f""",
pit_enrich AS (
  SELECT f.event_id, f.user_id,
         epoch_ms(f.ts) AS ts_ms,
         round(f.value, 4) AS value,
         d.state AS state_at_purchase,
         CAST(d.version AS BIGINT) AS state_version
  FROM events f
  LEFT JOIN pit_scd2 d
    ON f.user_id = d.user_id
   AND d.valid_from_ms <= epoch_ms(f.ts)
   AND (d.valid_to_ms IS NULL OR epoch_ms(f.ts) < d.valid_to_ms)
  WHERE f.event_type = '{PIT_FACT_TYPE}'
)"""
)

