"""[EXT] Temporal join operators over ``events`` — as-of join, bucketed
range join, and distribution stats (exact quantiles, approx distinct).

The reference has no time-series surface at all (its events are
implicit in order_number ordering, SURVEY.md §2 O2/A11); these are the
operators a large-scale event pipeline needs and Spark lacks as
built-ins. Both joins are expressed as compositions of existing
DataFrame ops (the (a) strategy from the build rules) — no UDFs, no
mapPartitions:

- **As-of join**: union-tag-window. Tag both streams, sort each user's
  timeline once, carry the reference stream's latest values forward
  with ``last(..., ignorenulls=True)``. ONE shuffle on user_id total —
  vs the naive inequality join which is O(n^2) per user and unrunnable
  at scale. This is the standard scalable as-of pattern (same shape
  kdb/Flink temporal joins lower to).
- **Range join**: time-bucketed equi-join. Replicate the probe side
  into the 3 adjacent buckets of width == the range, equi-join on
  (user_id, bucket), then filter the exact predicate. Candidate pairs
  are bounded per bucket instead of per user — the plan survives a
  hot user with a long history, and AQE can split any residual hot
  bucket. The oracle replays the semantics as a plain inequality join
  (fine at fixture scale, which is the point of the differential).

Determinism rules: every output timestamp is epoch millis (bigint);
tie-breaks are total (ts, tag, event_id); double aggregates follow the
repo float rule (round(4) both sides, or raw pass-through of stored
values).
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


#: quantile probes for the per-type value distribution.
QUANTILES = (0.5, 0.9, 0.99)


def type_value_quantiles(events: DataFrame) -> DataFrame:
    """Per-event-type distribution stats: exact p50/p90/p99 of value
    (linear interpolation — matches quantile_cont), count, exact
    distinct users. Exact percentiles need the group's values sorted —
    one shuffle on event_type; low-cardinality group keys are fine
    because values within a group spread across partitions first
    (partial aggregation) before the final per-key merge.
    """
    qcols = [
        F.round(F.percentile("value", F.lit(q)), 4).alias(
            f"p{int(q * 100)}"
        )
        for q in QUANTILES
    ]
    return (
        events.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("user_id").alias("n_users"),
            *qcols,
        )
    )


_QSEL = ", ".join(
    f"round(quantile_cont(value, {q}), 4) AS p{int(q * 100)}"
    for q in QUANTILES
)

ORACLE_TYPE_VALUE_QUANTILES = f"""
type_value_quantiles AS (
  SELECT event_type,
         count(*) AS n,
         count(DISTINCT user_id) AS n_users,
         {_QSEL}
  FROM events
  GROUP BY 1
)
"""


def cube_type_dow(events: DataFrame) -> DataFrame:
    """CUBE over (event_type, day-of-week): all four grouping sets in
    one pass — per-cell, per-type, per-dow, and grand total, tagged
    with grouping flags so consumers can tell a real NULL from a
    subtotal row. The multi-dim aggregation shape a metrics rollup
    uses; Spark expands the cube map-side, so it is still a single
    shuffle.
    """
    dow = F.dayofweek("ts").alias("dow")
    return (
        events.select("event_type", dow, "value")
        .cube("event_type", "dow")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.grouping("event_type").cast("int").alias("g_type"),
            F.grouping("dow").cast("int").alias("g_dow"),
        )
    )


ORACLE_CUBE_TYPE_DOW = """
cube_type_dow AS (
  SELECT event_type,
         CAST(dayofweek(ts) + 1 AS INT) AS dow,
         count(*) AS n_events,
         round(sum(value), 4) AS sum_value,
         CAST(GROUPING(event_type) AS INT) AS g_type,
         CAST(GROUPING(CAST(dayofweek(ts) + 1 AS INT)) AS INT) AS g_dow
  FROM events
  GROUP BY CUBE (event_type, CAST(dayofweek(ts) + 1 AS INT))
)
"""


#: regression time origin — x is seconds since the dataset epoch, not
#: raw epoch seconds: regr_slope's moment sums square x, and 1e9-scale
#: epochs push the partial sums to where partition order perturbs the
#: last retained digits. Centered x keeps the sums ~1e12, so the
#: round(4) contract holds on any partitioning.
TREND_EPOCH = "2024-01-01"


def user_value_trend(events: DataFrame) -> DataFrame:
    """Per-user linear trend of purchase value over time: OLS slope /
    intercept / correlation — one hash-agg, no Python, no window.

    Derived from explicit moment sums (n, Σx, Σy, Σxy, Σx², Σy²) with
    the identical expression replayed in the oracle, NOT the engines'
    ``regr_*`` built-ins: their incremental-moment algorithms disagree
    at ~1e-10 in slope, and the intercept amplifies that by x̄ (~1e6 s)
    past the round(4) contract. The x values are integral seconds, so
    Σx/Σx² are exact at any aggregation order, and the one division
    chain is shared — hash-stable by the repo float rule. Users with a
    single purchase get NULL slope/corr (zero x-variance), kept.
    """
    # x = WHOLE seconds since the dataset epoch (floor of millis):
    # integral doubles sum exactly in any order. unix_seconds here,
    # floor(epoch_ms/1000) in the oracle — DuckDB's epoch() keeps the
    # fractional part, which would diverge the moment sums.
    x = (
        F.unix_seconds("ts")
        - F.unix_seconds(F.lit(TREND_EPOCH).cast("timestamp"))
    ).cast("double")
    purchases = events.filter(
        F.col("event_type") == "purchase"
    ).select("user_id", F.col("value").alias("y"), x.alias("x"))
    sums = purchases.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    den_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    slope = num / F.nullif(den_x, F.lit(0.0))
    # + 0.0 normalizes IEEE -0.0 (a tiny negative rounds to -0.0 in
    # DuckDB, +0.0 here — same value, different hash text).
    return sums.select(
        "user_id",
        F.col("n").alias("n_purchases"),
        (F.round(slope, 4) + 0.0).alias("slope"),
        (
            F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 4)
            + 0.0
        ).alias("intercept"),
        (
            F.round(num / F.nullif(F.sqrt(den_x * den_y), F.lit(0.0)), 4)
            + 0.0
        ).alias("corr_value_time"),
    )


ORACLE_USER_VALUE_TREND = f"""
uvt_sums AS (
  SELECT user_id,
         CAST(count(*) AS DOUBLE) AS n,
         sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
         sum(x * x) AS sxx, sum(y * y) AS syy
  FROM (
    SELECT user_id, value AS y,
           CAST(floor(epoch_ms(ts) / 1000)
                - floor(epoch_ms(TIMESTAMP '{TREND_EPOCH}') / 1000)
                AS DOUBLE) AS x
    FROM events WHERE event_type = 'purchase'
  )
  GROUP BY 1
),
user_value_trend AS (
  SELECT user_id,
         CAST(n AS BIGINT) AS n_purchases,
         round((n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0.0), 4)
           + 0.0 AS slope,
         round((sy - ((n * sxy - sx * sy)
                      / nullif(n * sxx - sx * sx, 0.0)) * sx) / n, 4)
           + 0.0 AS intercept,
         round((n * sxy - sx * sy)
               / nullif(sqrt((n * sxx - sx * sx)
                             * (n * syy - sy * sy)), 0.0), 4)
           + 0.0 AS corr_value_time
  FROM uvt_sums
)
"""


def user_spend_deciles(events: DataFrame) -> DataFrame:
    """Rank users by total purchase spend: ntile decile, percent_rank,
    cume_dist — the ranking-window function family in one query. The
    ORDER BY includes user_id so ties rank deterministically on every
    engine and partitioning.

    Scale: the global rank comes from the ``ranking.global_ranked``
    kernel (range exchange + partition-local row_number + broadcast
    prefix offsets) — NO single-partition WindowExec anywhere in the
    plan; ntile/percent_rank/cume_dist derive from (rank, n) in
    closed form, exactly the SQL definitions for this unique order
    key, so the window-function oracle hash-matches unchanged.
    """
    spend = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.round(F.sum("value"), 4).alias("total_spend"))
    )
    ranked = _rank.global_ranked(
        spend, [F.col("total_spend").desc(), F.col("user_id")]
    )
    rk, n = F.col("_rk"), F.col("_n_total")
    return ranked.select(
        "user_id",
        "total_spend",
        _rank.ntile_expr(10, rk, n).alias("decile"),
        F.round(_rank.percent_rank_expr(rk, n), 4).alias("pct_rank"),
        F.round(_rank.cume_dist_expr(rk, n), 4).alias("cume"),
    )


ORACLE_USER_SPEND_DECILES = """
usd_spend AS (
  SELECT user_id, round(sum(value), 4) AS total_spend
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1
),
user_spend_deciles AS (
  SELECT user_id, total_spend,
         CAST(ntile(10) OVER w AS INT) AS decile,
         round(percent_rank() OVER w, 4) AS pct_rank,
         round(cume_dist() OVER w, 4) AS cume
  FROM usd_spend
  WINDOW w AS (ORDER BY total_spend DESC, user_id)
)
"""


#: declared error budget for the approx-distinct release: HLL++ at
#: rsd=0.02, flagged at 3*rsd (=6%) — a 3-sigma band the estimator
#: must stay inside on every group.
APPROX_DISTINCT_RSD = 0.02
APPROX_DISTINCT_ERR_BOUND_PCT = 6


def approx_distinct_users(events: DataFrame) -> DataFrame:
    """Per-type approximate distinct users (HyperLogLog++) next to the
    exact count, the relative error, and a ``within_bound`` flag at
    the declared 3*rsd budget. At 100 TB the approx column is the one
    you can afford — HLL sketches merge map-side in constant memory,
    where exact distinct shuffles every (type, user) pair.
    """
    out = events.groupBy("event_type").agg(
        F.approx_count_distinct(
            "user_id", rsd=APPROX_DISTINCT_RSD
        ).alias("n_users_approx"),
        F.countDistinct("user_id").alias("n_users_exact"),
    )
    rel_err = F.abs(
        F.col("n_users_approx") - F.col("n_users_exact")
    ) / F.col("n_users_exact")
    return out.select(
        "event_type",
        "n_users_approx",
        "n_users_exact",
        F.round(rel_err * 100, 4).alias("rel_err_pct"),
        F.lit(APPROX_DISTINCT_ERR_BOUND_PCT).alias("err_bound_pct"),
        (rel_err * 100 <= APPROX_DISTINCT_ERR_BOUND_PCT).alias(
            "within_bound"
        ),
    )


def approx_distinct_users_checked(events: DataFrame) -> DataFrame:
    """Oracle-checkable projection of ``approx_distinct_users``: the
    exact side plus the declared error bound and the bound flag. The
    raw HLL estimate is register-math-specific to the engine (DuckDB's
    HLL lands on different values), so the DIFFERENTIAL contract is:
    oracle computes the exact count and asserts ``within_bound`` TRUE
    — any estimator drift past the 3*rsd budget hash-mismatches. The
    estimate itself stays available via ``approx_distinct_users``; its
    error is additionally pinned by the rsd property test."""
    return approx_distinct_users(events).select(
        "event_type", "n_users_exact", "err_bound_pct", "within_bound"
    )


ORACLE_APPROX_DISTINCT_CHECKED = f"""
events_approx_distinct AS (
  SELECT event_type,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_exact,
         {APPROX_DISTINCT_ERR_BOUND_PCT} AS err_bound_pct,
         TRUE AS within_bound
  FROM events
  GROUP BY 1
)
"""


def user_interarrival_stats(events: DataFrame) -> DataFrame:
    """Per-user inter-arrival gap stats: event count, gap count, and
    the sum / max / mean of consecutive-event gaps in millis.

    One shuffle total: the lag window partitions by user_id, and the
    following groupBy reuses that partitioning (Catalyst sees the
    child's hash-partitioning satisfies the agg's distribution — no
    second exchange). Tie-break (ts_ms, event_id) is total, so lag is
    deterministic. avg_gap_ms is one division of two integrals —
    hash-stable under the repo float rule.
    """
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    gaps = events.select(
        "user_id",
        "event_id",
        F.unix_millis("ts").alias("ts_ms"),
    ).withColumn(
        "gap_ms", F.col("ts_ms") - F.lag("ts_ms").over(w)
    )
    return gaps.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.count("gap_ms").alias("n_gaps"),
        F.sum("gap_ms").alias("sum_gap_ms"),
        F.max("gap_ms").alias("max_gap_ms"),
        (F.sum("gap_ms") / F.count("gap_ms")).alias("avg_gap_ms"),
    )


ORACLE_USER_INTERARRIVAL = """
ia_gaps AS (
  SELECT user_id,
         ts_ms - lag(ts_ms) OVER (
             PARTITION BY user_id ORDER BY ts_ms, event_id
         ) AS gap_ms
  FROM (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms FROM events)
),
user_interarrival_stats AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(count(gap_ms) AS BIGINT) AS n_gaps,
         CAST(sum(gap_ms) AS BIGINT) AS sum_gap_ms,
         CAST(max(gap_ms) AS BIGINT) AS max_gap_ms,
         CAST(sum(gap_ms) AS BIGINT) / CAST(count(gap_ms) AS BIGINT)
           AS avg_gap_ms
  FROM ia_gaps
  GROUP BY 1
)
"""


#: pinned pivot domain — a pivot's output schema must never depend on
#: the data (an unpinned pivot triggers a collect-distinct job AND
#: makes the schema nondeterministic at 100 TB).
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def user_type_pivot(events: DataFrame) -> DataFrame:
    """Pivot (long->wide): per-user event counts, one column per event
    type. With the pinned value list this is a single hash-agg of
    conditional counts — same cost as the long groupBy, no
    distinct-scan, schema known at plan time.
    """
    return (
        events.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(EVENT_TYPES))
    )


_PIVOT_COLS = ",\n         ".join(
    f"CAST(coalesce(sum(CASE WHEN event_type = '{t}' THEN 1 END), 0)"
    f" AS BIGINT) AS {t}"
    for t in EVENT_TYPES
)

ORACLE_USER_TYPE_PIVOT = f"""
user_type_pivot AS (
  SELECT user_id,
         {_PIVOT_COLS}
  FROM events
  GROUP BY 1
)
"""


#: histogram bin width for the value column.
HIST_BIN_WIDTH = 25.0


def value_histogram(events: DataFrame) -> DataFrame:
    """Fixed-bin histogram of value per event_type: floor-division
    binning keeps everything in one hash-agg (map-side combinable);
    bin edges are data-independent so the plan is a single shuffle of
    (type, bin) partials at any scale.
    """
    bin_col = F.floor(F.col("value") / F.lit(HIST_BIN_WIDTH)).cast(
        "bigint"
    )
    return (
        events.groupBy("event_type", bin_col.alias("bin"))
        .agg(F.count("*").alias("n"))
        .withColumn("bin_lo", F.col("bin") * F.lit(HIST_BIN_WIDTH))
    )


ORACLE_VALUE_HISTOGRAM = f"""
value_histogram AS (
  SELECT event_type,
         CAST(floor(value / {HIST_BIN_WIDTH}) AS BIGINT) AS bin,
         CAST(count(*) AS BIGINT) AS n,
         CAST(floor(value / {HIST_BIN_WIDTH}) AS BIGINT)
           * CAST({HIST_BIN_WIDTH} AS DOUBLE) AS bin_lo
  FROM events
  GROUP BY 1, 2
)
"""


#: rolling-window width for the RANGE-frame query (trailing hour).
ROLLING_MS = 60 * 60 * 1000


def rolling_hour_stats(events: DataFrame) -> DataFrame:
    """Trailing-hour rolling stats per event via a RANGE window frame:
    for every event, the count and value-sum of the same user's events
    in the preceding hour (inclusive). RANGE frames bound by the
    ordering value — Spark keeps a sliding frame per partition, so this
    is the same single user_id shuffle as any per-user window; no
    self-join, no bucketing.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ms")
        .rangeBetween(-ROLLING_MS, 0)
    )
    return events.select(
        "event_id",
        "user_id",
        F.unix_millis("ts").alias("ts_ms"),
    ).select(
        "event_id",
        "user_id",
        "ts_ms",
        F.count("*").over(w).alias("n_trailing_hour"),
    )


ORACLE_ROLLING_HOUR = f"""
rh_base AS (
  SELECT event_id, user_id, epoch_ms(ts) AS ts_ms FROM events
),
rolling_hour_stats AS (
  SELECT event_id, user_id, ts_ms,
         CAST(count(*) OVER (
           PARTITION BY user_id ORDER BY ts_ms
           RANGE BETWEEN {ROLLING_MS} PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS n_trailing_hour
  FROM rh_base
)
"""


def retention_cohorts(events: DataFrame) -> DataFrame:
    """Cohort retention: users grouped by first-seen day, distinct
    active users per (cohort_day, day_offset), and the retention rate
    against the cohort's day-0 size.

    Two hash-aggs on user_id (both partial-aggregated map-side) and a
    tiny (cohort_day, offset) grid at the end — the per-user distinct
    day projection is the only row-heavy stage, and it shrinks the
    fact table to at most users x active-days before any join. The
    day-0 size rides a window over the final grid (cohort cardinality
    == #days, trivially small at any scale).
    """
    days = events.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    cohorts = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    grid = (
        days.join(cohorts, "user_id")
        .withColumn("day_offset", F.datediff("day", "cohort_day"))
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("active_users"))
    )
    w = Window.partitionBy("cohort_day")
    return grid.withColumn(
        "cohort_size",
        F.max(
            F.when(F.col("day_offset") == 0, F.col("active_users"))
        ).over(w),
    ).select(
        "cohort_day",
        "day_offset",
        "active_users",
        "cohort_size",
        F.round(
            F.col("active_users") / F.col("cohort_size").cast("double"), 6
        ).alias("retention_rate"),
    )


ORACLE_RETENTION_COHORTS = """
ret_days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
ret_cohort AS (
  SELECT user_id, min(day) AS cohort_day FROM ret_days GROUP BY 1
),
ret_grid AS (
  SELECT c.cohort_day,
         CAST(date_diff('day', c.cohort_day, d.day) AS INT) AS day_offset,
         CAST(count(DISTINCT d.user_id) AS BIGINT) AS active_users
  FROM ret_days d JOIN ret_cohort c USING (user_id)
  GROUP BY 1, 2
),
retention_cohorts AS (
  SELECT cohort_day, day_offset, active_users,
         CAST(max(CASE WHEN day_offset = 0 THEN active_users END)
           OVER (PARTITION BY cohort_day) AS BIGINT) AS cohort_size,
         round(active_users / CAST(max(CASE WHEN day_offset = 0
             THEN active_users END)
           OVER (PARTITION BY cohort_day) AS DOUBLE), 6) AS retention_rate
  FROM ret_grid
)
"""


#: winsorization bounds (clamp below p05, above p95).
WINSOR_LO = 0.05
WINSOR_HI = 0.95


def winsorized_stats(events: DataFrame) -> DataFrame:
    """Outlier-robust per-type value stats: clamp each value into its
    type's [p05, p95] (winsorization — the standard trim for heavy-
    tailed metric columns before training), then aggregate.

    Two stages sharing the event_type key: an exact-percentile agg
    (tiny: one row per type, broadcast back onto the fact), then the
    clamped re-aggregation. Percentiles and the final sum are rounded
    to 4 decimals — the repo float rule for cross-engine hash parity.
    """
    bounds = events.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(WINSOR_LO)), 4).alias("lo"),
        F.round(F.percentile("value", F.lit(WINSOR_HI)), 4).alias("hi"),
    )
    clamped = events.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        "lo",
        "hi",
        F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
        .alias("wv"),
        (F.col("value") < F.col("lo")).cast("int").alias("clo"),
        (F.col("value") > F.col("hi")).cast("int").alias("chi"),
    )
    return clamped.groupBy("event_type", "lo", "hi").agg(
        F.count("*").alias("n"),
        F.round(F.sum("wv"), 4).alias("winsorized_sum"),
        F.sum("clo").alias("n_clamped_low"),
        F.sum("chi").alias("n_clamped_high"),
    )


ORACLE_WINSORIZED_STATS = f"""
wz_bounds AS (
  SELECT event_type,
         round(quantile_cont(value, {WINSOR_LO}), 4) AS lo,
         round(quantile_cont(value, {WINSOR_HI}), 4) AS hi
  FROM events GROUP BY 1
),
winsorized_stats AS (
  SELECT e.event_type, b.lo, b.hi,
         count(*) AS n,
         round(sum(least(greatest(e.value, b.lo), b.hi)), 4)
           AS winsorized_sum,
         CAST(sum(CASE WHEN e.value < b.lo THEN 1 ELSE 0 END) AS BIGINT)
           AS n_clamped_low,
         CAST(sum(CASE WHEN e.value > b.hi THEN 1 ELSE 0 END) AS BIGINT)
           AS n_clamped_high
  FROM events e JOIN wz_bounds b USING (event_type)
  GROUP BY 1, 2, 3
)
"""


def user_type_unpivot(events: DataFrame) -> DataFrame:
    """Unpivot (wide->long): melt the per-user pivot back to
    (user_id, event_type, n_events) rows, zeros included — the inverse
    reshape, via the native ``unpivot`` operator (an Expand node: no
    join, no shuffle beyond the pivot's own agg)."""
    wide = user_type_pivot(events)
    return wide.unpivot(
        ["user_id"], list(EVENT_TYPES), "event_type", "n_events"
    )


_UNPIVOT_TYPES = ", ".join(f"'{t}'" for t in EVENT_TYPES)

ORACLE_USER_TYPE_UNPIVOT = f"""
utu_users AS (SELECT DISTINCT user_id FROM events),
utu_types AS (SELECT unnest([{_UNPIVOT_TYPES}]) AS event_type),
utu_counts AS (
  SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2
),
user_type_unpivot AS (
  SELECT u.user_id, t.event_type,
         CAST(coalesce(c.n, 0) AS BIGINT) AS n_events
  FROM utu_users u
  CROSS JOIN utu_types t
  LEFT JOIN utu_counts c USING (user_id, event_type)
)
"""


def daily_sketch_rollup(events: DataFrame) -> DataFrame:
    """Mergeable distinct-count sketches: per-(day, type) HLL sketches
    of user_id, unioned per type and estimated — the re-aggregatable
    pattern that makes 100 TB distinct counts incremental (store tiny
    daily sketches, merge any date range later without rescanning raw
    events; exact distinct can never merge).

    Rows-only check: sketch estimates are engine-specific; the
    error-bound test pins the estimate within HLL tolerance of exact.
    """
    daily = events.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.hll_sketch_agg("user_id").alias("sketch"))
    return daily.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sketch"))
        .cast("bigint")
        .alias("approx_users"),
    )


#: EWMA smoothing factor (as an exact double: 0.25 = 2^-2).
EWMA_ALPHA = 0.25


def user_value_ewma(events: DataFrame) -> DataFrame:
    """Per-user exponentially weighted moving average of value — the
    classic streaming smoother, computed batch-side as an explicit
    sequential fold: collect the user's (ts, event_id, value) series
    sorted, fold EWMA_t = a*x_t + (1-a)*EWMA_{t-1}.

    A fold has a DEFINED evaluation order, so the double arithmetic is
    bit-identical in any engine (unlike sum(), whose accumulation
    order is partition-dependent) — no rounding rule needed. One
    shuffle on user_id; per-user state is the history array, bounded
    by user activity (the same bound a stateful-streaming EWMA
    carries).
    """
    series = events.groupBy("user_id").agg(
        F.expr(
            "aggregate("
            " transform(array_sort(collect_list("
            "   struct(unix_millis(ts) AS ts_ms, event_id, value))),"
            "   s -> s.value),"
            " CAST(NULL AS DOUBLE),"
            f" (acc, x) -> CASE WHEN acc IS NULL THEN x"
            f"  ELSE {EWMA_ALPHA} * x + {1 - EWMA_ALPHA} * acc END)"
        ).alias("ewma_value"),
        F.count("*").alias("n_events"),
    )
    return series


ORACLE_USER_VALUE_EWMA = f"""
ewma_series AS (
  SELECT user_id,
         array_agg(value ORDER BY ts, event_id) AS xs,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1
),
user_value_ewma AS (
  SELECT user_id,
         list_reduce(xs,
           (acc, x) -> {EWMA_ALPHA} * x + {1 - EWMA_ALPHA} * acc)
           AS ewma_value,
         n_events
  FROM ewma_series
)
"""


#: equal-frequency binning: quartiles per event_type.
N_VALUE_BINS = 4


def value_quartile_bins(events: DataFrame) -> DataFrame:
    """Equal-frequency discretization: assign each event its per-type
    value quartile via ntile over a total order (value, event_id), then
    report per-bin occupancy and value range — the quantile-discretizer
    feature transform, shuffle = one window on event_type.
    """
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    binned = events.select(
        "event_type", "value", "event_id"
    ).withColumn("bin", F.ntile(N_VALUE_BINS).over(w))
    return binned.groupBy("event_type", "bin").agg(
        F.count("*").alias("n"),
        F.round(F.min("value"), 4).alias("lo"),
        F.round(F.max("value"), 4).alias("hi"),
    )


ORACLE_VALUE_QUARTILE_BINS = f"""
vqb AS (
  SELECT event_type, value,
         ntile({N_VALUE_BINS}) OVER (
           PARTITION BY event_type ORDER BY value, event_id) AS bin
  FROM events
),
value_quartile_bins AS (
  SELECT event_type, CAST(bin AS INT) AS bin, count(*) AS n,
         round(min(value), 4) AS lo, round(max(value), 4) AS hi
  FROM vqb GROUP BY 1, 2
)
"""


#: anomaly rule: |z| against the trailing-hour window, min samples.
ANOMALY_Z_THRESH = 1.5
ANOMALY_MIN_N = 5
#: anomaly baseline window: 72 h (hourly windows are too sparse for a
#: stable baseline at this fixture's ~2 events/user/day).
ANOMALY_WINDOW_MS = 72 * 3600 * 1000


def rolling_zscore_anomalies(events: DataFrame) -> DataFrame:
    """Rolling z-score anomaly detection: each event scored against
    its user 72-hour baseline via integer-exact moments (value-millis
    sum and sum-of-squares over a RANGE frame are BIGINTs — no float
    accumulation-order dependence), then flagged on |z| > threshold.

    The z computation — mean/variance from integral sums, one sqrt,
    one division — is a fixed op sequence on exact inputs, so both
    engines agree without rounding. Same single user_id shuffle as any
    per-user window; emits only the anomalous rows.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ms")
        .rangeBetween(-ANOMALY_WINDOW_MS, -1)
    )
    base = events.select(
        "event_id",
        "user_id",
        F.unix_millis("ts").alias("ts_ms"),
        F.floor(F.col("value") * 1000).cast("bigint").alias("v_mil"),
    )
    stats = base.select(
        "event_id",
        "user_id",
        "ts_ms",
        "v_mil",
        F.count("*").over(w).alias("n_prev"),
        F.sum("v_mil").over(w).alias("s1"),
        F.sum(F.col("v_mil") * F.col("v_mil")).over(w).alias("s2"),
    ).filter(F.col("n_prev") >= ANOMALY_MIN_N)
    mean = F.col("s1") / F.col("n_prev").cast("double")
    var = (
        F.col("s2") / F.col("n_prev").cast("double") - mean * mean
    )
    z = (F.col("v_mil") - mean) / F.sqrt(var)
    # var > 0 guard: a zero-variance window would make z NaN/inf, and
    # NaN ordering semantics differ across engines (DuckDB ranks NaN
    # above all values; Spark comparisons return false).
    return (
        stats.withColumn("var", var)
        .filter(F.col("var") > 0)
        .withColumn("z", z)
        .filter(F.col("z") * F.col("z") > ANOMALY_Z_THRESH**2)
        .select(
            "event_id", "user_id", "n_prev",
            F.round("z", 4).alias("zscore"),
        )
    )


ORACLE_ROLLING_ZSCORE = f"""
az_base AS (
  SELECT event_id, user_id, epoch_ms(ts) AS ts_ms,
         CAST(floor(value * 1000) AS BIGINT) AS v_mil
  FROM events
),
az_stats AS (
  SELECT event_id, user_id, v_mil,
         CAST(count(*) OVER w AS BIGINT) AS n_prev,
         CAST(sum(v_mil) OVER w AS BIGINT) AS s1,
         CAST(sum(v_mil * v_mil) OVER w AS BIGINT) AS s2
  FROM az_base
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms
               RANGE BETWEEN {ANOMALY_WINDOW_MS} PRECEDING AND 1 PRECEDING)
),
rolling_zscore_anomalies AS (
  SELECT event_id, user_id, n_prev,
         round((v_mil - s1 / CAST(n_prev AS DOUBLE))
           / sqrt(s2 / CAST(n_prev AS DOUBLE)
                  - (s1 / CAST(n_prev AS DOUBLE))
                    * (s1 / CAST(n_prev AS DOUBLE))), 4) AS zscore
  FROM az_stats
  WHERE n_prev >= {ANOMALY_MIN_N}
    AND (s2 / CAST(n_prev AS DOUBLE)
         - (s1 / CAST(n_prev AS DOUBLE))
           * (s1 / CAST(n_prev AS DOUBLE))) > 0
    AND ((v_mil - s1 / CAST(n_prev AS DOUBLE))
           / sqrt(s2 / CAST(n_prev AS DOUBLE)
                  - (s1 / CAST(n_prev AS DOUBLE))
                    * (s1 / CAST(n_prev AS DOUBLE))))
        * ((v_mil - s1 / CAST(n_prev AS DOUBLE))
           / sqrt(s2 / CAST(n_prev AS DOUBLE)
                  - (s1 / CAST(n_prev AS DOUBLE))
                    * (s1 / CAST(n_prev AS DOUBLE))))
        > {ANOMALY_Z_THRESH**2}
)
"""


#: incremental-rollup split point: days before this are the "standing"
#: aggregate, days at/after are the delta batch.
ROLLUP_CUTOFF_DAY = "2024-01-24"


def incremental_rollup(
    events: DataFrame, cutoff_day: str = ROLLUP_CUTOFF_DAY
) -> DataFrame:
    """Algebraic rollup maintenance: merge a standing per-(day, type)
    aggregate with a new delta batch WITHOUT rescanning the base rows.

    The 100 TB dashboard-maintenance pattern: keep partial aggregates
    (count, integer-millis sum, min, max — all commutative monoids) per
    partition key; when a new day of data lands, aggregate just the
    delta and fold it in (counts add, sums add, min/max re-min/max).
    The base table is never re-read — here both halves derive from the
    fixture only so the oracle can prove losslessness: recomputing the
    rollup from ALL raw rows hash-equals the merged form. Value sums
    use integer millis (the repo's exact-moments rule) so merge order
    cannot perturb a float accumulation.
    """
    cutoff = F.lit(cutoff_day).cast("date")
    v_mil = F.floor(F.col("value") * 1000).cast("bigint")

    def partial(df: DataFrame) -> DataFrame:
        return (
            df.select(
                F.to_date("ts").alias("day"),
                "event_type",
                v_mil.alias("v_mil"),
            )
            .groupBy("day", "event_type")
            .agg(
                F.count("*").alias("n"),
                F.sum("v_mil").alias("v_mil_sum"),
                F.min("v_mil").alias("v_mil_min"),
                F.max("v_mil").alias("v_mil_max"),
            )
        )

    base = partial(events.filter(F.to_date("ts") < cutoff))
    delta = partial(events.filter(F.to_date("ts") >= cutoff))
    return (
        base.unionByName(delta)
        .groupBy("day", "event_type")
        .agg(
            F.sum("n").alias("n"),
            F.sum("v_mil_sum").alias("v_mil_sum"),
            F.min("v_mil_min").alias("v_mil_min"),
            F.max("v_mil_max").alias("v_mil_max"),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day_str"),
            "event_type",
            "n",
            "v_mil_sum",
            "v_mil_min",
            "v_mil_max",
        )
    )


#: the oracle recomputes the rollup from the raw rows in one pass —
#: hash-equality with the merged two-phase form proves the partial
#: aggregates are lossless under merge.
ORACLE_INCREMENTAL_ROLLUP = """
incremental_rollup AS (
  SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day_str,
         event_type,
         count(*) AS n,
         CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT)
           AS v_mil_sum,
         min(CAST(floor(value * 1000) AS BIGINT)) AS v_mil_min,
         max(CAST(floor(value * 1000) AS BIGINT)) AS v_mil_max
  FROM events
  GROUP BY 1, 2
)
"""


def hourly_ohlc(events: DataFrame) -> DataFrame:
    """OHLC downsampling: per (hour, event_type) open / high / low /
    close of ``value`` — the canonical time-series compaction (a 100 TB
    tick stream becomes a dashboard-sized bar table).

    One hash-agg: open/close are ``min_by``/``max_by`` over the
    (ts, event_id) event-time order (total order — event_id breaks ts
    ties deterministically, same rule as the reference's
    order-sensitive A11 'last'), high/low plain min/max. No window, no
    sort — at scale this is a pure partial+final aggregation on the
    (hour, type) key. The order key is encoded as ONE bigint
    (ms * 10^6 + event_id — DuckDB's arg_min/arg_max take scalar keys
    only); event_id stays below 10^6 at every fixture scale and epoch
    millis * 10^6 fits in a signed 64-bit well past 2200.
    """
    key = F.unix_millis("ts") * F.lit(1_000_000) + F.col("event_id")
    return (
        events.groupBy(
            F.unix_millis(F.date_trunc("hour", "ts")).alias("hour_ms"),
            "event_type",
        )
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            F.count("*").alias("n_ticks"),
        )
    )


ORACLE_HOURLY_OHLC = """
hourly_ohlc AS (
  SELECT epoch_ms(date_trunc('hour', ts)) AS hour_ms,
         event_type,
         arg_min(value, epoch_ms(ts) * 1000000 + event_id) AS open,
         max(value) AS high,
         min(value) AS low,
         arg_max(value, epoch_ms(ts) * 1000000 + event_id) AS close,
         count(*) AS n_ticks
  FROM events
  GROUP BY 1, 2
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


#: MAD outlier rule: |x - median| > K * MAD (the robust-statistics
#: convention; 3 approximates "3 sigma" for normal data x 1.4826).
MAD_K = 3.0


def mad_outlier_stats(events: DataFrame) -> DataFrame:
    """Robust per-type outlier detection via Median Absolute Deviation
    — the heavy-tail-safe alternative to z-scores (mean/stddev are
    themselves dragged by the outliers they're meant to find).

    Two grouped exact-percentile aggregations (median of value, then
    median of |value - median|), then one conditional count against
    the broadcast per-type thresholds. Three passes over the events
    scan, each a hash-agg on event_type (a handful of groups — the
    shuffles move only group-sized state). Exact medians at 100 TB
    would switch to ``approx_percentile`` sketches; the plan shape is
    unchanged, which is why the exact form is the right oracle here.
    Medians round(4) per the repo float rule.
    """
    med = events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = (
        events.join(F.broadcast(med), "event_type")
        .select(
            "event_type", F.abs(F.col("value") - F.col("med")).alias("d")
        )
        .groupBy("event_type")
        .agg(F.expr("percentile(d, 0.5)").alias("mad"))
    )
    stats = med.join(dev, "event_type")
    return (
        events.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.min("med"), 4).alias("median"),
            F.round(F.min("mad"), 4).alias("mad"),
            F.sum(
                (
                    F.abs(F.col("value") - F.col("med"))
                    > F.lit(MAD_K) * F.col("mad")
                ).cast("long")
            ).alias("n_outliers"),
            F.count("*").alias("n_events"),
        )
    )


ORACLE_MAD_OUTLIERS = f"""
mad_med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med FROM events GROUP BY 1
),
mad_dev AS (
  SELECT e.event_type, quantile_cont(abs(e.value - m.med), 0.5) AS mad
  FROM events e JOIN mad_med m USING (event_type)
  GROUP BY 1
),
mad_outlier_stats AS (
  SELECT e.event_type,
         round(min(m.med), 4) AS median,
         round(min(d.mad), 4) AS mad,
         CAST(sum(CASE WHEN abs(e.value - m.med) > {MAD_K} * d.mad
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events e
  JOIN mad_med m USING (event_type)
  JOIN mad_dev d USING (event_type)
  GROUP BY 1
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
# sketch-based quantiles: the 100 TB path next to the exact anchor
# ---------------------------------------------------------------------------

#: approx_percentile accuracy knob: error <= 1/accuracy of rank.
APPROX_Q_ACCURACY = 10_000


def approx_type_quantiles(events: DataFrame) -> DataFrame:
    """Per-event-type APPROXIMATE p50/p90/p99 via Spark's
    ``approx_percentile`` (Greenwald-Khanna style mergeable quantile
    sketch). This is the 100 TB form of ``type_value_quantiles``:
    exact percentiles materialize each group's sorted values at the
    final aggregation, while the sketch keeps O(accuracy) state per
    group and merges associatively map-side — the shuffle carries
    sketches, not data. Rank error is bounded by n / accuracy.

    No cross-engine oracle (sketch internals are engine-specific) ->
    rows-only driver check; the error-bound test vs the exact anchor
    (``tests/test_properties.py``) is the correctness rail.
    """
    q_array = "array(" + ", ".join(str(q) for q in QUANTILES) + ")"
    return (
        events.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.expr(
                f"approx_percentile(value, {q_array}, {APPROX_Q_ACCURACY})"
            ).alias("qs"),
        )
        .select(
            "event_type",
            "n",
            *[
                F.round(F.col("qs")[i], 4).alias(f"ap{int(q * 100)}")
                for i, q in enumerate(QUANTILES)
            ],
        )
    )


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


def weekly_growth(events: DataFrame) -> DataFrame:
    """Period-over-period reporting: weekly revenue per event type
    with week-over-week absolute and percent change — the standard
    BI growth query. One hash-agg to the tiny (type, week) grid, then
    a lag window over the grid (grid-sized, not fact-sized — the
    window shuffle moves a few dozen rows no matter how large the
    fact is). Percent change divides the ROUNDED revenues so both
    engines divide identical inputs; first week per type is null.
    """
    weekly = events.groupBy(
        "event_type",
        F.unix_millis(F.date_trunc("week", F.col("ts"))).alias("week_ms"),
    ).agg(
        F.round(F.sum("value"), 4).alias("revenue"),
        F.count("*").alias("n_events"),
    )
    w = Window.partitionBy("event_type").orderBy("week_ms")
    prev = F.lag("revenue").over(w)
    return weekly.select(
        "event_type",
        "week_ms",
        "revenue",
        "n_events",
        F.round(F.col("revenue") - prev, 4).alias("wow_change"),
        F.round((F.col("revenue") - prev) / prev, 6).alias("wow_pct"),
    )


ORACLE_WEEKLY_GROWTH = """
wg_weekly AS (
  SELECT event_type,
         epoch_ms(date_trunc('week', ts)) AS week_ms,
         round(sum(value), 4) AS revenue,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events
  GROUP BY 1, 2
),
weekly_growth AS (
  SELECT event_type, week_ms, revenue, n_events,
         round(revenue - lag(revenue) OVER w, 4) AS wow_change,
         round((revenue - lag(revenue) OVER w)
               / NULLIF(lag(revenue) OVER w, 0), 6) AS wow_pct
  FROM wg_weekly
  WINDOW w AS (PARTITION BY event_type ORDER BY week_ms)
)
"""


# ---------------------------------------------------------------------------
# A/B experiment analysis
# ---------------------------------------------------------------------------

#: deterministic variant assignment: user_id parity (production would
#: hash a salt+user key; the analysis plan is identical).
AB_METRIC_TYPE = "purchase"


def ab_test_report(events: DataFrame) -> DataFrame:
    """A/B experiment readout: users split into two variants by key
    parity, per-user purchase totals as the metric, and the two-sample
    Welch z statistic on the variant means — the standard experiment
    dashboard row.

    Two hash-aggs: user grain (uniform key), then variant grain (2
    groups, conditional aggregation folds both variants into one
    pass). The z-score arithmetic runs on the ALREADY-ROUNDED moments
    so both engines divide identical inputs. At 100 TB nothing
    changes: per-user state is one partial sum, the variant rollup is
    2 rows.
    """
    per_user = (
        events.filter(F.col("event_type") == AB_METRIC_TYPE)
        .groupBy("user_id")
        .agg(F.round(F.sum("value"), 4).alias("user_total"))
        .withColumn("variant", (F.col("user_id") % 2).cast("int"))
    )
    g = per_user.groupBy().agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("n1"),
        F.round(
            F.avg(F.when(F.col("variant") == 0, F.col("user_total"))), 6
        ).alias("mean0"),
        F.round(
            F.avg(F.when(F.col("variant") == 1, F.col("user_total"))), 6
        ).alias("mean1"),
        F.round(
            F.var_samp(
                F.when(F.col("variant") == 0, F.col("user_total"))
            ),
            6,
        ).alias("var0"),
        F.round(
            F.var_samp(
                F.when(F.col("variant") == 1, F.col("user_total"))
            ),
            6,
        ).alias("var1"),
    )
    return g.select(
        "n0",
        "n1",
        "mean0",
        "mean1",
        F.round(F.col("mean1") - F.col("mean0"), 6).alias("lift"),
        F.round(
            (F.col("mean1") - F.col("mean0"))
            / F.sqrt(F.col("var0") / F.col("n0") + F.col("var1") / F.col("n1")),
            6,
        ).alias("welch_z"),
    )


ORACLE_AB_TEST = f"""
ab_user AS (
  SELECT user_id,
         round(sum(value), 4) AS user_total,
         CAST(user_id % 2 AS INTEGER) AS variant
  FROM events WHERE event_type = '{AB_METRIC_TYPE}'
  GROUP BY user_id
),
ab_g AS (
  SELECT CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n0,
         CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n1,
         round(avg(CASE WHEN variant = 0 THEN user_total END), 6)
           AS mean0,
         round(avg(CASE WHEN variant = 1 THEN user_total END), 6)
           AS mean1,
         round(var_samp(CASE WHEN variant = 0 THEN user_total END), 6)
           AS var0,
         round(var_samp(CASE WHEN variant = 1 THEN user_total END), 6)
           AS var1
  FROM ab_user
),
ab_test AS (
  SELECT n0, n1, mean0, mean1,
         round(mean1 - mean0, 6) AS lift,
         round((mean1 - mean0)
               / NULLIF(sqrt(var0 / NULLIF(n0, 0)
                             + var1 / NULLIF(n1, 0)), 0), 6) AS welch_z
  FROM ab_g
)
"""


def rfm_segments(events: DataFrame) -> DataFrame:
    """RFM customer segmentation — the classic marketing rollup:
    per-user Recency (ms since last purchase, against the corpus max
    ts), Frequency (purchase count), Monetary (purchase total), each
    discretized into quintiles, plus the composed 3-digit segment
    code. One fact hash-agg to the user grain; the corpus max is a
    broadcast 1-row agg; each quintile comes from the distributed
    ``ranking.global_ranked`` kernel (range exchange + local
    row_number + broadcast offsets) with the exact closed-form ntile —
    no single-partition sort at any |users|, and the window-ntile
    oracle hash-matches because the order keys are tie-broken unique.
    """
    purchases = events.filter(F.col("event_type") == AB_METRIC_TYPE)
    per_user = purchases.groupBy("user_id").agg(
        F.unix_millis(F.max("ts")).alias("last_ms"),
        F.count("*").alias("frequency"),
        F.round(F.sum("value"), 4).alias("monetary"),
    )
    corpus_max = purchases.agg(
        F.unix_millis(F.max("ts")).alias("corpus_max_ms")
    )
    enriched = per_user.join(F.broadcast(corpus_max)).withColumn(
        "recency_ms", F.col("corpus_max_ms") - F.col("last_ms")
    )
    # quintile ranks: recency ASC (small gap = best), freq/monetary
    # DESC (ties broken by user_id for determinism). Three chained
    # global_ranked passes — each a range exchange + local window, no
    # single-partition sort; the kernel preserves every input column
    # so the three ranks accumulate without self-joins.
    cur = enriched.select(
        "user_id", "recency_ms", "frequency", "monetary"
    )
    for score, order in (
        ("r_score", [F.col("recency_ms"), F.col("user_id")]),
        ("f_score", [F.desc("frequency"), F.col("user_id")]),
        ("m_score", [F.desc("monetary"), F.col("user_id")]),
    ):
        ranked = _rank.global_ranked(cur, order)
        cur = ranked.withColumn(
            score,
            _rank.ntile_expr(5, F.col("_rk"), F.col("_n_total")),
        ).drop("_rk", "_n_total")
    return cur.withColumn(
        "segment",
        F.concat_ws(
            "", F.col("r_score"), F.col("f_score"), F.col("m_score")
        ),
    )


ORACLE_RFM_SEGMENTS = f"""
rfm_user AS (
  SELECT user_id,
         epoch_ms(max(ts)) AS last_ms,
         CAST(count(*) AS BIGINT) AS frequency,
         round(sum(value), 4) AS monetary
  FROM events WHERE event_type = '{AB_METRIC_TYPE}'
  GROUP BY user_id
),
rfm_scored AS (
  SELECT user_id,
         (SELECT epoch_ms(max(ts)) FROM events
          WHERE event_type = '{AB_METRIC_TYPE}') - last_ms AS recency_ms,
         frequency, monetary
  FROM rfm_user
),
rfm_segments AS (
  SELECT user_id, recency_ms, frequency, monetary,
         CAST(ntile(5) OVER (ORDER BY recency_ms, user_id) AS INT)
           AS r_score,
         CAST(ntile(5) OVER (ORDER BY frequency DESC, user_id) AS INT)
           AS f_score,
         CAST(ntile(5) OVER (ORDER BY monetary DESC, user_id) AS INT)
           AS m_score,
         CAST(ntile(5) OVER (ORDER BY recency_ms, user_id) AS VARCHAR)
           || CAST(ntile(5) OVER (ORDER BY frequency DESC, user_id)
                   AS VARCHAR)
           || CAST(ntile(5) OVER (ORDER BY monetary DESC, user_id)
                   AS VARCHAR) AS segment
  FROM rfm_scored
)
"""


#: rolling-DAU window length (days): each event contributes to the
#: windows ENDING on its day .. day+6 — amplification factor equals
#: the window/slide ratio (7), a constant, not a data-dependent blowup.
ROLLING_DAU_DAYS = 7


def rolling_active_users(events: DataFrame) -> DataFrame:
    """Rolling 7-day distinct active users per day — the DAU/WAU
    staple. COUNT(DISTINCT) cannot run inside a sliding window frame,
    so the scale-correct form is explode-amplification: each event
    emits one row per window-END day it falls into (exactly 7, the
    window/slide ratio), then one distinct-agg per day. The shuffle
    carries (day, user) pairs — 7x the event count pre-combine,
    deduplicated map-side by the partial distinct. Edge windows
    (fewer than 7 days of data) are reported as-is; the oracle
    mirrors them.
    """
    day = F.date_trunc("day", F.col("ts").cast("timestamp"))
    amplified = events.select(
        "user_id",
        F.explode(
            F.sequence(
                day,
                day + F.expr(f"INTERVAL {ROLLING_DAU_DAYS - 1} DAYS"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("win_end"),
    )
    return (
        amplified.groupBy(F.unix_millis("win_end").alias("win_end_ms"))
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


ORACLE_ROLLING_DAU = f"""
rdau_amplified AS (
  SELECT user_id,
         unnest(generate_series(
           date_trunc('day', ts),
           date_trunc('day', ts)
             + INTERVAL {ROLLING_DAU_DAYS - 1} DAY,
           INTERVAL 1 DAY)) AS win_end
  FROM events
),
rolling_dau AS (
  SELECT epoch_ms(win_end) AS win_end_ms,
         CAST(count(DISTINCT user_id) AS BIGINT) AS active_users
  FROM rdau_amplified
  GROUP BY 1
)
"""


#: ordered funnel steps (first-touch timestamps must be increasing).
FUNNEL_STEPS = ("signup", "click", "purchase")


def user_funnel(events: DataFrame) -> DataFrame:
    """User-level ordered funnel across event types: how many users
    reached signup -> click -> purchase IN ORDER (first-touch
    timestamps strictly increasing step to step). One conditional
    min-agg per user (every step's first-touch in a single hash-agg
    pass), then a 1-row conditional rollup — no joins, no windows;
    the classic product-analytics funnel at fact-scan cost.
    """
    firsts = events.groupBy("user_id").agg(
        *[
            F.min(
                F.when(
                    F.col("event_type") == s, F.unix_millis("ts")
                )
            ).alias(f"t_{s}")
            for s in FUNNEL_STEPS
        ]
    )
    s0, s1, s2 = [f"t_{s}" for s in FUNNEL_STEPS]
    reached1 = F.col(s0).isNotNull()
    reached2 = reached1 & F.col(s1).isNotNull() & (F.col(s0) < F.col(s1))
    reached3 = reached2 & F.col(s2).isNotNull() & (F.col(s1) < F.col(s2))
    return firsts.agg(
        F.count("*").alias("n_users"),
        F.sum(reached1.cast("bigint")).alias("step1_signup"),
        F.sum(reached2.cast("bigint")).alias("step2_click"),
        F.sum(reached3.cast("bigint")).alias("step3_purchase"),
    )


ORACLE_USER_FUNNEL = """
uf_firsts AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup'
                  THEN epoch_ms(ts) END) AS t_signup,
         min(CASE WHEN event_type = 'click'
                  THEN epoch_ms(ts) END) AS t_click,
         min(CASE WHEN event_type = 'purchase'
                  THEN epoch_ms(ts) END) AS t_purchase
  FROM events GROUP BY user_id
),
user_funnel AS (
  SELECT CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(CASE WHEN t_signup IS NOT NULL
                       THEN 1 ELSE 0 END) AS BIGINT) AS step1_signup,
         CAST(sum(CASE WHEN t_signup IS NOT NULL
                        AND t_click IS NOT NULL
                        AND t_signup < t_click
                       THEN 1 ELSE 0 END) AS BIGINT) AS step2_click,
         CAST(sum(CASE WHEN t_signup IS NOT NULL
                        AND t_click IS NOT NULL
                        AND t_signup < t_click
                        AND t_purchase IS NOT NULL
                        AND t_click < t_purchase
                       THEN 1 ELSE 0 END) AS BIGINT) AS step3_purchase
  FROM uf_firsts
)
"""


#: PSI drift bins over value (fixture values are unit-scale).
PSI_BIN_WIDTH = 20.0
PSI_SPLIT_TS = "2024-01-16"


def psi_drift_report(events: DataFrame) -> DataFrame:
    """Population Stability Index between the first and second half of
    the event stream — the ML-ops drift monitor for a scoring
    feature. Per fixed-width value bin: reference share (before the
    split date), current share (after), and the bin's PSI term
    ``(p_cur - p_ref) * ln(p_cur / p_ref)``; the report's total is
    the sum. Counts aggregate in ONE conditional pass (bin x side in
    the same hash-agg); shares divide integer counts, and ln runs on
    the ratio of ALREADY-ROUNDED shares so both engines see identical
    inputs. Bins present on only one side are reported with a null
    term (the production alert case) instead of an infinite one.
    """
    side_cur = (F.col("ts") >= F.lit(PSI_SPLIT_TS)).cast("bigint")
    binned = events.groupBy(
        F.floor(F.col("value") / PSI_BIN_WIDTH).cast("bigint").alias("bin")
    ).agg(
        F.sum(1 - side_cur).alias("n_ref"),
        F.sum(side_cur).alias("n_cur"),
    )
    totals = binned.agg(
        F.sum("n_ref").alias("tot_ref"), F.sum("n_cur").alias("tot_cur")
    )
    shared = binned.join(F.broadcast(totals))
    p_ref = F.round(F.col("n_ref") / F.col("tot_ref"), 6)
    p_cur = F.round(F.col("n_cur") / F.col("tot_cur"), 6)
    term = F.when(
        (F.col("n_ref") > 0) & (F.col("n_cur") > 0),
        F.round((p_cur - p_ref) * F.log(p_cur / p_ref), 6),
    )
    return shared.select(
        "bin",
        "n_ref",
        "n_cur",
        p_ref.alias("p_ref"),
        p_cur.alias("p_cur"),
        term.alias("psi_term"),
    )


ORACLE_PSI_DRIFT = f"""
psi_binned AS (
  SELECT CAST(floor(value / {PSI_BIN_WIDTH}) AS BIGINT) AS bin,
         CAST(sum(CASE WHEN ts >= '{PSI_SPLIT_TS}'
                       THEN 0 ELSE 1 END) AS BIGINT) AS n_ref,
         CAST(sum(CASE WHEN ts >= '{PSI_SPLIT_TS}'
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
  FROM events GROUP BY 1
),
psi_tot AS (
  SELECT sum(n_ref) AS tot_ref, sum(n_cur) AS tot_cur FROM psi_binned
),
psi_drift AS (
  SELECT bin, n_ref, n_cur,
         round(CAST(n_ref AS DOUBLE) / tot_ref, 6) AS p_ref,
         round(CAST(n_cur AS DOUBLE) / tot_cur, 6) AS p_cur,
         CASE WHEN n_ref > 0 AND n_cur > 0 THEN
           round((round(CAST(n_cur AS DOUBLE) / tot_cur, 6)
                  - round(CAST(n_ref AS DOUBLE) / tot_ref, 6))
                 * ln(round(CAST(n_cur AS DOUBLE) / tot_cur, 6)
                      / round(CAST(n_ref AS DOUBLE) / tot_ref, 6)), 6)
         END AS psi_term
  FROM psi_binned, psi_tot
)
"""


#: attribution lookback (ms): clicks within this window before a
#: purchase share its value equally.
ATTR_WINDOW_MS = 3_600_000


def linear_attribution(events: DataFrame) -> DataFrame:
    """Linear multi-touch attribution: every purchase distributes its
    value EQUALLY across the same user's clicks in the preceding hour;
    a click's attributed revenue is the sum of its shares across all
    purchases it assisted. The canonical marketing-attribution rollup.

    Plan: the purchase-click pairing is the bounded range join —
    per-user equi-join on (user_id, hour bucket in {h-1, h}) then the
    exact window filter, so candidates are bounded per bucket, never
    per user history. The per-purchase assist count is one hash-agg on
    the purchase key (same shuffle family), credit is row-local
    integer-count division of the pre-rounded value, and the final
    per-click rollup sums credits. Click keys with zero assists simply
    don't appear (production would left-join the click dim back).
    """
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.unix_millis("ts").alias("p_ms"),
        F.round("value", 4).alias("p_value"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        F.col("user_id").alias("c_user"),
        F.unix_millis("ts").alias("c_ms"),
    )
    p_b = purchases.withColumn(
        "bucket",
        F.explode(
            F.array(
                (F.col("p_ms") / ATTR_WINDOW_MS).cast("bigint") - 1,
                (F.col("p_ms") / ATTR_WINDOW_MS).cast("bigint"),
            )
        ),
    )
    c_b = clicks.withColumn(
        "bucket", (F.col("c_ms") / ATTR_WINDOW_MS).cast("bigint")
    )
    # the explode gives two bucket rows per purchase; equi-join on the
    # bucket, exact window as the join residual
    pairs = p_b.join(c_b, ["bucket"]).filter(
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ms") <= F.col("p_ms"))
        & (F.col("p_ms") - F.col("c_ms") < ATTR_WINDOW_MS)
    )
    w = Window.partitionBy("p_id")
    credited = pairs.withColumn("n_assists", F.count("*").over(w)).select(
        "c_id",
        (F.col("p_value") / F.col("n_assists")).alias("credit"),
    )
    return credited.groupBy(F.col("c_id").alias("click_id")).agg(
        F.round(F.sum("credit"), 4).alias("attributed_value"),
        F.count("*").alias("n_purchases_assisted"),
    )


ORACLE_LINEAR_ATTRIBUTION = f"""
la_pairs AS (
  SELECT c.event_id AS c_id, p.event_id AS p_id,
         round(p.value, 4) AS p_value
  FROM events p
  JOIN events c
    ON p.user_id = c.user_id
   AND c.event_type = 'click'
   AND epoch_ms(c.ts) <= epoch_ms(p.ts)
   AND epoch_ms(p.ts) - epoch_ms(c.ts) < {ATTR_WINDOW_MS}
  WHERE p.event_type = 'purchase'
),
la_credit AS (
  SELECT c_id,
         p_value / count(*) OVER (PARTITION BY p_id) AS credit
  FROM la_pairs
),
linear_attribution AS (
  SELECT c_id AS click_id,
         round(sum(credit), 4) AS attributed_value,
         CAST(count(*) AS BIGINT) AS n_purchases_assisted
  FROM la_credit
  GROUP BY c_id
)
"""


#: Holt double-exponential smoothing constants.
HOLT_ALPHA = 0.5
HOLT_BETA = 0.3


def user_holt_forecast(events: DataFrame) -> DataFrame:
    """Holt double-exponential smoothing (level + trend) per user over
    the time-ordered value series, with a one-step-ahead forecast —
    the trend-aware upgrade of the EWMA operator (an EWMA lags a
    trending series forever; Holt's trend term closes the gap).

    The recursion is a LEFT FOLD over the user's ordered values:
    level' = a·v + (1-a)·(level + trend); trend' = b·(level'-level) +
    (1-b)·trend, seeded level=v0, trend=0. Both engines execute the
    identical fold (Spark ``aggregate``, DuckDB ``list_reduce``) over
    the identically-ordered array, so the doubles agree bit-for-bit
    and the rounded outputs hash-match — a recursive time-series
    model, exactly verified.

    Scale shape: one user_id shuffle (the collect_list agg); the fold
    is per-row compute over each user's own array. Per-user series
    length is the memory bound — for unbounded histories the same
    recurrence runs incrementally as the stateful-streaming form
    (``run_stream_stateful_spend``'s shape) with (level, trend) as
    the keyed state.
    """
    a, b = HOLT_ALPHA, HOLT_BETA
    series = (
        events.filter(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.expr(
                # full microsecond precision in the sort key — millis
                # truncation would order same-millisecond events
                # differently than the oracle's ORDER BY ts
                "transform(array_sort(collect_list(struct("
                "unix_micros(ts) AS ts_us, event_id, value))),"
                " s -> CAST(s.value AS DOUBLE))"
            ).alias("vs")
        )
    )
    lvl = f"({a}D * x.v + {1 - a}D * (acc.l + acc.t))"
    step = (
        f"(acc, x) -> struct({lvl} AS l,"
        f" {b}D * ({lvl} - acc.l) + {1 - b}D * acc.t AS t,"
        " x.v AS v)"
    )
    fold = (
        "aggregate(slice(sv, 2, size(sv) - 1),"
        " struct(sv[0].l AS l, sv[0].t AS t, sv[0].v AS v),"
        f" {step})"
    )
    return (
        series.withColumn(
            "sv",
            F.expr(
                "transform(vs, v -> struct(v AS l, CAST(0 AS DOUBLE)"
                " AS t, v AS v))"
            ),
        )
        .select(
            "user_id",
            F.size("vs").alias("n_events"),
            F.expr(f"round({fold}.l, 6)").alias("level"),
            F.expr(f"round({fold}.t, 6)").alias("trend"),
            F.expr(f"round({fold}.l + {fold}.t, 6)").alias(
                "forecast_next"
            ),
        )
    )


#: NB: this oracle is a RECURSIVE CTE (compose with recursive=True).
#: A ``list_reduce`` formulation would be the natural mirror of the
#: Spark fold, but DuckDB 1.0's list_reduce mutates struct accumulator
#: fields SEQUENTIALLY inside the lambda (the 't' expression observes
#: the already-updated 'l') — silently wrong for any cross-dependent
#: state. The row-per-step recursion below uses plain scalar
#: arithmetic in exactly the Spark fold's op order.
ORACLE_USER_HOLT = f"""
hseq AS (
  SELECT user_id, CAST(value AS DOUBLE) AS v,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS pos
  FROM events WHERE value IS NOT NULL
),
hn AS (SELECT user_id, max(pos) AS n FROM hseq GROUP BY 1),
hrec AS (
  SELECT user_id, pos, v AS l, CAST(0 AS DOUBLE) AS t
  FROM hseq WHERE pos = 1
  UNION ALL
  SELECT r.user_id, s.pos,
         {HOLT_ALPHA} * s.v + {1 - HOLT_ALPHA} * (r.l + r.t),
         {HOLT_BETA} * (({HOLT_ALPHA} * s.v
             + {1 - HOLT_ALPHA} * (r.l + r.t)) - r.l)
           + {1 - HOLT_BETA} * r.t
  FROM hrec r
  JOIN hseq s ON s.user_id = r.user_id AND s.pos = r.pos + 1
),
user_holt_forecast AS (
  SELECT r.user_id, CAST(hn.n AS INT) AS n_events,
         round(r.l, 6) AS level,
         round(r.t, 6) AS trend,
         round(r.l + r.t, 6) AS forecast_next
  FROM hrec r JOIN hn ON hn.user_id = r.user_id AND r.pos = hn.n
)
"""


#: Holt-Winters additive-seasonality constants (season length = 7,
#: the weekly cycle at the event stream's daily cadence).
HW_ALPHA = 0.5
HW_BETA = 0.3
HW_GAMMA = 0.2
HW_SEASON = 7


def user_holt_winters(events: DataFrame) -> DataFrame:
    """Holt-Winters triple exponential smoothing (level + trend +
    additive m=7 seasonality) per user — the top rung of the
    forecasting ladder (EWMA -> Holt -> Holt-Winters). Seasonal slots
    are indexed by series position mod m and start at zero, so the
    cycle is learned from the data; the recurrence is the standard
    additive form:

        nl = a*(v - s[i]) + (1-a)*(l + t)
        nt = b*(nl - l) + (1-b)*t
        s'[i] = g*(v - nl) + (1-g)*s[i]

    Executed as a left fold whose state is (l, t, season array, pos);
    the DuckDB oracle replays it as a row-per-step recursive CTE (the
    same scalar op order — see the Holt operator's note on why
    list_reduce cannot carry cross-dependent struct state), so the
    rounded outputs hash-match bit-for-bit.

    Scale shape identical to Holt: one user_id shuffle, per-row fold;
    the m-length seasonal state adds O(m) per step, constant memory.
    """
    a, b, g, m = HW_ALPHA, HW_BETA, HW_GAMMA, HW_SEASON
    series = (
        events.filter(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct("
                "unix_micros(ts) AS ts_us, event_id, value))),"
                " s -> CAST(s.value AS DOUBLE))"
            ).alias("vs")
        )
    )
    nl = (
        f"({a}D * (v - element_at(acc.sn, pmod(acc.p, {m}) + 1))"
        f" + {1 - a}D * (acc.l + acc.t))"
    )
    step = (
        f"(acc, v) -> struct({nl} AS l,"
        f" {b}D * ({nl} - acc.l) + {1 - b}D * acc.t AS t,"
        f" transform(acc.sn, (e, i) -> IF(i = pmod(acc.p, {m}),"
        f"   {g}D * (v - {nl}) + {1 - g}D * e, e)) AS sn,"
        " acc.p + 1 AS p)"
    )
    fold = (
        "aggregate(slice(vs, 2, size(vs) - 1),"
        " struct(CAST(vs[0] AS DOUBLE) AS l, CAST(0 AS DOUBLE) AS t,"
        f" array_repeat(CAST(0 AS DOUBLE), {m}) AS sn, 1 AS p),"
        f" {step})"
    )
    return series.select(
        "user_id",
        F.size("vs").alias("n_events"),
        F.expr(f"round({fold}.l, 6)").alias("level"),
        F.expr(f"round({fold}.t, 6)").alias("trend"),
        F.expr(
            f"transform({fold}.sn, e -> round(e, 6))"
        ).alias("season"),
        F.expr(
            f"round({fold}.l + {fold}.t"
            f" + element_at({fold}.sn, pmod(size(vs), {m}) + 1), 6)"
        ).alias("forecast_next"),
    )


#: recursive-CTE oracle (compose with recursive=True); same rationale
#: as ORACLE_USER_HOLT.
ORACLE_USER_HOLT_WINTERS = f"""
hwseq AS (
  SELECT user_id, CAST(value AS DOUBLE) AS v,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS pos
  FROM events WHERE value IS NOT NULL
),
hwn AS (SELECT user_id, max(pos) AS n FROM hwseq GROUP BY 1),
hwrec AS (
  SELECT user_id, pos, v AS l, CAST(0 AS DOUBLE) AS t,
         [CAST(0 AS DOUBLE), 0, 0, 0, 0, 0, 0] AS sn
  FROM hwseq WHERE pos = 1
  UNION ALL
  SELECT r.user_id, e.pos,
         {HW_ALPHA} * (e.v - r.sn[((e.pos - 1) % {HW_SEASON}) + 1])
           + {1 - HW_ALPHA} * (r.l + r.t),
         {HW_BETA} * (({HW_ALPHA}
             * (e.v - r.sn[((e.pos - 1) % {HW_SEASON}) + 1])
             + {1 - HW_ALPHA} * (r.l + r.t)) - r.l)
           + {1 - HW_BETA} * r.t,
         list_transform(r.sn, (x, i) ->
           CASE WHEN i = ((e.pos - 1) % {HW_SEASON}) + 1
             THEN {HW_GAMMA} * (e.v - ({HW_ALPHA}
                    * (e.v - r.sn[((e.pos - 1) % {HW_SEASON}) + 1])
                    + {1 - HW_ALPHA} * (r.l + r.t)))
                  + {1 - HW_GAMMA} * x
             ELSE x END)
  FROM hwrec r
  JOIN hwseq e ON e.user_id = r.user_id AND e.pos = r.pos + 1
),
user_holt_winters AS (
  SELECT r.user_id, CAST(hwn.n AS INT) AS n_events,
         round(r.l, 6) AS level,
         round(r.t, 6) AS trend,
         list_transform(r.sn, x -> round(x, 6)) AS season,
         round(r.l + r.t + r.sn[(hwn.n % {HW_SEASON}) + 1], 6)
           AS forecast_next
  FROM hwrec r JOIN hwn ON hwn.user_id = r.user_id AND r.pos = hwn.n
)
"""


#: KS test: alpha = 0.05 critical coefficient.
KS_CRIT_COEF = 1.358


def ks_drift_test(events: DataFrame) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov test between the first and
    second half of the event stream's value distribution — the
    nonparametric companion to the binned PSI report (PSI needs bin
    choices; KS is distribution-free and exact).

    D = sup |F1 - F2| is evaluated at every distinct value via
    cumulative counts. The cumulative sum is distributed with the
    bucketed-prefix-sum trick (per-bucket totals -> tiny offset
    table -> within-bucket window), so no global sort and no
    corpus-wide single-partition window exists; the supremum itself
    is computed on INTEGERS (|c1*n2 - c2*n1|, max'd exactly) and
    divides by n1*n2 only at the output edge.

    Output (1 row): n1, n2, ks_stat, ks_crit (alpha=0.05), drifted.
    """
    ev = events.filter(F.col("value").isNotNull()).select(
        F.unix_micros("ts").alias("ts_us"), "value"
    )
    bounds = ev.agg(
        F.min("ts_us").alias("lo"), F.max("ts_us").alias("hi")
    )
    sided = ev.crossJoin(F.broadcast(bounds)).select(
        "value",
        (
            F.col("ts_us") * 2 <= (F.col("lo") + F.col("hi"))
        ).alias("first_half"),
    )
    per_value = sided.groupBy("value").agg(
        F.sum(F.when(F.col("first_half"), 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("first_half"), 0).otherwise(1)).alias("c2"),
    ).withColumn("bucket", F.floor("value"))
    btot = per_value.groupBy("bucket").agg(
        F.sum("c1").alias("b1"), F.sum("c2").alias("b2")
    )
    woff = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = btot.select(
        "bucket",
        F.coalesce(F.sum("b1").over(woff), F.lit(0)).alias("off1"),
        F.coalesce(F.sum("b2").over(woff), F.lit(0)).alias("off2"),
    )
    win = Window.partitionBy("bucket").orderBy("value").rowsBetween(
        Window.unboundedPreceding, 0
    )
    totals = per_value.agg(
        F.sum("c1").alias("n1"), F.sum("c2").alias("n2")
    )
    cum = (
        per_value.join(F.broadcast(offsets), "bucket")
        .select(
            "value",
            (F.col("off1") + F.sum("c1").over(win)).alias("cum1"),
            (F.col("off2") + F.sum("c2").over(win)).alias("cum2"),
        )
        .crossJoin(F.broadcast(totals))
        .select(
            F.abs(
                F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1")
            ).alias("num"),
            "n1",
            "n2",
        )
    )
    return (
        cum.groupBy("n1", "n2")
        .agg(F.max("num").alias("d_num"))
        .select(
            "n1",
            "n2",
            F.round(
                F.col("d_num") / (F.col("n1") * F.col("n2")).cast("double"),
                6,
            ).alias("ks_stat"),
            F.round(
                F.lit(KS_CRIT_COEF)
                * F.sqrt(
                    (F.col("n1") + F.col("n2")).cast("double")
                    / (F.col("n1") * F.col("n2")).cast("double")
                ),
                6,
            ).alias("ks_crit"),
            (
                F.round(
                    F.col("d_num")
                    / (F.col("n1") * F.col("n2")).cast("double"),
                    6,
                )
                > F.round(
                    F.lit(KS_CRIT_COEF)
                    * F.sqrt(
                        (F.col("n1") + F.col("n2")).cast("double")
                        / (F.col("n1") * F.col("n2")).cast("double")
                    ),
                    6,
                )
            ).alias("drifted"),
        )
    )


ORACLE_KS_DRIFT = f"""
ksb AS (
  SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi
  FROM events WHERE value IS NOT NULL
),
kss AS (
  SELECT value, epoch_us(ts) * 2 <= (lo + hi) AS first_half
  FROM events, ksb WHERE value IS NOT NULL
),
ksv AS (
  SELECT value,
         CAST(sum(CASE WHEN first_half THEN 1 ELSE 0 END) AS BIGINT)
           AS c1,
         CAST(sum(CASE WHEN first_half THEN 0 ELSE 1 END) AS BIGINT)
           AS c2
  FROM kss GROUP BY 1
),
kst AS (
  SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2
  FROM ksv
),
ksc AS (
  SELECT sum(c1) OVER (ORDER BY value) AS cum1,
         sum(c2) OVER (ORDER BY value) AS cum2
  FROM ksv
),
ks_drift_test AS (
  SELECT t.n1, t.n2,
         round(CAST(max(abs(cum1 * t.n2 - cum2 * t.n1)) AS DOUBLE)
               / (t.n1 * t.n2), 6) AS ks_stat,
         round({KS_CRIT_COEF} * sqrt(CAST(t.n1 + t.n2 AS DOUBLE)
               / (t.n1 * t.n2)), 6) AS ks_crit,
         round(CAST(max(abs(cum1 * t.n2 - cum2 * t.n1)) AS DOUBLE)
               / (t.n1 * t.n2), 6)
           > round({KS_CRIT_COEF} * sqrt(CAST(t.n1 + t.n2 AS DOUBLE)
               / (t.n1 * t.n2)), 6) AS drifted
  FROM ksc, kst t
  GROUP BY t.n1, t.n2
)
"""


# ---------------------------------------------------------------------------
# Wasserstein-1 drift (earth-mover distance between the two halves)
# ---------------------------------------------------------------------------


def wasserstein_drift(events: DataFrame) -> DataFrame:
    """Wasserstein-1 (earth-mover) distance between the first and
    second half of the event stream's value distribution — the
    magnitude-aware member of the drift family: KS reports the worst
    single CDF gap, PSI a binned log-ratio, W1 the literal dollars a
    unit of probability mass must move, integrating ALL gaps
    (W1 = integral |F1 - F2| dx over the value axis).

    Exactness: values are exact BIGINT cents; at every distinct cent
    value the CDF gap numerator D = |cum1*n2 - cum2*n1| is an exact
    integer (the KS trick) and the integral term D * gap_to_next_cent
    is carried in DECIMAL(38,0); the single division by n1*n2*100
    happens once at the output edge (round 6, dollars).

    Scale: same distributed shape as `ks_drift_test` — per-value cum
    counts via the bucketed prefix sum (per-bucket totals -> tiny
    offset table -> within-bucket window, no global sort); the gap to
    the next distinct value is a within-bucket lead stitched across
    bucket boundaries by a bucket-grain join against the next
    non-empty bucket's min (offset-table-sized work). The last value
    contributes nothing (both CDFs are 1 there, D = 0).

    Output (1 row): n1, n2, n_values, w1_dollars.
    """
    ev = events.filter(F.col("value").isNotNull()).select(
        F.unix_micros("ts").alias("ts_us"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("v"),
    )
    bounds = ev.agg(
        F.min("ts_us").alias("lo"), F.max("ts_us").alias("hi")
    )
    sided = ev.crossJoin(F.broadcast(bounds)).select(
        "v",
        (
            F.col("ts_us") * 2 <= (F.col("lo") + F.col("hi"))
        ).alias("first_half"),
    )
    per_value = sided.groupBy("v").agg(
        F.sum(F.when(F.col("first_half"), 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("first_half"), 0).otherwise(1)).alias("c2"),
    ).withColumn("bucket", F.floor(F.col("v") / 100))
    btot = per_value.groupBy("bucket").agg(
        F.sum("c1").alias("b1"),
        F.sum("c2").alias("b2"),
        F.min("v").alias("bmin"),
    )
    woff = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wnext = Window.orderBy("bucket").rowsBetween(1, 1)
    offsets = btot.select(
        "bucket",
        F.coalesce(F.sum("b1").over(woff), F.lit(0)).alias("off1"),
        F.coalesce(F.sum("b2").over(woff), F.lit(0)).alias("off2"),
        F.first("bmin").over(wnext).alias("next_bmin"),
    )
    win = Window.partitionBy("bucket").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wlead = Window.partitionBy("bucket").orderBy("v").rowsBetween(1, 1)
    totals = per_value.agg(
        F.sum("c1").alias("n1"), F.sum("c2").alias("n2")
    )
    cum = (
        per_value.join(F.broadcast(offsets), "bucket")
        .select(
            "v",
            (F.col("off1") + F.sum("c1").over(win)).alias("cum1"),
            (F.col("off2") + F.sum("c2").over(win)).alias("cum2"),
            F.coalesce(
                F.first("v").over(wlead), F.col("next_bmin")
            ).alias("v_next"),
        )
        .filter(F.col("v_next").isNotNull())
        .crossJoin(F.broadcast(totals))
        .select(
            "n1",
            "n2",
            (
                F.abs(
                    F.col("cum1") * F.col("n2")
                    - F.col("cum2") * F.col("n1")
                ).cast("decimal(38,0)")
                * (F.col("v_next") - F.col("v")).cast("decimal(38,0)")
            ).alias("term"),
        )
    )
    return (
        cum.groupBy("n1", "n2")
        .agg(
            (F.count("*") + 1).alias("n_values"),
            F.sum("term").alias("s"),
        )
        .select(
            "n1",
            "n2",
            "n_values",
            F.round(
                F.col("s").cast("double")
                / (
                    F.col("n1").cast("double")
                    * F.col("n2")
                    * 100
                ),
                6,
            ).alias("w1_dollars"),
        )
    )


ORACLE_WASSERSTEIN = """
w1v AS (
  SELECT CAST(round(value * 100, 0) AS BIGINT) AS v,
         CAST(sum(CASE WHEN first_half THEN 1 ELSE 0 END) AS BIGINT)
           AS c1,
         CAST(sum(CASE WHEN first_half THEN 0 ELSE 1 END) AS BIGINT)
           AS c2
  FROM (
    SELECT value, epoch_us(ts) * 2 <= (lo + hi) AS first_half
    FROM events,
         (SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi
          FROM events WHERE value IS NOT NULL)
    WHERE value IS NOT NULL
  ) GROUP BY 1
),
w1t AS (
  SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2
  FROM w1v
),
w1c AS (
  SELECT CAST(sum(c1) OVER (ORDER BY v) AS BIGINT) AS cum1,
         CAST(sum(c2) OVER (ORDER BY v) AS BIGINT) AS cum2,
         v,
         lead(v) OVER (ORDER BY v) AS v_next
  FROM w1v
),
wasserstein_drift AS (
  SELECT t.n1, t.n2,
         CAST(count(*) + 1 AS BIGINT) AS n_values,
         round(CAST(sum(CAST(abs(cum1 * t.n2 - cum2 * t.n1) AS HUGEINT)
                        * (v_next - v)) AS DOUBLE)
               / (CAST(t.n1 AS DOUBLE) * t.n2 * 100), 6) AS w1_dollars
  FROM w1c, w1t t
  WHERE v_next IS NOT NULL
  GROUP BY t.n1, t.n2
)
"""


def mannwhitney_test(events: DataFrame) -> DataFrame:
    """Mann-Whitney U between the two A/B variants' per-user purchase
    totals — the nonparametric companion to ``ab_test_report``'s Welch
    z (rank-based, so a few whale users cannot fake a lift).

    Rank arithmetic is exact: with ties handled by midranks, the
    DOUBLED rank of a distinct value at cumulative position p with
    tie-count c is the integer 2p + c + 1, so the doubled rank sum
    2R1 = sum(c1 * (2p + c + 1)) and 2U1 = 2R1 - n1(n1+1) stay
    integral until the z-score's final division (tie-corrected
    variance). Cumulative positions come from the same bucketed
    prefix-sum as the KS test — no global sort.

    Output (1 row): n1, n2, u1, z (rounded 6), significant (|z| >
    1.96).
    """
    per_user = (
        events.filter(F.col("event_type") == AB_METRIC_TYPE)
        .groupBy("user_id")
        .agg(F.round(F.sum("value"), 4).alias("v"))
        .select(
            "v", (F.col("user_id") % 2 == 0).alias("is_a")
        )
    )
    per_value = per_user.groupBy("v").agg(
        F.sum(F.when(F.col("is_a"), 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("is_a"), 0).otherwise(1)).alias("c2"),
    ).withColumn("c", F.col("c1") + F.col("c2")).withColumn(
        "bucket", F.floor("v")
    )
    btot = per_value.groupBy("bucket").agg(F.sum("c").alias("bc"))
    woff = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = btot.select(
        "bucket",
        F.coalesce(F.sum("bc").over(woff), F.lit(0)).alias("off"),
    )
    win = Window.partitionBy("bucket").orderBy("v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = (
        per_value.join(F.broadcast(offsets), "bucket")
        .select(
            "c1",
            "c2",
            "c",
            (
                F.col("off") + F.coalesce(F.sum("c").over(win), F.lit(0))
            ).alias("p"),
        )
    )
    agg = ranked.agg(
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
        F.sum(
            F.col("c1") * (F.lit(2) * F.col("p") + F.col("c") + 1)
        ).alias("r1_x2"),
        F.sum(
            F.col("c") * F.col("c") * F.col("c") - F.col("c")
        ).alias("tie_sum"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    n = n1 + n2
    u1 = (F.col("r1_x2") - n1 * (n1 + 1)) / F.lit(2.0)
    var = (
        (n1 * n2).cast("double")
        / 12.0
        * (
            (n + 1).cast("double")
            - F.col("tie_sum").cast("double")
            / (n * (n - 1)).cast("double")
        )
    )
    z = (u1 - (n1 * n2).cast("double") / 2.0) / F.sqrt(var)
    return agg.select(
        "n1",
        "n2",
        u1.alias("u1"),
        F.round(z, 6).alias("z"),
        (F.abs(F.round(z, 6)) > 1.96).alias("significant"),
    )


ORACLE_MANNWHITNEY = f"""
mwu AS (
  SELECT user_id, round(sum(value), 4) AS v,
         user_id % 2 = 0 AS is_a
  FROM events WHERE event_type = '{AB_METRIC_TYPE}'
  GROUP BY user_id
),
mwv AS (
  SELECT v,
         CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS c2,
         CAST(count(*) AS BIGINT) AS c
  FROM mwu GROUP BY 1
),
mwr AS (
  SELECT c1, c2, c,
         CAST(coalesce(sum(c) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS p
  FROM mwv
),
mwa AS (
  SELECT CAST(sum(c1) AS BIGINT) AS n1,
         CAST(sum(c2) AS BIGINT) AS n2,
         CAST(sum(c1 * (2 * p + c + 1)) AS BIGINT) AS r1_x2,
         CAST(sum(c * c * c - c) AS BIGINT) AS tie_sum
  FROM mwr
),
mannwhitney_test AS (
  SELECT n1, n2,
         (r1_x2 - n1 * (n1 + 1)) / 2.0 AS u1,
         round(((r1_x2 - n1 * (n1 + 1)) / 2.0
                 - CAST(n1 * n2 AS DOUBLE) / 2.0)
               / sqrt(CAST(n1 * n2 AS DOUBLE) / 12.0
                      * (CAST(n1 + n2 + 1 AS DOUBLE)
                         - CAST(tie_sum AS DOUBLE)
                           / CAST((n1 + n2) * (n1 + n2 - 1) AS DOUBLE))),
               6) AS z,
         abs(round(((r1_x2 - n1 * (n1 + 1)) / 2.0
                 - CAST(n1 * n2 AS DOUBLE) / 2.0)
               / sqrt(CAST(n1 * n2 AS DOUBLE) / 12.0
                      * (CAST(n1 + n2 + 1 AS DOUBLE)
                         - CAST(tie_sum AS DOUBLE)
                           / CAST((n1 + n2) * (n1 + n2 - 1) AS DOUBLE))),
               6)) > 1.96 AS significant
  FROM mwa
)
"""


#: chi-squared critical values at alpha=0.05 by degrees of freedom.
CHI2_CRIT_05 = {1: 3.841, 2: 5.991, 3: 7.815, 4: 9.488, 5: 11.070,
                6: 12.592, 7: 14.067, 8: 15.507}


def chi2_independence_test(events: DataFrame) -> DataFrame:
    """Chi-squared test of independence between event type and A/B
    variant — "does the treatment change WHAT users do", the
    categorical sibling of the Welch/Mann-Whitney value tests.

    Exactness: with observed cell count O, row total R, column total
    C, grand total N, each cell's term is (O·N − R·C)² / (N·R·C) —
    numerator fully integral (computed in BIGINT), one double
    division per cell, the across-cells sum rounded to 6 (the
    fold-order rule). Expected counts never materialize as floats.

    Plans: one hash-agg to the (type, variant) contingency grain
    (bounded: |types| × 2 cells), margins derived from the cell table
    with two tiny aggs, everything after is constant-size. Output
    (1 row): n, dof, chi2, chi2_crit, dependent.
    """
    cells = (
        events.select(
            "event_type",
            (F.col("user_id") % 2 == 0).alias("is_a"),
        )
        .groupBy("event_type", "is_a")
        .agg(F.count("*").alias("o"))
    )
    rows_m = cells.groupBy("event_type").agg(F.sum("o").alias("r"))
    cols_m = cells.groupBy("is_a").agg(F.sum("o").alias("c"))
    tot = cells.agg(
        F.sum("o").alias("n"),
        F.countDistinct("event_type").alias("n_types"),
    )
    terms = (
        cells.join(rows_m, "event_type")
        .join(F.broadcast(cols_m), "is_a")
        .crossJoin(F.broadcast(tot))
        .select(
            "n",
            "n_types",
            (
                (F.col("o") * F.col("n") - F.col("r") * F.col("c"))
                * (F.col("o") * F.col("n") - F.col("r") * F.col("c"))
            ).cast("double").alias("num"),
            (F.col("n") * F.col("r") * F.col("c"))
            .cast("double")
            .alias("den"),
        )
    )
    agg = terms.groupBy("n", "n_types").agg(
        F.round(F.sum(F.col("num") / F.col("den")), 6).alias("chi2")
    )
    crit = F.create_map(
        *[F.lit(x) for kv in CHI2_CRIT_05.items() for x in kv]
    )
    dof = (F.col("n_types") - 1).cast("int")
    return agg.select(
        "n",
        dof.alias("dof"),
        "chi2",
        crit[dof].alias("chi2_crit"),
        (F.col("chi2") > crit[dof]).alias("dependent"),
    )


def oracle_chi2_independence() -> str:
    crit_cases = " ".join(
        f"WHEN {k} THEN {v}" for k, v in CHI2_CRIT_05.items()
    )
    return f"""
x2c AS (
  SELECT event_type, user_id % 2 = 0 AS is_a,
         CAST(count(*) AS BIGINT) AS o
  FROM events GROUP BY 1, 2
),
x2r AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS r
        FROM x2c GROUP BY 1),
x2k AS (SELECT is_a, CAST(sum(o) AS BIGINT) AS c FROM x2c GROUP BY 1),
x2t AS (SELECT CAST(sum(o) AS BIGINT) AS n,
               CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
        FROM x2c),
x2a AS (
  SELECT t.n, t.n_types,
         round(sum(CAST((x.o * t.n - r.r * k.c)
                        * (x.o * t.n - r.r * k.c) AS DOUBLE)
                   / CAST(t.n * r.r * k.c AS DOUBLE)), 6) AS chi2
  FROM x2c x
  JOIN x2r r USING (event_type)
  JOIN x2k k USING (is_a), x2t t
  GROUP BY 1, 2
),
chi2_independence AS (
  SELECT n, CAST(n_types - 1 AS INT) AS dof, chi2,
         CASE CAST(n_types - 1 AS INT) {crit_cases} END AS chi2_crit,
         chi2 > (CASE CAST(n_types - 1 AS INT) {crit_cases} END)
           AS dependent
  FROM x2a
)
"""


def markov_transitions(events: DataFrame) -> DataFrame:
    """First-order Markov model of the event stream: P(next_type |
    current_type) from consecutive-event pairs within each user's
    timeline — the sequence model under next-action prediction and
    funnel simulation.

    One user_id window (lead over the per-user time order) produces
    the transition pairs; counts aggregate on the tiny (from, to)
    grain. Probabilities are ratios of integral counts, rounded at
    the edge. At 100 TB this is sessionization's shuffle plus a
    |types|^2-row table.

    Output: from_type, to_type, n, p (rounded 6).
    """
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts"), "event_id"
    )
    pairs = (
        events.select(
            "user_id",
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
            F.unix_micros("ts").alias("_us"),
            "event_id",
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n"))
    )
    totals = pairs.groupBy("from_type").agg(F.sum("n").alias("n_from"))
    return pairs.join(F.broadcast(totals), "from_type").select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.col("n_from"), 6).alias("p"),
    )


ORACLE_MARKOV = """
mk_pairs AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS to_type
  FROM events
),
mk_counts AS (
  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
  FROM mk_pairs WHERE to_type IS NOT NULL
  GROUP BY 1, 2
),
mk_tot AS (
  SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from
  FROM mk_counts GROUP BY 1
),
markov_transitions AS (
  SELECT from_type, to_type, n,
         round(CAST(n AS DOUBLE) / n_from, 6) AS p
  FROM mk_counts JOIN mk_tot USING (from_type)
)
"""


def spend_gini(events: DataFrame) -> DataFrame:
    """Gini coefficient of per-user spend — the concentration metric
    behind "do whales dominate revenue" (and, pointed at token counts
    per document, "does one source dominate the training mix").

    Exact rank formulation: G = 2·Σ(r_i·x_i) / (n·Σx) − (n+1)/n with
    ranks over ascending spend. Ties are handled at the VALUE grain —
    for a tie group of c users with spend v at cumulative position p,
    Σ ranks = c·p + c(c+1)/2, all integral; the value-weighted rank
    sum multiplies v once per group. Ranks come from the bucketed
    prefix-sum (no data-sized global window).

    Output (1 row): n_users, total_spend, gini (rounded 6).
    """
    per_user = (
        events.filter(F.col("event_type") == AB_METRIC_TYPE)
        .groupBy("user_id")
        .agg(F.round(F.sum("value"), 4).alias("v"))
    )
    per_value = per_user.groupBy("v").agg(F.count("*").alias("c"))
    per_value = per_value.withColumn("bucket", F.floor("v"))
    btot = per_value.groupBy("bucket").agg(F.sum("c").alias("bc"))
    woff = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = btot.select(
        "bucket",
        F.coalesce(F.sum("bc").over(woff), F.lit(0)).alias("off"),
    )
    win = Window.partitionBy("bucket").orderBy("v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = per_value.join(F.broadcast(offsets), "bucket").withColumn(
        "p",
        F.col("off") + F.coalesce(F.sum("c").over(win), F.lit(0)),
    )
    # per tie group: sum of ranks = c*p + c(c+1)/2 (ranks 1-based)
    agg = ranked.agg(
        F.sum("c").alias("n"),
        F.round(F.sum(F.col("v") * F.col("c")), 4).alias("total"),
        F.round(
            F.sum(
                F.col("v")
                * (
                    F.col("c") * F.col("p")
                    + F.col("c") * (F.col("c") + 1) / F.lit(2.0)
                )
            ),
            4,
        ).alias("rank_weighted"),
    )
    n = F.col("n")
    return agg.select(
        n.alias("n_users"),
        F.col("total").alias("total_spend"),
        F.round(
            F.lit(2.0) * F.col("rank_weighted")
            / (n * F.col("total"))
            - (n + 1).cast("double") / n,
            6,
        ).alias("gini"),
    )


ORACLE_SPEND_GINI = f"""
gn_u AS (
  SELECT user_id, round(sum(value), 4) AS v
  FROM events WHERE event_type = '{AB_METRIC_TYPE}'
  GROUP BY user_id
),
gn_v AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM gn_u GROUP BY 1),
gn_r AS (
  SELECT v, c,
         CAST(coalesce(sum(c) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS p
  FROM gn_v
),
gn_a AS (
  SELECT CAST(sum(c) AS BIGINT) AS n,
         round(sum(v * c), 4) AS total,
         round(sum(v * (c * p + c * (c + 1) / 2.0)), 4)
           AS rank_weighted
  FROM gn_r
),
spend_gini AS (
  SELECT n AS n_users, total AS total_spend,
         round(2.0 * rank_weighted / (n * total)
               - CAST(n + 1 AS DOUBLE) / n, 6) AS gini
  FROM gn_a
)
"""


def benford_audit(events: DataFrame) -> DataFrame:
    """Benford's-law first-digit audit of the value column — the
    classic fabricated-numbers / broken-ETL screen (organically grown
    magnitudes follow log10(1 + 1/d); uniform or constant-injected
    data does not).

    One map-only digit extraction + a 9-row agg; the chi-squared
    statistic against the Benford expectation uses exact observed
    integers and closed-form expected proportions. Output: one row
    per leading digit (n, observed share, benford share) — the
    verdict agg is a consumer's one-liner.
    """
    digits = (
        events.filter(F.col("value") > 0)
        .select(
            F.floor(
                F.col("value")
                / F.pow(F.lit(10.0), F.floor(F.log10("value")))
            )
            .cast("int")
            .alias("d")
        )
        .filter(F.col("d").between(1, 9))
    )
    tot = digits.agg(F.count("*").alias("n_total"))
    import math

    benford = F.create_map(
        *[
            F.lit(x)
            for d in range(1, 10)
            for x in (d, round(math.log10(1 + 1 / d), 6))
        ]
    )
    return (
        digits.groupBy("d")
        .agg(F.count("*").alias("n"))
        .crossJoin(F.broadcast(tot))
        .select(
            "d",
            "n",
            F.round(F.col("n") / F.col("n_total"), 6).alias("observed"),
            benford[F.col("d")].alias("expected"),
        )
    )


def oracle_benford_audit() -> str:
    import math

    cases = " ".join(
        f"WHEN {d} THEN {round(math.log10(1 + 1 / d), 6)}"
        for d in range(1, 10)
    )
    return f"""
bf_d AS (
  SELECT CAST(floor(value / pow(10, floor(log10(value)))) AS INT) AS d
  FROM events WHERE value > 0
),
bf_f AS (SELECT d FROM bf_d WHERE d BETWEEN 1 AND 9),
bf_t AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM bf_f),
benford_audit AS (
  SELECT d, CAST(count(*) AS BIGINT) AS n,
         round(CAST(count(*) AS DOUBLE) / any_value(t.n_total), 6)
           AS observed,
         CAST(CASE d {cases} END AS DOUBLE) AS expected
  FROM bf_f, bf_t t
  GROUP BY d
)
"""


#: CUSUM parameters: slack k and decision threshold h, in units of
#: the series' own scale (applied to daily event-count deviations
#: from the series mean).
CUSUM_K_FRAC = 0.1
CUSUM_H_FRAC = 1.0


def cusum_changepoints(events: DataFrame) -> DataFrame:
    """CUSUM change-point detection over the daily event-count series
    — the sequential monitoring statistic (Page 1954) behind "did
    volume shift, and when": S+ accumulates positive deviations from
    the mean (minus a slack k), S- the negative ones; an alarm fires
    when either exceeds h.

    The recursion S+' = max(0, S+ + (x - mean - k)) folds left over
    the day-ordered series (the Holt pattern: Spark ``aggregate``
    fold, recursive-CTE oracle — same scalar op order, bit-exact).
    Mean, k, and h derive from the series itself (fractions of the
    mean), so the operator is scale-free. The daily series is tiny by
    construction (one row per day), so the fold is driver-free AND
    data-light; the only corpus-sized work is the per-day count agg.

    Output: one row per day — day, n, s_pos, s_neg, alarm.
    """
    daily = (
        events.groupBy(F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("n"))
    )
    stats = daily.agg(
        F.avg("n").alias("mu"),
        F.count("*").alias("n_days"),
    )
    series = daily.crossJoin(F.broadcast(stats)).select(
        "day", "n", "mu"
    )
    arr = (
        series.groupBy()
        .agg(
            F.expr(
                "array_sort(collect_list(struct(day, n, mu)))"
            ).alias("xs")
        )
    )
    k = f"(x.mu * {CUSUM_K_FRAC}D)"
    h = f"(acc.mu * {CUSUM_H_FRAC}D)"
    step = (
        "(acc, x) -> struct("
        " greatest(CAST(0 AS DOUBLE),"
        "   acc.sp + (CAST(x.n AS DOUBLE) - x.mu) - " + k + ") AS sp,"
        " greatest(CAST(0 AS DOUBLE),"
        "   acc.sn - (CAST(x.n AS DOUBLE) - x.mu) - " + k + ") AS sn,"
        " x.mu AS mu,"
        " concat(acc.rows, array(struct(x.day AS day, x.n AS n,"
        "   greatest(CAST(0 AS DOUBLE),"
        "     acc.sp + (CAST(x.n AS DOUBLE) - x.mu) - " + k + ") AS sp,"
        "   greatest(CAST(0 AS DOUBLE),"
        "     acc.sn - (CAST(x.n AS DOUBLE) - x.mu) - " + k + ") AS sn"
        " ))) AS rows)"
    )
    fold = (
        "aggregate(xs,"
        " struct(CAST(0 AS DOUBLE) AS sp, CAST(0 AS DOUBLE) AS sn,"
        " xs[0].mu AS mu,"
        " CAST(array() AS array<struct<day: date, n: bigint,"
        " sp: double, sn: double>>) AS rows),"
        f" {step})"
    )
    return (
        arr.select(F.explode(F.expr(f"{fold}.rows")).alias("r"),
                   F.expr(f"{fold}.mu").alias("mu"))
        .select(
            F.col("r.day").alias("day"),
            F.col("r.n").alias("n"),
            F.round("r.sp", 6).alias("s_pos"),
            F.round("r.sn", 6).alias("s_neg"),
            (
                (F.col("r.sp") > F.col("mu") * CUSUM_H_FRAC)
                | (F.col("r.sn") > F.col("mu") * CUSUM_H_FRAC)
            ).alias("alarm"),
        )
    )


#: recursive-CTE oracle (recursive=True).
ORACLE_CUSUM = f"""
cs_daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
cs_stats AS (
  SELECT avg(n) AS mu, count(*) AS n_days FROM cs_daily
),
cs_seq AS (
  SELECT day, n, mu,
         row_number() OVER (ORDER BY day) AS pos
  FROM cs_daily, cs_stats
),
cs_rec AS (
  SELECT day, n, mu, pos,
         greatest(CAST(0 AS DOUBLE),
           (CAST(n AS DOUBLE) - mu) - mu * {CUSUM_K_FRAC}) AS sp,
         greatest(CAST(0 AS DOUBLE),
           -(CAST(n AS DOUBLE) - mu) - mu * {CUSUM_K_FRAC}) AS sn
  FROM cs_seq WHERE pos = 1
  UNION ALL
  SELECT s.day, s.n, s.mu, s.pos,
         greatest(CAST(0 AS DOUBLE),
           r.sp + (CAST(s.n AS DOUBLE) - s.mu)
           - s.mu * {CUSUM_K_FRAC}),
         greatest(CAST(0 AS DOUBLE),
           r.sn - (CAST(s.n AS DOUBLE) - s.mu)
           - s.mu * {CUSUM_K_FRAC})
  FROM cs_rec r JOIN cs_seq s ON s.pos = r.pos + 1
),
cusum_changepoints AS (
  SELECT day, n, round(sp, 6) AS s_pos, round(sn, 6) AS s_neg,
         (sp > mu * {CUSUM_H_FRAC}) OR (sn > mu * {CUSUM_H_FRAC})
           AS alarm
  FROM cs_rec
)
"""


#: bot heuristics: inter-arrival regularity (CV below this) at
#: meaningful volume (events above this) flags automation.
BOT_MIN_EVENTS = 50
BOT_MAX_CV = 0.4


def bot_flags(events: DataFrame) -> DataFrame:
    """Behavioral bot screen: humans arrive bursty (inter-arrival
    coefficient of variation ~1 for Poisson-ish behavior, higher with
    sessions), automation arrives on a clock (CV near 0). Flag users
    with low gap-CV at meaningful volume — the standard first-pass
    filter before traffic-derived text enters a training corpus.

    Same single user_id shuffle as the inter-arrival operator (the
    gap window and the per-user agg share the partitioning). Variance
    from integral-order millis sums (sum, sum of squares) with the
    stats rounded to 6dp BEFORE the CV division — the cross-engine
    float rule. Output: per-user n_events, mean/std gap, gap_cv,
    is_bot.
    """
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    gaps = (
        events.select(
            "user_id", "event_id", F.unix_millis("ts").alias("ts_ms")
        )
        .withColumn("gap", F.col("ts_ms") - F.lag("ts_ms").over(w))
        .filter(F.col("gap").isNotNull())
    )
    agg = gaps.groupBy("user_id").agg(
        (F.count("*") + 1).alias("n_events"),
        F.sum("gap").alias("s"),
        F.sum(F.col("gap") * F.col("gap")).alias("s2"),
        F.count("*").alias("m"),
    )
    mean = F.round(F.col("s") / F.col("m"), 6)
    var = F.round(
        F.col("s2").cast("double") / F.col("m")
        - (F.col("s").cast("double") / F.col("m"))
        * (F.col("s").cast("double") / F.col("m")),
        6,
    )
    out = agg.select(
        "user_id",
        "n_events",
        mean.alias("mean_gap_ms"),
        F.round(F.sqrt(var), 6).alias("std_gap_ms"),
        F.round(F.round(F.sqrt(var), 6) / mean, 6).alias("gap_cv"),
    )
    return out.withColumn(
        "is_bot",
        (F.col("n_events") >= BOT_MIN_EVENTS)
        & (F.col("gap_cv") < BOT_MAX_CV),
    )


ORACLE_BOT_FLAGS = f"""
bt_g AS (
  SELECT user_id,
         ts_ms - lag(ts_ms) OVER (
           PARTITION BY user_id ORDER BY ts_ms, event_id) AS gap
  FROM (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms FROM events)
),
bt_a AS (
  SELECT user_id,
         CAST(count(*) + 1 AS BIGINT) AS n_events,
         CAST(sum(gap) AS BIGINT) AS s,
         CAST(sum(gap * gap) AS BIGINT) AS s2,
         CAST(count(*) AS BIGINT) AS m
  FROM bt_g WHERE gap IS NOT NULL
  GROUP BY 1
),
bt_s AS (
  SELECT user_id, n_events,
         round(CAST(s AS DOUBLE) / m, 6) AS mean_gap_ms,
         round(sqrt(round(CAST(s2 AS DOUBLE) / m
               - (CAST(s AS DOUBLE) / m) * (CAST(s AS DOUBLE) / m),
               6)), 6) AS std_gap_ms
  FROM bt_a
),
bot_flags AS (
  SELECT user_id, n_events, mean_gap_ms, std_gap_ms,
         round(std_gap_ms / mean_gap_ms, 6) AS gap_cv,
         n_events >= {BOT_MIN_EVENTS}
           AND round(std_gap_ms / mean_gap_ms, 6) < {BOT_MAX_CV}
           AS is_bot
  FROM bt_s
)
"""


def markov_entropy_rate(events: DataFrame) -> DataFrame:
    """Entropy rate of the event-type Markov chain: H = Σ π(s)·H(·|s)
    in bits — "how predictable is the next action", the single number
    summarizing the transition matrix (0 = deterministic flows, log2
    |types| = uniform chaos). Burst-bot traffic and broken
    instrumentation both show up as entropy collapse against a
    baseline.

    Derived entirely from the transition counts (one more tiny agg on
    the |types|² table): π from row sums, conditional entropies from
    count ratios, total rounded at the edge. Output (1 row):
    n_transitions, entropy_bits, max_entropy_bits, predictability.
    """
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts"), "event_id"
    )
    counts = (
        events.select(
            "user_id",
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n"))
    )
    row_tot = counts.groupBy("from_type").agg(
        F.sum("n").alias("n_from")
    )
    grand = counts.agg(
        F.sum("n").alias("n_all"),
        F.countDistinct("to_type").alias("n_types"),
    )
    terms = (
        counts.join(F.broadcast(row_tot), "from_type")
        .crossJoin(F.broadcast(grand))
        .select(
            "n_all",
            "n_types",
            (
                (F.col("n").cast("double") / F.col("n_all"))
                * -F.log2(
                    F.col("n").cast("double") / F.col("n_from")
                )
            ).alias("term"),
        )
    )
    return (
        terms.groupBy("n_all", "n_types")
        .agg(F.round(F.sum("term"), 6).alias("entropy_bits"))
        .select(
            F.col("n_all").alias("n_transitions"),
            "entropy_bits",
            F.round(F.log2(F.col("n_types").cast("double")), 6).alias(
                "max_entropy_bits"
            ),
            F.round(
                F.lit(1.0)
                - F.col("entropy_bits")
                / F.round(F.log2(F.col("n_types").cast("double")), 6),
                6,
            ).alias("predictability"),
        )
    )


ORACLE_MARKOV_ENTROPY = """
me_pairs AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS to_type
  FROM events
),
me_counts AS (
  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
  FROM me_pairs WHERE to_type IS NOT NULL GROUP BY 1, 2
),
me_row AS (
  SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from
  FROM me_counts GROUP BY 1
),
me_grand AS (
  SELECT CAST(sum(n) AS BIGINT) AS n_all,
         CAST(count(DISTINCT to_type) AS BIGINT) AS n_types
  FROM me_counts
),
me_agg AS (
  SELECT g.n_all, g.n_types,
         round(sum((CAST(c.n AS DOUBLE) / g.n_all)
               * -log2(CAST(c.n AS DOUBLE) / r.n_from)), 6)
           AS entropy_bits
  FROM me_counts c JOIN me_row r USING (from_type), me_grand g
  GROUP BY 1, 2
),
markov_entropy_rate AS (
  SELECT n_all AS n_transitions, entropy_bits,
         round(log2(CAST(n_types AS DOUBLE)), 6) AS max_entropy_bits,
         round(1.0 - entropy_bits
               / round(log2(CAST(n_types AS DOUBLE)), 6), 6)
           AS predictability
  FROM me_agg
)
"""


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch — deterministic + mergeable
# ---------------------------------------------------------------------------

KMV_K = 64
KMV_SALT = 16
_KMV_DENOM = float(1 << 52)


def kmv_distinct_sketch(events: DataFrame) -> DataFrame:
    """Mergeable distinct-count sketch with a cross-engine-exact
    estimator: per day, keep the KMV_K smallest 52-bit md5 hashes of
    user_id (the KMV / bottom-k theta sketch); the distinct-user
    estimate is (k-1)/u_k where u_k is the k-th smallest hash mapped
    into (0,1]. Unlike HLL (`daily_sketch_rollup`, engine-specific
    registers -> rows-only), every step here is deterministic integer
    and identical double arithmetic, so the ESTIMATES hash-match the
    DuckDB replay — an approx operator under the exact gate.

    Mergeability, the property that makes sketches the 100 TB distinct
    pattern, is exercised for real: the 'ALL' row is computed by
    merging the per-day sketch rows (distinct-union, re-take k
    smallest) — provably equal to sketching the raw union — so a year
    of distinct counts comes from 365 tiny sketch sets, no rescan.

    Scale: the only corpus-sized stage is the (day, hash) distinct;
    per-day top-k runs as a salted two-level rank (KMV_SALT local
    winners per day first), so no single task ever sorts a whole hot
    day. Output: scope ('yyyy-MM-dd' or 'ALL'), n_kept, est_users,
    exact_users (truth column for error inspection).
    """
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 13), 16, 10
    ).cast("bigint")
    base = (
        events.select(
            F.to_date("ts").cast("string").alias("scope"), h.alias("h")
        )
        .distinct()
    )
    w1 = Window.partitionBy("scope", "salt").orderBy("h")
    w2 = Window.partitionBy("scope").orderBy("h")
    daily = (
        base.withColumn("salt", F.pmod(F.col("h"), F.lit(KMV_SALT)))
        .withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= KMV_K)
        .withColumn("rn2", F.row_number().over(w2))
        .filter(F.col("rn2") <= KMV_K)
        .select("scope", "h")
    )
    wm = Window.partitionBy(F.lit(1)).orderBy("h")
    merged = (
        daily.select("h")
        .distinct()
        .withColumn("rn", F.row_number().over(wm))
        .filter(F.col("rn") <= KMV_K)
        .select(F.lit("ALL").alias("scope"), "h")
    )
    sk = daily.unionByName(merged)
    est = sk.groupBy("scope").agg(
        F.count("*").alias("n_kept"),
        F.when(
            F.count("*") < KMV_K,
            F.round(F.count("*").cast("double"), 4),
        )
        .otherwise(
            F.round(
                F.lit(float(KMV_K - 1))
                / ((F.max("h") + F.lit(1)) / F.lit(_KMV_DENOM)),
                4,
            )
        )
        .alias("est_users"),
    )
    exact = base.groupBy("scope").agg(
        F.count("*").alias("exact_users")
    ).unionByName(
        base.agg(
            F.countDistinct("h").alias("exact_users")
        ).select(F.lit("ALL").alias("scope"), "exact_users")
    )
    return est.join(exact, "scope").select(
        "scope", "n_kept", "est_users", "exact_users"
    )


ORACLE_KMV_SKETCH = f"""
kmv_base AS (
  SELECT DISTINCT CAST(CAST(ts AS DATE) AS VARCHAR) AS scope,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13))
              AS BIGINT) AS h
  FROM events
),
kmv_daily AS (
  SELECT scope, h FROM kmv_base
  QUALIFY row_number() OVER (PARTITION BY scope ORDER BY h) <= {KMV_K}
),
kmv_m0 AS (SELECT DISTINCT h FROM kmv_daily),
kmv_merged AS (
  SELECT 'ALL' AS scope, h FROM kmv_m0
  QUALIFY row_number() OVER (ORDER BY h) <= {KMV_K}
),
kmv_sk AS (
  SELECT * FROM kmv_daily UNION ALL SELECT * FROM kmv_merged
),
kmv_est AS (
  SELECT scope, CAST(count(*) AS BIGINT) AS n_kept,
         CASE WHEN count(*) < {KMV_K}
              THEN round(CAST(count(*) AS DOUBLE), 4)
              ELSE round({float(KMV_K - 1)!r}
                         / ((max(h) + 1) / {_KMV_DENOM!r}), 4)
         END AS est_users
  FROM kmv_sk GROUP BY 1
),
kmv_exact AS (
  SELECT scope, CAST(count(*) AS BIGINT) AS exact_users
  FROM kmv_base GROUP BY 1
  UNION ALL
  SELECT 'ALL', CAST(count(DISTINCT h) AS BIGINT) FROM kmv_base
),
kmv_distinct_sketch AS (
  SELECT e.scope, e.n_kept, e.est_users, x.exact_users
  FROM kmv_est e JOIN kmv_exact x USING (scope)
)
"""


def kmv_set_algebra(events: DataFrame) -> DataFrame:
    """Theta-sketch set algebra on KMV sketches — union, intersection,
    and Jaccard ESTIMATES between two user-day sets (purchase days vs
    click days) computed purely from two k=64 sketches, never from the
    raw sets. This is the sketch property that matters operationally
    at 100 TB: per-segment sketches are tiny mergeable state, and ANY
    pair's overlap is answerable after the fact without rescanning —
    the audience-overlap / reach-dedup query pattern.

    Mechanics (Dasgupta et al., theta sketches): each side retains its
    k smallest 52-bit md5 hashes; theta_s = k-th min. For set ops the
    effective threshold is theta = min(theta_A, theta_B); the
    intersection estimate is |A_sk intersect B_sk restricted below
    theta| / theta, the union estimate is (k-1)/theta_U of the merged
    re-topped sketch, and Jaccard is their ratio. Every step is
    deterministic integer + fixed-order double arithmetic, so the
    ESTIMATES (not just the machinery) hash-match the DuckDB replay.

    Scale: the only corpus-sized stage is the distinct (side, hash)
    projection; per-side top-k uses the same salted two-level rank as
    ``kmv_distinct_sketch`` — no global sort, no hot partition. Exact
    counts ride along as truth columns for error inspection.
    """
    ent = F.concat(
        F.col("user_id").cast("string"),
        F.lit("@"),
        F.to_date("ts").cast("string"),
    )
    h = F.conv(F.substring(F.md5(ent), 1, 13), 16, 10).cast("bigint")
    base = (
        events.filter(F.col("event_type").isin("purchase", "click"))
        .select(F.col("event_type").alias("side"), h.alias("h"))
        .distinct()
    )
    w1 = Window.partitionBy("side", "salt").orderBy("h")
    w2 = Window.partitionBy("side").orderBy("h")
    sk = (
        base.withColumn("salt", F.pmod(F.col("h"), F.lit(KMV_SALT)))
        .withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= KMV_K)
        .withColumn("rn2", F.row_number().over(w2))
        .filter(F.col("rn2") <= KMV_K)
        .select("side", "h")
    )
    thetas = sk.groupBy("side").agg(F.max("h").alias("theta_h"))
    theta_min = thetas.agg(F.min("theta_h").alias("theta_min_h"))
    n_inter = (
        sk.filter(F.col("side") == "purchase")
        .select("h")
        .join(sk.filter(F.col("side") == "click").select("h"), "h")
        .crossJoin(F.broadcast(theta_min))
        .filter(F.col("h") <= F.col("theta_min_h"))
        .agg(F.count("*").alias("n_inter_kept"))
    )
    wu = Window.partitionBy(F.lit(1)).orderBy("h")
    union_sk = (
        sk.select("h")
        .distinct()
        .withColumn("rn", F.row_number().over(wu))
        .filter(F.col("rn") <= KMV_K)
        .agg(F.max("h").alias("theta_u_h"), F.count("*").alias("n_u_kept"))
    )
    exact = (
        base.groupBy("h")
        .agg(F.count("*").alias("n_sides"))
        .agg(
            F.count("*").alias("exact_union"),
            F.sum((F.col("n_sides") == 2).cast("bigint")).alias("exact_inter"),
        )
    )
    exact_sides = base.agg(
        F.sum((F.col("side") == "purchase").cast("bigint")).alias(
            "exact_purchase"
        ),
        F.sum((F.col("side") == "click").cast("bigint")).alias("exact_click"),
    )
    ta = thetas.filter(F.col("side") == "purchase").select(
        F.col("theta_h").alias("theta_a_h")
    )
    tb = thetas.filter(F.col("side") == "click").select(
        F.col("theta_h").alias("theta_b_h")
    )
    km1 = float(KMV_K - 1)
    frac = lambda c: (c + F.lit(1)) / F.lit(_KMV_DENOM)  # noqa: E731
    return (
        n_inter.crossJoin(F.broadcast(theta_min))
        .crossJoin(F.broadcast(union_sk))
        .crossJoin(F.broadcast(ta))
        .crossJoin(F.broadcast(tb))
        .crossJoin(F.broadcast(exact))
        .crossJoin(F.broadcast(exact_sides))
        .select(
            "n_inter_kept",
            "n_u_kept",
            F.round(F.lit(km1) / frac(F.col("theta_a_h")), 4).alias(
                "est_purchase"
            ),
            F.round(F.lit(km1) / frac(F.col("theta_b_h")), 4).alias(
                "est_click"
            ),
            F.round(
                F.col("n_inter_kept") / frac(F.col("theta_min_h")), 4
            ).alias("est_inter"),
            F.round(F.lit(km1) / frac(F.col("theta_u_h")), 4).alias(
                "est_union"
            ),
            F.round(
                (F.col("n_inter_kept") / frac(F.col("theta_min_h")))
                / (F.lit(km1) / frac(F.col("theta_u_h"))),
                4,
            ).alias("est_jaccard"),
            "exact_purchase",
            "exact_click",
            "exact_inter",
            "exact_union",
        )
    )


_KMV_ALG_H = (
    "CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || '@' || "
    "CAST(CAST(ts AS DATE) AS VARCHAR)), 1, 13)) AS BIGINT)"
)

ORACLE_KMV_SET_ALGEBRA = f"""
ka_base AS (
  SELECT DISTINCT event_type AS side, {_KMV_ALG_H} AS h
  FROM events WHERE event_type IN ('purchase', 'click')
),
ka_sk AS (
  SELECT side, h FROM ka_base
  QUALIFY row_number() OVER (PARTITION BY side ORDER BY h) <= {KMV_K}
),
ka_thetas AS (SELECT side, max(h) AS theta_h FROM ka_sk GROUP BY 1),
ka_tmin AS (SELECT min(theta_h) AS theta_min_h FROM ka_thetas),
ka_inter AS (
  SELECT CAST(count(*) AS BIGINT) AS n_inter_kept
  FROM ka_sk a JOIN ka_sk b ON a.h = b.h
  WHERE a.side = 'purchase' AND b.side = 'click'
    AND a.h <= (SELECT theta_min_h FROM ka_tmin)
),
ka_union AS (
  SELECT max(h) AS theta_u_h, CAST(count(*) AS BIGINT) AS n_u_kept FROM (
    SELECT h FROM (SELECT DISTINCT h FROM ka_sk) dh
    QUALIFY row_number() OVER (ORDER BY h) <= {KMV_K}
  )
),
ka_exact AS (
  SELECT CAST(count(*) AS BIGINT) AS exact_union,
         CAST(sum(CASE WHEN n_sides = 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS exact_inter
  FROM (SELECT h, count(*) AS n_sides FROM ka_base GROUP BY 1)
),
ka_exact_sides AS (
  SELECT CAST(sum(CASE WHEN side = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
           AS exact_purchase,
         CAST(sum(CASE WHEN side = 'click' THEN 1 ELSE 0 END) AS BIGINT)
           AS exact_click
  FROM ka_base
),
kmv_set_algebra AS (
  SELECT i.n_inter_kept, u.n_u_kept,
         round({float(KMV_K - 1)!r} / ((ta.theta_h + 1) / {_KMV_DENOM!r}), 4)
           AS est_purchase,
         round({float(KMV_K - 1)!r} / ((tb.theta_h + 1) / {_KMV_DENOM!r}), 4)
           AS est_click,
         round(i.n_inter_kept / ((tm.theta_min_h + 1) / {_KMV_DENOM!r}), 4)
           AS est_inter,
         round({float(KMV_K - 1)!r} / ((u.theta_u_h + 1) / {_KMV_DENOM!r}), 4)
           AS est_union,
         round((i.n_inter_kept / ((tm.theta_min_h + 1) / {_KMV_DENOM!r}))
               / ({float(KMV_K - 1)!r} / ((u.theta_u_h + 1) / {_KMV_DENOM!r})),
               4) AS est_jaccard,
         s.exact_purchase, s.exact_click, x.exact_inter, x.exact_union
  FROM ka_inter i, ka_tmin tm, ka_union u, ka_exact x, ka_exact_sides s,
       (SELECT theta_h FROM ka_thetas WHERE side = 'purchase') ta,
       (SELECT theta_h FROM ka_thetas WHERE side = 'click') tb
)
"""


# ---------------------------------------------------------------------------
# calendar densify (gap-fill) with cumulative counts
# ---------------------------------------------------------------------------


def gapfill_daily_counts(events: DataFrame) -> DataFrame:
    """Dense per-(event_type, day) counts over the full calendar span:
    missing days appear with an explicit 0 instead of being absent —
    the densify step every downstream time-series op (forecasting,
    rolling windows, drift) silently requires, and the one a bare
    groupBy can never produce. A running cumulative count rides along.

    Scale: the grid is |types| x |days| — generated from a one-row
    (min, max) agg via ``sequence`` + explode, never from the events
    table; the events-sized work is exactly one daily count-agg. The
    cumulative window partitions by type and is bounded by the day
    count, not event count.
    """
    daily = events.groupBy(
        F.col("event_type"), F.to_date("ts").alias("day")
    ).agg(F.count("*").alias("n"))
    span = events.agg(
        F.min(F.to_date("ts")).alias("dmin"),
        F.max(F.to_date("ts")).alias("dmax"),
    )
    grid = (
        span.select(
            F.explode(
                F.expr("sequence(dmin, dmax, interval 1 day)")
            ).alias("day")
        )
        .crossJoin(events.select("event_type").distinct())
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(daily, ["event_type", "day"], "left")
        .select(
            "event_type",
            F.col("day").cast("string").alias("day"),
            F.coalesce("n", F.lit(0)).alias("n_events"),
        )
        .withColumn("cum_events", F.sum("n_events").over(w))
    )


ORACLE_GAPFILL = """
gf_daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
gf_span AS (
  SELECT min(CAST(ts AS DATE)) AS dmin, max(CAST(ts AS DATE)) AS dmax
  FROM events
),
gf_grid AS (
  SELECT t.event_type, CAST(g.d AS DATE) AS day
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (
    SELECT unnest(generate_series(dmin, dmax, INTERVAL 1 DAY)) AS d
    FROM gf_span) g
),
gapfill_daily AS (
  SELECT event_type, CAST(day AS VARCHAR) AS day,
         COALESCE(n, 0) AS n_events,
         CAST(sum(COALESCE(n, 0)) OVER (
           PARTITION BY event_type ORDER BY day
           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_events
  FROM gf_grid LEFT JOIN gf_daily USING (event_type, day)
)
"""


# ---------------------------------------------------------------------------
# count-min sketch heavy-hitter estimates (deterministic, hash-verified)
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 64
CMS_TOP = 20


def cms_heavy_hitters(events: DataFrame) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) of per-user
    event counts, with estimates for the top heavy hitters next to
    exact truth. Like the KMV sketch, the hash functions are
    deterministic md5 slots, so the ESTIMATES (not just the plumbing)
    hash-match the DuckDB replay — the frequency-sketch sibling of
    `kmv_distinct_sketch`'s distinct sketch.

    The sketch is CMS_DEPTH x CMS_WIDTH counters built in one agg
    (events explode x depth, map-side combined to depth*width cells);
    a key's estimate is the MIN over its depth cells — an upper bound
    on truth by construction (pinned by property test). Scale: the
    sketch is constant-size regardless of corpus; merging day sketches
    is cell-wise addition (mergeable like KMV); candidate estimation
    joins |candidates| x depth rows against the tiny cell table.
    """
    rows = F.array(*[F.lit(r) for r in range(CMS_DEPTH)])
    cell = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.lit("cms"),
                    F.col("r").cast("string"),
                    F.col("user_id").cast("string"),
                )
            ),
            1,
            13,
        ),
        16,
        10,
    ).cast("bigint") % CMS_WIDTH
    sketch = (
        events.select("user_id", F.explode(rows).alias("r"))
        .withColumn("c", cell)
        .groupBy("r", "c")
        .agg(F.count("*").alias("cnt"))
    )
    exact = events.groupBy("user_id").agg(F.count("*").alias("exact_cnt"))
    top = exact.orderBy(F.col("exact_cnt").desc(), "user_id").limit(
        CMS_TOP
    )
    probes = top.select(
        "user_id", "exact_cnt", F.explode(rows).alias("r")
    ).withColumn("c", cell)
    return (
        probes.join(F.broadcast(sketch), ["r", "c"])
        .groupBy("user_id", "exact_cnt")
        .agg(F.min("cnt").alias("cms_est"))
        .select("user_id", "exact_cnt", "cms_est")
    )


ORACLE_CMS = f"""
cms_cells AS (
  SELECT r, CAST(('0x' || substr(md5('cms:' || r || ':' ||
           CAST(user_id AS VARCHAR)), 1, 13)) AS BIGINT)
           % {CMS_WIDTH} AS c,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events, LATERAL unnest(range(0, {CMS_DEPTH})) AS g(r)
  GROUP BY 1, 2
),
cms_exact AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS exact_cnt
  FROM events GROUP BY 1
),
cms_top AS (
  SELECT user_id, exact_cnt FROM cms_exact
  ORDER BY exact_cnt DESC, user_id LIMIT {CMS_TOP}
),
cms_probes AS (
  SELECT t.user_id, t.exact_cnt, g.r,
         CAST(('0x' || substr(md5('cms:' || g.r || ':' ||
           CAST(t.user_id AS VARCHAR)), 1, 13)) AS BIGINT)
           % {CMS_WIDTH} AS c
  FROM cms_top t, LATERAL unnest(range(0, {CMS_DEPTH})) AS g(r)
),
cms_heavy_hitters AS (
  SELECT p.user_id, p.exact_cnt, CAST(min(s.cnt) AS BIGINT) AS cms_est
  FROM cms_probes p JOIN cms_cells s ON s.r = p.r AND s.c = p.c
  GROUP BY 1, 2
)
"""


# ---------------------------------------------------------------------------
# deterministic HyperLogLog (register-level, hash-verified)
# ---------------------------------------------------------------------------

HLL_P = 6                  # 2^6 = 64 registers
HLL_M = 1 << HLL_P
HLL_HASH_BITS = 52         # md5 prefix width
HLL_W_BITS = HLL_HASH_BITS - HLL_P


def hll_distinct(events: DataFrame) -> DataFrame:
    """HyperLogLog (Flajolet et al. 2007) built from first principles
    with deterministic md5 hashing — per-event_type (plus 'ALL')
    distinct-user estimates whose REGISTERS and estimates are
    bit-identical cross-engine, unlike the opaque
    ``approx_count_distinct``/``hll_sketch_agg`` sketches (rows-only).
    Completes the verified sketch family: KMV (order statistics), CMS
    (frequency), HLL (register max).

    Exactness contract: bucket = top HLL_P hash bits; rho = leading-
    zero rank of the remaining bits via integer ``bin()`` length (no
    log2 floats); 2^-rho terms are dyadic rationals so the harmonic
    sum is EXACT in double regardless of fold order; the one libm op
    (ln, small-range linear counting) lands under round(4).

    Scale: one pass, one (scope, bucket)-grain max-agg — map-side
    combine reduces every partition to <= scopes*64 rows, the classic
    HLL property that makes it THE streaming/distributed distinct
    counter; registers merge by element-wise max (same agg), shown by
    the 'ALL' scope sharing the pass. Output: scope, est_users,
    exact_users.
    """
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 13), 16, 10
    ).cast("bigint")
    scoped = events.select(
        F.explode(
            F.array(F.col("event_type"), F.lit("ALL"))
        ).alias("scope"),
        h.alias("h"),
    )
    regs = (
        scoped.select(
            "scope",
            F.expr(f"h DIV {1 << HLL_W_BITS}").alias("bucket"),
            (F.col("h") % F.lit(1 << HLL_W_BITS)).alias("w"),
        )
        .withColumn(
            "rho",
            F.when(F.col("w") == 0, F.lit(HLL_W_BITS + 1)).otherwise(
                F.lit(HLL_W_BITS + 1) - F.length(F.bin(F.col("w")))
            ),
        )
        .groupBy("scope", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    spark = events.sparkSession
    grid = (
        scoped.select("scope")
        .distinct()
        .crossJoin(spark.range(HLL_M).select(F.col("id").alias("bucket")))
    )
    full = grid.join(regs, ["scope", "bucket"], "left").select(
        "scope", F.coalesce("rho", F.lit(0)).alias("rho")
    )
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(HLL_M)))
    stats = full.groupBy("scope").agg(
        F.sum(F.lit(1.0) / F.expr("shiftleft(1L, rho)")).alias("z"),
        F.sum(F.when(F.col("rho") == 0, 1).otherwise(0)).alias("zeros"),
    )
    raw = alpha * F.lit(float(HLL_M * HLL_M)) / F.col("z")
    est = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (F.col("zeros") > 0),
        F.lit(float(HLL_M))
        * F.log(F.lit(float(HLL_M)) / F.col("zeros")),
    ).otherwise(raw)
    exact = scoped.distinct().groupBy("scope").agg(
        F.count("*").alias("exact_users")
    )
    return (
        stats.select("scope", F.round(est, 4).alias("est_users"))
        .join(exact, "scope")
        .select("scope", "est_users", "exact_users")
    )


ORACLE_HLL = f"""
hll_scoped AS (
  SELECT s.scope,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13))
              AS BIGINT) AS h
  FROM events, LATERAL (
    SELECT unnest([event_type, 'ALL']) AS scope) s
),
hll_regs AS (
  SELECT scope, CAST(h // {1 << HLL_W_BITS} AS BIGINT) AS bucket,
         max(CASE WHEN h % {1 << HLL_W_BITS} = 0 THEN {HLL_W_BITS + 1}
                  ELSE {HLL_W_BITS + 1}
                       - length(bin(h % {1 << HLL_W_BITS}))
             END) AS rho
  FROM hll_scoped GROUP BY 1, 2
),
hll_grid AS (
  SELECT scope, CAST(b AS BIGINT) AS bucket
  FROM (SELECT DISTINCT scope FROM hll_scoped),
       LATERAL unnest(range(0, {HLL_M})) AS g(b)
),
hll_full AS (
  SELECT g.scope, COALESCE(r.rho, 0) AS rho
  FROM hll_grid g LEFT JOIN hll_regs r USING (scope, bucket)
),
hll_stats AS (
  SELECT scope,
         sum(1.0 / (CAST(1 AS BIGINT) << rho)) AS z,
         CAST(sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS zeros
  FROM hll_full GROUP BY 1
),
hll_est AS (
  SELECT scope,
         round(CASE WHEN (0.7213 / (1.0 + 1.079 / {float(HLL_M)!r}))
                         * {float(HLL_M * HLL_M)!r} / z
                         <= {2.5 * HLL_M!r}
                    AND zeros > 0
               THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / zeros)
               ELSE (0.7213 / (1.0 + 1.079 / {float(HLL_M)!r}))
                    * {float(HLL_M * HLL_M)!r} / z
               END, 4) AS est_users
  FROM hll_stats
),
hll_exact AS (
  SELECT scope, CAST(count(*) AS BIGINT) AS exact_users
  FROM (SELECT DISTINCT scope, h FROM hll_scoped) GROUP BY 1
),
hll_distinct AS (
  SELECT e.scope, e.est_users, x.exact_users
  FROM hll_est e JOIN hll_exact x USING (scope)
)
"""


# ---------------------------------------------------------------------------
# LTTB-style parallel downsampling (largest-triangle, bucket anchors)
# ---------------------------------------------------------------------------

LTTB_BUCKETS = 32
LTTB_TYPE = "click"


def lttb_downsample(events: DataFrame) -> DataFrame:
    """Largest-Triangle downsampling (Steinarsson 2013) of the click
    value series to LTTB_BUCKETS points — the shape-preserving
    decimation charting stacks run before plotting millions of points.

    Sequential LTTB anchors each bucket's choice on the PREVIOUS
    SELECTED point — unparallelizable; this is the standard parallel
    variant that anchors on the neighbor buckets' means instead: every
    bucket's argmax-triangle-area pick depends only on static anchor
    points, so the whole pass is one agg + one bounded window. Anchor
    means are rounded(6) first, so both engines compute identical
    areas from identical inputs and the argmax is engine-exact (ties
    -> earliest ts, then event_id). First/last buckets pin the series
    endpoints, as in the original.

    Scale: bucket assignment is map-only integer math from a one-row
    (lo, hi) span agg; anchors are B rows broadcast back; the argmax
    window partitions by bucket. Output: bucket, ts_ms, value.
    """
    pts = (
        events.filter(
            (F.col("event_type") == LTTB_TYPE)
            & F.col("value").isNotNull()
        )
        .select(
            F.unix_micros("ts").alias("ts_us"), "value", "event_id"
        )
    )
    bounds = pts.agg(
        F.min("ts_us").alias("lo"), F.max("ts_us").alias("hi")
    )
    binned = pts.crossJoin(F.broadcast(bounds)).select(
        F.expr(
            f"CAST((ts_us - lo) * {LTTB_BUCKETS} DIV (hi - lo + 1)"
            " AS INT)"
        ).alias("bucket"),
        (F.col("ts_us") - F.col("lo")).alias("x"),
        F.col("value").alias("y"),
        "ts_us",
        "event_id",
    )
    anchors = binned.groupBy("bucket").agg(
        F.round(
            F.sum("x").cast("double") / F.count("*"), 6
        ).alias("ax"),
        F.round(F.sum("y") / F.count("*"), 6).alias("ay"),
    )
    a_prev = anchors.select(
        (F.col("bucket") + 1).alias("bucket"),
        F.col("ax").alias("x1"),
        F.col("ay").alias("y1"),
    )
    a_next = anchors.select(
        (F.col("bucket") - 1).alias("bucket"),
        F.col("ax").alias("x3"),
        F.col("ay").alias("y3"),
    )
    mid = (
        binned.join(F.broadcast(a_prev), "bucket")
        .join(F.broadcast(a_next), "bucket")
        .withColumn(
            "area",
            F.abs(
                (F.col("x1") - F.col("x3")) * (F.col("y") - F.col("y3"))
                - (F.col("x") - F.col("x3"))
                * (F.col("y1") - F.col("y3"))
            ),
        )
    )
    w_area = Window.partitionBy("bucket").orderBy(
        F.col("area").desc(), "ts_us", "event_id"
    )
    picks_mid = (
        mid.withColumn("rn", F.row_number().over(w_area))
        .filter(F.col("rn") == 1)
        .select("bucket", "ts_us", "y")
    )
    w_first = Window.partitionBy("bucket").orderBy("ts_us", "event_id")
    w_last = Window.partitionBy("bucket").orderBy(
        F.col("ts_us").desc(), F.col("event_id").desc()
    )
    first = (
        binned.filter(F.col("bucket") == 0)
        .withColumn("rn", F.row_number().over(w_first))
        .filter(F.col("rn") == 1)
        .select("bucket", "ts_us", "y")
    )
    last = (
        binned.filter(F.col("bucket") == LTTB_BUCKETS - 1)
        .withColumn("rn", F.row_number().over(w_last))
        .filter(F.col("rn") == 1)
        .select("bucket", "ts_us", "y")
    )
    return (
        first.unionByName(picks_mid.filter(
            (F.col("bucket") > 0) & (F.col("bucket") < LTTB_BUCKETS - 1)
        ))
        .unionByName(last)
        .select(
            "bucket",
            F.expr("CAST(ts_us DIV 1000 AS BIGINT)").alias("ts_ms"),
            F.col("y").alias("value"),
        )
    )


ORACLE_LTTB = f"""
lt_pts AS (
  SELECT epoch_us(ts) AS ts_us, value, event_id
  FROM events
  WHERE event_type = '{LTTB_TYPE}' AND value IS NOT NULL
),
lt_bounds AS (SELECT min(ts_us) AS lo, max(ts_us) AS hi FROM lt_pts),
lt_binned AS (
  SELECT CAST((ts_us - lo) * {LTTB_BUCKETS} // (hi - lo + 1) AS INT)
           AS bucket,
         ts_us - lo AS x, value AS y, ts_us, event_id
  FROM lt_pts, lt_bounds
),
lt_anchors AS (
  SELECT bucket,
         round(CAST(sum(x) AS DOUBLE) / count(*), 6) AS ax,
         round(sum(y) / count(*), 6) AS ay
  FROM lt_binned GROUP BY 1
),
lt_mid AS (
  SELECT b.bucket, b.ts_us, b.y,
         abs((p.ax - n.ax) * (b.y - n.ay)
             - (b.x - n.ax) * (p.ay - n.ay)) AS area,
         b.event_id
  FROM lt_binned b
  JOIN lt_anchors p ON p.bucket = b.bucket - 1
  JOIN lt_anchors n ON n.bucket = b.bucket + 1
),
lt_picks AS (
  SELECT bucket, ts_us, y FROM lt_mid
  QUALIFY row_number() OVER (
    PARTITION BY bucket ORDER BY area DESC, ts_us, event_id) = 1
),
lt_first AS (
  SELECT bucket, ts_us, y FROM lt_binned WHERE bucket = 0
  QUALIFY row_number() OVER (ORDER BY ts_us, event_id) = 1
),
lt_last AS (
  SELECT bucket, ts_us, y FROM lt_binned
  WHERE bucket = {LTTB_BUCKETS - 1}
  QUALIFY row_number() OVER (ORDER BY ts_us DESC, event_id DESC) = 1
),
lttb_downsample AS (
  SELECT bucket, CAST(ts_us // 1000 AS BIGINT) AS ts_ms, y AS value
  FROM (SELECT * FROM lt_first
        UNION ALL
        SELECT * FROM lt_picks
        WHERE bucket > 0 AND bucket < {LTTB_BUCKETS - 1}
        UNION ALL
        SELECT * FROM lt_last)
)
"""


# ---------------------------------------------------------------------------
# Markov next-event prediction accuracy (model backtest)
# ---------------------------------------------------------------------------


def markov_predict_eval(events: DataFrame) -> DataFrame:
    """Backtest of the first-order Markov model: predict each user's
    next event type as the argmax transition from the global matrix
    (ties -> alphabetical), score against what actually happened —
    the evaluation loop that turns `markov_transitions` from a
    descriptive table into a validated predictor.

    The transition pairs come from the same one-window pass as the
    model; the argmax per from_type is a packed max over the tiny
    |types|^2 count table; accuracy is a ratio of integral counts.
    Output per from_type: predicted_next, n_transitions, n_correct,
    accuracy (round 6).
    """
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts"), "event_id"
    )
    pairs = (
        events.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n"))
    )
    wmax = Window.partitionBy("from_type")
    pred = (
        pairs.withColumn("mx", F.max("n").over(wmax))
        .filter(F.col("n") == F.col("mx"))
        .groupBy("from_type")
        .agg(F.min("to_type").alias("predicted_next"))
    )
    return (
        pairs.join(F.broadcast(pred), "from_type")
        .groupBy("from_type", "predicted_next")
        .agg(
            F.sum("n").alias("n_transitions"),
            F.sum(
                F.when(
                    F.col("to_type") == F.col("predicted_next"),
                    F.col("n"),
                ).otherwise(0)
            ).alias("n_correct"),
        )
        .select(
            "from_type",
            "predicted_next",
            "n_transitions",
            "n_correct",
            F.round(
                F.col("n_correct") / F.col("n_transitions"), 6
            ).alias("accuracy"),
        )
    )


ORACLE_MARKOV_PREDICT = """
mp_pairs AS (
  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n FROM (
    SELECT event_type AS from_type,
           lead(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS to_type
    FROM events)
  WHERE to_type IS NOT NULL GROUP BY 1, 2
),
mp_pred AS (
  SELECT from_type, min(to_type) AS predicted_next FROM (
    SELECT *, max(n) OVER (PARTITION BY from_type) AS mx FROM mp_pairs)
  WHERE n = mx GROUP BY 1
),
markov_predict AS (
  SELECT p.from_type, d.predicted_next,
         CAST(sum(p.n) AS BIGINT) AS n_transitions,
         CAST(sum(CASE WHEN p.to_type = d.predicted_next THEN p.n
                       ELSE 0 END) AS BIGINT) AS n_correct,
         round(sum(CASE WHEN p.to_type = d.predicted_next THEN p.n
                        ELSE 0 END) / sum(p.n), 6) AS accuracy
  FROM mp_pairs p JOIN mp_pred d USING (from_type)
  GROUP BY 1, 2
)
"""


# ---------------------------------------------------------------------------
# event-type correlation matrix (hourly count series)
# ---------------------------------------------------------------------------


def type_correlations(events: DataFrame) -> DataFrame:
    """Pearson correlation between event types' hourly count series —
    "do errors spike with clicks?" — computed from integral sums only:
    counts are exact, the five correlation sums (n, sx, sy, sxx, syy,
    sxy) are BIGINT, and the final r is one identical double
    expression per pair, rounded(6). Missing hours count as zero via
    the dense hour grid (the `gapfill` trick), which matters: without
    densify, correlation silently conditions on "both active".

    Shape: one (hour, type) count-agg, pivot to pairs by self-join on
    hour (|types|^2 * hours rows, tiny), one sum-agg per pair.
    Output: type_a, type_b (a < b), n_hours, r.
    """
    hourly = events.groupBy(
        F.unix_millis(F.date_trunc("hour", "ts")).alias("hour_ms"),
        "event_type",
    ).agg(F.count("*").alias("n"))
    span = hourly.agg(
        F.min("hour_ms").alias("lo"), F.max("hour_ms").alias("hi")
    )
    hours = span.select(
        F.explode(
            F.expr("sequence(lo, hi, 3600000)")
        ).alias("hour_ms")
    )
    grid = hours.crossJoin(
        events.select("event_type").distinct()
    ).join(hourly, ["hour_ms", "event_type"], "left").select(
        "hour_ms",
        "event_type",
        F.coalesce("n", F.lit(0)).alias("n"),
    )
    a = grid.select(
        "hour_ms", F.col("event_type").alias("type_a"),
        F.col("n").alias("x"),
    )
    b = grid.select(
        "hour_ms", F.col("event_type").alias("type_b"),
        F.col("n").alias("y"),
    )
    pairs = a.join(b, "hour_ms").filter(F.col("type_a") < F.col("type_b"))
    s = pairs.groupBy("type_a", "type_b").agg(
        F.count("*").alias("n_hours"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    num = F.col("n_hours") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (
            F.col("n_hours") * F.col("sxx") - F.col("sx") * F.col("sx")
        ).cast("double")
        * (
            F.col("n_hours") * F.col("syy") - F.col("sy") * F.col("sy")
        ).cast("double")
    )
    return s.select(
        "type_a",
        "type_b",
        "n_hours",
        F.round(num.cast("double") / den, 6).alias("r"),
    )


ORACLE_TYPE_CORR = """
tc2_hourly AS (
  SELECT epoch_ms(date_trunc('hour', ts)) AS hour_ms, event_type,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
tc2_span AS (SELECT min(hour_ms) AS lo, max(hour_ms) AS hi
             FROM tc2_hourly),
tc2_grid AS (
  SELECT g.hour_ms, t.event_type, COALESCE(h.n, 0) AS n
  FROM (SELECT unnest(generate_series(lo, hi, 3600000)) AS hour_ms
        FROM tc2_span) g
  CROSS JOIN (SELECT DISTINCT event_type FROM events) t
  LEFT JOIN tc2_hourly h USING (hour_ms, event_type)
),
tc2_s AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(count(*) AS BIGINT) AS n_hours,
         CAST(sum(a.n) AS BIGINT) AS sx, CAST(sum(b.n) AS BIGINT) AS sy,
         CAST(sum(a.n * a.n) AS BIGINT) AS sxx,
         CAST(sum(b.n * b.n) AS BIGINT) AS syy,
         CAST(sum(a.n * b.n) AS BIGINT) AS sxy
  FROM tc2_grid a JOIN tc2_grid b USING (hour_ms)
  WHERE a.event_type < b.event_type
  GROUP BY 1, 2
),
type_correlations AS (
  SELECT type_a, type_b, n_hours,
         round(CAST(n_hours * sxy - sx * sy AS DOUBLE)
               / sqrt(CAST(n_hours * sxx - sx * sx AS DOUBLE)
                      * CAST(n_hours * syy - sy * sy AS DOUBLE)), 6)
           AS r
  FROM tc2_s
)
"""


# ---------------------------------------------------------------------------
# bitmap audience sketch: day-over-day retention
# ---------------------------------------------------------------------------

BM_BITS = 63


def bitmap_retention(events: DataFrame) -> DataFrame:
    """Audience-overlap via bitmap sketches: each day's active users
    collapse into ONE 63-bit bitmap (bit = md5 bucket of user_id,
    ``bit_or`` agg); day-over-day overlap is then popcount algebra on
    two BIGINTs — the roaring-bitmap/audience-sketch pattern ad and
    analytics stores use for instant segment intersections, at its
    smallest useful size (production uses 2^20+ bits; the shape is
    identical and the bit width is one constant).

    Estimates are coarse (63 buckets saturate fast — the point of the
    test is the mechanism, not precision); determinism comes from md5
    bucketing, so overlap counts hash-verify exactly. Scale: the
    bitmap agg is ONE map-side-combinable pass to a |days|-row table;
    every pairwise overlap after that is constant-time integer work —
    no re-touch of events, ever. Output per consecutive-day pair:
    day, next_day, bits_day, bits_next, bits_both, jaccard_bits.
    """
    day = F.to_date("ts").cast("string").alias("day")
    bit = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 13), 16, 10
    ).cast("bigint") % BM_BITS
    daily = (
        events.select(day, bit.alias("bit"))
        .select("day", F.expr("shiftleft(1L, CAST(bit AS INT))").alias("m"))
        .groupBy("day")
        .agg(F.expr("bit_or(m)").alias("bm"))
    )
    w = Window.orderBy("day")
    pairs = daily.select(
        "day",
        "bm",
        F.lead("day").over(w).alias("next_day"),
        F.lead("bm").over(w).alias("bm_next"),
    ).filter(F.col("next_day").isNotNull())
    both = F.expr("bit_count(bm & bm_next)")
    either = F.expr("bit_count(bm | bm_next)")
    return pairs.select(
        "day",
        "next_day",
        F.expr("bit_count(bm)").alias("bits_day"),
        F.expr("bit_count(bm_next)").alias("bits_next"),
        both.alias("bits_both"),
        F.round(both / either, 6).alias("jaccard_bits"),
    )


ORACLE_BITMAP_RETENTION = f"""
bm_daily AS (
  SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
         CAST(bit_or(CAST(1 AS BIGINT) << CAST(
           CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13))
                AS BIGINT) % {BM_BITS} AS INT))
         AS BIGINT) AS bm
  FROM events GROUP BY 1
),
bm_pairs AS (
  SELECT day, bm,
         lead(day) OVER (ORDER BY day) AS next_day,
         lead(bm) OVER (ORDER BY day) AS bm_next
  FROM bm_daily
),
bitmap_retention AS (
  SELECT day, next_day,
         CAST(bit_count(bm) AS INT) AS bits_day,
         CAST(bit_count(bm_next) AS INT) AS bits_next,
         CAST(bit_count(bm & bm_next) AS INT) AS bits_both,
         round(CAST(bit_count(bm & bm_next) AS DOUBLE)
               / bit_count(bm | bm_next), 6) AS jaccard_bits
  FROM bm_pairs WHERE next_day IS NOT NULL
)
"""


# ---------------------------------------------------------------------------
# Kaplan-Meier survival curve (user churn)
# ---------------------------------------------------------------------------

KM_CENSOR_DAYS = 7


def km_survival(events: DataFrame) -> DataFrame:
    """Kaplan-Meier survival estimator over user lifetimes: duration =
    days between a user's first and last event; users still active in
    the final KM_CENSOR_DAYS of the observation window are CENSORED
    (they inform the risk sets but contribute no churn event) — the
    right-censoring handling that makes KM the survival tool naive
    "avg lifetime" cannot be.

    S(t) = prod over churn times <= t of (1 - d_i/n_i). The product is
    a cumulative sum of ln terms over the ORDERED distinct-duration
    table (bounded by the day span, not users), so both engines fold
    in the identical order; output rounds(6). n_i (at risk) = total
    minus the running count of users who exited earlier. Output per
    churn time: t_days, n_risk, n_churned, survival.
    """
    spans = events.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("d0"),
        F.max(F.to_date("ts")).alias("d1"),
    )
    horizon = events.agg(F.max(F.to_date("ts")).alias("dmax"))
    users = spans.crossJoin(F.broadcast(horizon)).select(
        F.datediff("d1", "d0").alias("t_days"),
        (
            F.datediff("dmax", "d1") < KM_CENSOR_DAYS
        ).alias("censored"),
    )
    per_t = users.groupBy("t_days").agg(
        F.count("*").alias("n_exit"),
        F.sum(F.when(~F.col("censored"), 1).otherwise(0)).alias(
            "n_churned"
        ),
    )
    w = Window.orderBy("t_days").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wS = Window.orderBy("t_days").rowsBetween(
        Window.unboundedPreceding, 0
    )
    total = users.count()
    curve = (
        per_t.withColumn(
            "n_risk",
            F.lit(total) - F.coalesce(F.sum("n_exit").over(w), F.lit(0)),
        )
        .withColumn(
            "lnterm",
            F.when(
                F.col("n_churned") > 0,
                F.log(
                    F.lit(1.0)
                    - F.col("n_churned") / F.col("n_risk")
                ),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "survival", F.round(F.exp(F.sum("lnterm").over(wS)), 6)
        )
    )
    return curve.filter(F.col("n_churned") > 0).select(
        "t_days", "n_risk", "n_churned", "survival"
    )


ORACLE_KM_SURVIVAL = f"""
kms_u AS (
  SELECT date_diff('day', d0, d1) AS t_days,
         date_diff('day', d1,
                   (SELECT max(CAST(ts AS DATE)) FROM events))
           < {KM_CENSOR_DAYS} AS censored
  FROM (SELECT user_id, min(CAST(ts AS DATE)) AS d0,
               max(CAST(ts AS DATE)) AS d1
        FROM events GROUP BY 1)
),
kms_t AS (
  SELECT t_days, CAST(count(*) AS BIGINT) AS n_exit,
         CAST(sum(CASE WHEN NOT censored THEN 1 ELSE 0 END) AS BIGINT)
           AS n_churned
  FROM kms_u GROUP BY 1
),
kms_c AS (
  SELECT t_days, n_churned,
         (SELECT count(*) FROM kms_u)
           - COALESCE(sum(n_exit) OVER (ORDER BY t_days
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS n_risk,
         CASE WHEN n_churned > 0
              THEN ln(1.0 - n_churned / ((SELECT count(*) FROM kms_u)
                   - COALESCE(sum(n_exit) OVER (ORDER BY t_days
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0)))
              ELSE 0.0 END AS lnterm
  FROM kms_t
),
km_survival AS (
  SELECT t_days, CAST(n_risk AS BIGINT) AS n_risk, n_churned,
         round(exp(sum(lnterm) OVER (ORDER BY t_days
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
           AS survival
  FROM kms_c
  WHERE n_churned > 0
)
"""


# ---------------------------------------------------------------------------
# concurrent-session curve (sweep line, bucketed prefix sums)
# ---------------------------------------------------------------------------

CONC_GAP_MS = 30 * 60 * 1000


def concurrency_curve(events: DataFrame) -> DataFrame:
    """Peak concurrent sessions per hour — the capacity-planning curve
    ("how many users are on at once"). Sessions are the standard
    30-min-gap splits; each becomes +1 at its start and -1 just after
    its last event; the running sum of deltas IS the live concurrency
    (the classic sweep line / interval stabbing reduction).

    The running sum is distributed with the bucketed-prefix-sum trick
    (`ks_drift_test` convention): per-hour delta totals -> tiny offset
    table -> within-hour window, so no global sort exists; ordering
    (ts, delta) processes ends before starts at the same instant, so
    back-to-back sessions never double-count. Output: hour_ms,
    peak_concurrency, n_boundaries.
    """
    w = Window.partitionBy("user_id").orderBy("ms", "event_id")
    sess = (
        events.select(
            "user_id",
            F.unix_millis("ts").alias("ms"),
            "event_id",
        )
        .withColumn("prev", F.lag("ms").over(w))
        .withColumn(
            "new_s",
            F.when(
                F.col("prev").isNull()
                | (F.col("ms") - F.col("prev") > CONC_GAP_MS),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "seq",
            F.sum("new_s").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("user_id", "seq")
        .agg(
            F.min("ms").alias("start_ms"),
            (F.max("ms") + 1).alias("end_ms"),
        )
    )
    deltas = sess.select(
        F.col("start_ms").alias("ms"), F.lit(1).alias("delta")
    ).unionByName(
        sess.select(
            F.col("end_ms").alias("ms"), F.lit(-1).alias("delta")
        )
    ).withColumn("hour_ms", F.col("ms") - F.col("ms") % 3600000)
    btot = deltas.groupBy("hour_ms").agg(F.sum("delta").alias("bsum"))
    woff = Window.orderBy("hour_ms").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = btot.select(
        "hour_ms",
        F.coalesce(F.sum("bsum").over(woff), F.lit(0)).alias("off"),
    )
    wrun = (
        Window.partitionBy("hour_ms")
        .orderBy("ms", "delta")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    running = deltas.join(F.broadcast(offsets), "hour_ms").withColumn(
        "live", F.col("off") + F.sum("delta").over(wrun)
    )
    return running.groupBy("hour_ms").agg(
        F.max("live").alias("peak_concurrency"),
        F.count("*").alias("n_boundaries"),
    )


ORACLE_CONCURRENCY = f"""
cc_sess AS (
  SELECT user_id, seq, min(ms) AS start_ms, max(ms) + 1 AS end_ms
  FROM (
    SELECT user_id, ms,
           sum(new_s) OVER (PARTITION BY user_id ORDER BY ms, event_id
             ROWS UNBOUNDED PRECEDING) AS seq
    FROM (
      SELECT user_id, epoch_ms(ts) AS ms, event_id,
             CASE WHEN lag(epoch_ms(ts)) OVER
                    (PARTITION BY user_id ORDER BY epoch_ms(ts),
                     event_id) IS NULL
                  OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER
                    (PARTITION BY user_id ORDER BY epoch_ms(ts),
                     event_id) > {CONC_GAP_MS}
             THEN 1 ELSE 0 END AS new_s
      FROM events))
  GROUP BY 1, 2
),
cc_d AS (
  SELECT ms, delta, ms - ms % 3600000 AS hour_ms FROM (
    SELECT start_ms AS ms, 1 AS delta FROM cc_sess
    UNION ALL
    SELECT end_ms, -1 FROM cc_sess)
),
cc_off AS (
  SELECT hour_ms,
         COALESCE(sum(bsum) OVER (ORDER BY hour_ms
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS off
  FROM (SELECT hour_ms, sum(delta) AS bsum FROM cc_d GROUP BY 1)
),
concurrency_curve AS (
  SELECT hour_ms,
         CAST(max(live) AS BIGINT) AS peak_concurrency,
         CAST(count(*) AS BIGINT) AS n_boundaries
  FROM (
    SELECT d.hour_ms,
           o.off + sum(d.delta) OVER (PARTITION BY d.hour_ms
             ORDER BY d.ms, d.delta ROWS UNBOUNDED PRECEDING) AS live
    FROM cc_d d JOIN cc_off o USING (hour_ms))
  GROUP BY 1
)
"""


# ---------------------------------------------------------------------------
# STL-lite seasonal decomposition of the daily event series
# ---------------------------------------------------------------------------


def stl_decompose(events: DataFrame) -> DataFrame:
    """Classical seasonal decomposition (the moving-average STL
    predecessor) of the daily event-count series: trend = centered
    7-day moving average on the DENSE day grid (gap days count 0 —
    without densify the window silently spans gaps), seasonal =
    day-of-week mean of the detrended series, remainder = the rest.
    The decomposition under every "is Monday really our slow day"
    question; its remainder is what the anomaly detectors should be
    fed (they currently see raw counts, trend and all).

    Counts are integers, the 7-day window sum is exact, and seasonal
    means round(6) before subtraction — engine-exact throughout. The
    day-grain table bounds every window. Output (full-window days
    only): day, n_events, trend, seasonal, remainder.
    """
    daily = events.groupBy(F.to_date("ts").alias("d")).agg(
        F.count("*").alias("n")
    )
    span = events.agg(
        F.min(F.to_date("ts")).alias("lo"),
        F.max(F.to_date("ts")).alias("hi"),
    )
    grid = span.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("d")
    )
    dense = grid.join(daily, "d", "left").select(
        "d", F.coalesce("n", F.lit(0)).alias("n")
    )
    w7 = Window.orderBy("d").rowsBetween(-3, 3)
    trended = (
        dense.withColumn("wn", F.count("*").over(w7))
        .withColumn(
            "trend",
            F.round(F.sum("n").over(w7) / F.lit(7.0), 6),
        )
        .filter(F.col("wn") == 7)
        .withColumn("detr", F.col("n") - F.col("trend"))
        .withColumn("dow", F.dayofweek("d"))
    )
    seas = trended.groupBy("dow").agg(
        F.round(F.sum("detr") / F.count("*"), 6).alias("seasonal")
    )
    return (
        trended.join(F.broadcast(seas), "dow")
        .select(
            F.col("d").cast("string").alias("day"),
            F.col("n").alias("n_events"),
            "trend",
            "seasonal",
            F.round(
                F.col("n") - F.col("trend") - F.col("seasonal"), 6
            ).alias("remainder"),
        )
    )


ORACLE_STL = """
stl_daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
stl_span AS (
  SELECT min(CAST(ts AS DATE)) AS lo, max(CAST(ts AS DATE)) AS hi
  FROM events
),
stl_dense AS (
  SELECT CAST(g.d AS DATE) AS d, COALESCE(y.n, 0) AS n
  FROM (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS d
        FROM stl_span) g
  LEFT JOIN stl_daily y ON y.d = CAST(g.d AS DATE)
),
stl_t AS (
  SELECT d, n,
         count(*) OVER w AS wn,
         round(sum(n) OVER w / CAST(7.0 AS DOUBLE), 6) AS trend
  FROM stl_dense
  WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
stl_d AS (
  SELECT d, n, trend, n - trend AS detr,
         dayofweek(d) AS dow
  FROM stl_t WHERE wn = 7
),
stl_s AS (
  SELECT dow, round(sum(detr) / count(*), 6) AS seasonal
  FROM stl_d GROUP BY 1
),
stl_decompose AS (
  SELECT CAST(t.d AS VARCHAR) AS day, t.n AS n_events, t.trend,
         s.seasonal,
         round(t.n - t.trend - s.seasonal, 6) AS remainder
  FROM stl_d t JOIN stl_s s USING (dow)
)
"""


# ---------------------------------------------------------------------------
# time-weighted average value (TWAP) per event type
# ---------------------------------------------------------------------------


def twap_by_type(events: DataFrame) -> DataFrame:
    """Time-weighted average value per event type (TWAP): each sample
    is weighted by how long it was the latest observation (step-
    function integral / total duration) — the correct summary of an
    IRREGULARLY-sampled series, where the plain mean silently
    over-weights bursts (both are emitted; their gap measures the
    sampling bias).

    One lead window per type builds the holding intervals; the rest
    is two sums. At 100 TB the per-type window partitions by a
    low-cardinality key — the production form pre-buckets by (type,
    day) and stitches boundaries, same trick as the sweep-line ops.
    Output: event_type, n_segments, twap, plain_mean (round 6).
    """
    pts = events.filter(F.col("value").isNotNull()).select(
        "event_type",
        F.unix_millis("ts").alias("ms"),
        "event_id",
        "value",
    )
    w = Window.partitionBy("event_type").orderBy("ms", "event_id")
    seg = (
        pts.withColumn("next_ms", F.lead("ms").over(w))
        .filter(F.col("next_ms").isNotNull())
        .withColumn("wgt", F.col("next_ms") - F.col("ms"))
    )
    return seg.groupBy("event_type").agg(
        F.count("*").alias("n_segments"),
        F.round(
            F.sum(F.col("value") * F.col("wgt")) / F.sum("wgt"), 6
        ).alias("twap"),
        F.round(F.sum("value") / F.count("*"), 6).alias("plain_mean"),
    )


ORACLE_TWAP = """
tw_seg AS (
  SELECT event_type, value,
         lead(epoch_ms(ts)) OVER (PARTITION BY event_type
           ORDER BY epoch_ms(ts), event_id) - epoch_ms(ts) AS wgt
  FROM events WHERE value IS NOT NULL
),
twap_by_type AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_segments,
         round(sum(value * wgt) / sum(wgt), 6) AS twap,
         round(sum(value) / count(*), 6) AS plain_mean
  FROM tw_seg WHERE wgt IS NOT NULL
  GROUP BY 1
)
"""


# ---------------------------------------------------------------------------
# verified mergeable histogram quantiles
# ---------------------------------------------------------------------------

HQ_BIN_WIDTH = 5.0
HQ_PROBS = (0.5, 0.9, 0.99)


def histogram_quantiles(events: DataFrame) -> DataFrame:
    """Mergeable approximate quantiles from a fixed-width histogram —
    the verified member of the approx-quantile family
    (``approx_type_quantiles`` uses engine-specific percentile_approx
    -> rows-only; this sketch is engine-exact, so the ESTIMATES sit
    under the hash gate alongside exact-quantile truth columns).

    The sketch is the additive histogram: per (event_type, bin) counts
    with bin = floor(value / width). Additivity IS mergeability —
    map-side partial counts merged by the shuffle are exactly the
    per-partition-sketch merge a 100 TB deployment does across
    executors or days; unlike percentile_approx's GK sketch, the
    merge is lossless and order-independent, which is why the result
    is verifiable at all. Estimate: rank r = ceil(p*n) lands in the
    first bin with cum >= r; linear interpolation inside the bin.
    Truth: exact type-7 quantiles via one per-type sort window.

    Scale: sketch = one hash-agg bounded by types x bins rows; exact
    truth is the only per-type sort (at 100 TB you drop the truth
    columns — they are the audit, not the operator). Output:
    event_type, p, est_q, exact_q, n.
    """
    hist = (
        events.groupBy(
            "event_type",
            F.floor(F.col("value") / F.lit(HQ_BIN_WIDTH)).alias("bin"),
        )
        .agg(F.count("*").alias("cnt"))
    )
    wc = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.select(
        "event_type", "bin", "cnt", F.sum("cnt").over(wc).alias("cum")
    )
    n = events.groupBy("event_type").agg(F.count("*").alias("n"))
    qs = n.select(
        "event_type",
        "n",
        F.explode(F.array(*[F.lit(p) for p in HQ_PROBS])).alias("p"),
    ).select(
        "event_type",
        "n",
        "p",
        F.ceil(F.col("p") * F.col("n")).cast("bigint").alias("r"),
    )
    est = (
        qs.join(cum, "event_type")
        .filter(F.col("cum") >= F.col("r"))
        .groupBy("event_type", "p", "n", "r")
        .agg(F.min("bin").alias("bin"))
        .join(cum, ["event_type", "bin"])
        .select(
            "event_type",
            "p",
            "n",
            F.round(
                F.col("bin") * F.lit(HQ_BIN_WIDTH)
                + F.lit(HQ_BIN_WIDTH)
                * (F.col("r") - (F.col("cum") - F.col("cnt")))
                / F.col("cnt"),
                4,
            ).alias("est_q"),
        )
    )
    wv = Window.partitionBy("event_type").orderBy("value")
    vals = events.select(
        "event_type", "value", F.row_number().over(wv).alias("rn")
    )
    pos = qs.select(
        "event_type",
        "p",
        (F.col("p") * (F.col("n") - 1) + 1).alias("pos"),
    ).select(
        "event_type",
        "p",
        F.floor("pos").cast("bigint").alias("lo"),
        F.ceil("pos").cast("bigint").alias("hi"),
        (F.col("pos") - F.floor("pos")).alias("frac"),
    )
    exact = (
        pos.join(
            vals.select(
                "event_type", F.col("rn").alias("lo"), F.col("value").alias("vlo")
            ),
            ["event_type", "lo"],
        )
        .join(
            vals.select(
                "event_type", F.col("rn").alias("hi"), F.col("value").alias("vhi")
            ),
            ["event_type", "hi"],
        )
        .select(
            "event_type",
            "p",
            F.round(
                F.col("vlo") + F.col("frac") * (F.col("vhi") - F.col("vlo")),
                4,
            ).alias("exact_q"),
        )
    )
    return est.join(exact, ["event_type", "p"]).select(
        "event_type", "p", "est_q", "exact_q", "n"
    )


ORACLE_HISTOGRAM_QUANTILES = f"""
hq_hist AS (
  SELECT event_type, CAST(floor(value / {HQ_BIN_WIDTH!r}) AS BIGINT) AS bin,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
),
hq_cum AS (
  SELECT event_type, bin, cnt,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY bin
                        ROWS UNBOUNDED PRECEDING) AS cum
  FROM hq_hist
),
hq_n AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1
),
hq_qs AS (
  SELECT event_type, n, CAST(p AS DOUBLE) AS p,
         CAST(ceil(CAST(p AS DOUBLE) * n) AS BIGINT) AS r
  FROM hq_n, LATERAL unnest([{", ".join(repr(p) for p in HQ_PROBS)}]) AS t(p)
),
hq_est AS (
  SELECT q.event_type, q.p, q.n,
         round(b.bin * {HQ_BIN_WIDTH!r}
               + {HQ_BIN_WIDTH!r} * (q.r - (c2.cum - c2.cnt)) / c2.cnt,
               4) AS est_q
  FROM hq_qs q
  JOIN (
    SELECT q2.event_type, q2.p, min(c.bin) AS bin
    FROM hq_qs q2 JOIN hq_cum c
      ON c.event_type = q2.event_type AND c.cum >= q2.r
    GROUP BY 1, 2
  ) b ON b.event_type = q.event_type AND b.p = q.p
  JOIN hq_cum c2 ON c2.event_type = q.event_type AND c2.bin = b.bin
),
hq_vals AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn
  FROM events
),
hq_pos AS (
  SELECT event_type, p,
         CAST(floor(pos) AS BIGINT) AS lo,
         CAST(ceil(pos) AS BIGINT) AS hi,
         pos - floor(pos) AS frac
  FROM (SELECT event_type, p, p * (n - 1) + 1 AS pos FROM hq_qs)
),
hq_exact AS (
  SELECT p.event_type, p.p,
         round(vl.value + p.frac * (vh.value - vl.value), 4) AS exact_q
  FROM hq_pos p
  JOIN hq_vals vl ON vl.event_type = p.event_type AND vl.rn = p.lo
  JOIN hq_vals vh ON vh.event_type = p.event_type AND vh.rn = p.hi
),
histogram_quantiles AS (
  SELECT e.event_type, e.p, e.est_q, x.exact_q, e.n
  FROM hq_est e JOIN hq_exact x ON x.event_type = e.event_type AND x.p = e.p
)
"""


# ---------------------------------------------------------------------------
# verified Poisson bootstrap confidence interval
# ---------------------------------------------------------------------------

BOOT_B = 32
#: Poisson(1) CDF thresholds for k = 0..7 (k=8+ has p < 1.1e-5 and is
#: clamped — bias far below the rounding edge).
_POIS_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238463,
    0.9963401531726563,
    0.9994058151824183,
    0.999916758850712,
    0.9999897508033253,
)
_BOOT_DENOM = float(1 << 52)


def bootstrap_mean_ci(events: DataFrame, b: int = BOOT_B) -> DataFrame:
    """Poisson bootstrap (Chamandy et al., Google 2012) — THE
    distributed bootstrap: instead of resampling n rows with
    replacement B times (B shuffles of the corpus), each row draws an
    independent Poisson(1) replication count per replica, and every
    replica mean folds in ONE pass (B counters per partition, no
    resample materialization). The 95% CI of the mean event value is
    the 2.5/97.5 type-7 quantile of the B replica means.

    Verified: the Poisson draw is the inverse-CDF lookup on a 52-bit
    md5 of (event_id, replica) against exact double thresholds —
    deterministic in both engines, so the ENTIRE bootstrap
    distribution (every replica mean) and the CI hash-match the
    DuckDB replay. A seeded rand() bootstrap is engine-private; this
    one is auditable.

    Scale: the explode is rows x B but collapses immediately into the
    per-replica partial aggregate (map-side combine -> shuffle is B
    rows per partition); replica-quantile work is on B rows. Output:
    n_rows, mean_full, n_replicas, mean_of_means, ci_lo, ci_hi.
    """
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("event_id").cast("string"),
                        F.lit("~"),
                        F.col("b").cast("string"),
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("bigint")
        / F.lit(_BOOT_DENOM)
    )
    k = F.lit(len(_POIS_CDF))
    for i in range(len(_POIS_CDF) - 1, -1, -1):
        k = F.when(u < F.lit(_POIS_CDF[i]), F.lit(i)).otherwise(k)
    rep = (
        events.select("event_id", "value")
        .select(
            "event_id",
            "value",
            F.explode(F.sequence(F.lit(0), F.lit(b - 1))).alias("b"),
        )
        .select("b", F.col("value").alias("v"), k.alias("k"))
        .groupBy("b")
        .agg(
            (
                F.sum(F.col("k") * F.col("v")) / F.sum("k")
            ).alias("rep_mean")
        )
    )
    wq = Window.partitionBy(F.lit(1)).orderBy("rep_mean")
    ranked = rep.select(
        "rep_mean", F.row_number().over(wq).alias("rn")
    )

    def _q(p: float, alias: str) -> DataFrame:
        pos = p * (b - 1) + 1
        lo, hi, frac = int(pos), min(int(pos) + 1, b), pos - int(pos)
        vlo = ranked.filter(F.col("rn") == lo).select(
            F.col("rep_mean").alias("vlo")
        )
        vhi = ranked.filter(F.col("rn") == hi).select(
            F.col("rep_mean").alias("vhi")
        )
        return vlo.crossJoin(vhi).select(
            F.round(
                F.col("vlo") + F.lit(frac) * (F.col("vhi") - F.col("vlo")),
                6,
            ).alias(alias)
        )

    base = events.agg(
        F.count("*").alias("n_rows"),
        F.round(F.avg("value"), 6).alias("mean_full"),
    )
    reps = rep.agg(
        F.count("*").alias("n_replicas"),
        F.round(F.avg("rep_mean"), 6).alias("mean_of_means"),
    )
    return (
        base.crossJoin(F.broadcast(reps))
        .crossJoin(F.broadcast(_q(0.025, "ci_lo")))
        .crossJoin(F.broadcast(_q(0.975, "ci_hi")))
    )


def oracle_bootstrap_ci(b: int = BOOT_B) -> str:
    cdf_case = "CASE "
    for i, c in enumerate(_POIS_CDF):
        cdf_case += f"WHEN u < {c!r} THEN {i} "
    cdf_case += f"ELSE {len(_POIS_CDF)} END"
    lo_p, hi_p = 0.025 * (b - 1) + 1, 0.975 * (b - 1) + 1

    def q(pos: float, alias: str) -> str:
        lo, hi, frac = int(pos), min(int(pos) + 1, b), pos - int(pos)
        return (
            f"round((SELECT rep_mean FROM boot_rk WHERE rn = {lo})"
            f" + {frac!r} * ((SELECT rep_mean FROM boot_rk WHERE rn = {hi})"
            f" - (SELECT rep_mean FROM boot_rk WHERE rn = {lo})), 6)"
            f" AS {alias}"
        )

    return f"""
boot_k AS (
  SELECT b, value AS v,
         {cdf_case} AS k
  FROM (
    SELECT event_id, value, b,
           CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) || '~'
                 || CAST(b AS VARCHAR)), 1, 13)) AS BIGINT)
             / {_BOOT_DENOM!r} AS u
    FROM events, LATERAL unnest(range(0, {b})) AS t(b)
  )
),
boot_rep AS MATERIALIZED (
  SELECT b, sum(k * v) / sum(k) AS rep_mean FROM boot_k GROUP BY 1
),
boot_rk AS MATERIALIZED (
  SELECT rep_mean, row_number() OVER (ORDER BY rep_mean) AS rn
  FROM boot_rep
),
bootstrap_mean_ci AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM events) AS n_rows,
         (SELECT round(avg(value), 6) FROM events) AS mean_full,
         (SELECT CAST(count(*) AS BIGINT) FROM boot_rep) AS n_replicas,
         (SELECT round(avg(rep_mean), 6) FROM boot_rep) AS mean_of_means,
         {q(lo_p, "ci_lo")},
         {q(hi_p, "ci_hi")}
)
"""


# ---------------------------------------------------------------------------
# AR(2) Yule-Walker fit + forecast (closed-form autoregression)
# ---------------------------------------------------------------------------

#: daily revenue is scaled to integer cents so the series values are
#: exact; autocorrelations are ratios of double sums rounded at 9dp
#: (fold-order noise is ~1e-13 relative — the pre-rounded-moments
#: protocol), and phi/forecasts derive from the ROUNDED rhos only.
AR2_VAL_SCALE = 100
AR2_HORIZON = 3


def ar2_forecast(events: DataFrame) -> DataFrame:
    """AR(2) fit by Yule-Walker on the daily purchase-revenue series —
    the autoregressive rung of the forecasting ladder (EWMA/Holt/
    Holt-Winters smooth; AR models the serial correlation itself) and,
    like the verified OLS, a CLOSED-FORM solve:

        rho1 = c1/c0, rho2 = c2/c0      (autocorrelations)
        phi1 = rho1*(1 - rho2) / (1 - rho1^2)
        phi2 = (rho2 - rho1^2) / (1 - rho1^2)

    then an h-step forecast by the AR recursion on the demeaned last
    two observations. The series is DAYS-grain (bounded by calendar,
    never by corpus size), so the one global row_number window sorts
    at most a few thousand rows regardless of table size; everything
    corpus-sized happens in the first hash-agg.

    Output (stat, value): n_days, mean, rho1, rho2, phi1, phi2,
    fc_1..fc_h (forecast revenue, cents).
    """
    daily = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(
                F.expr(f"CAST(floor(value * {AR2_VAL_SCALE}) AS BIGINT)")
            ).alias("v")
        )
    )
    w = Window.orderBy("day")
    s = daily.select(
        "day", "v", F.row_number().over(w).alias("idx")
    ).select(
        "idx",
        F.col("v").alias("vi"),
        F.col("v").cast("double").alias("v"),
        F.lag("v", 1).over(Window.orderBy("idx")).cast("double").alias("v1"),
        F.lag("v", 2).over(Window.orderBy("idx")).cast("double").alias("v2"),
    )
    # mean from the EXACT integer sum (a double sum's fold-order noise
    # can reach the 6th decimal at this magnitude)
    base = s.agg(
        F.count("*").alias("n"), F.sum("vi").alias("sv")
    ).select("n", (F.col("sv") / F.col("n")).alias("m"))
    cs = (
        s.crossJoin(F.broadcast(base))
        .agg(
            F.first("n").alias("n"),
            F.first("m").alias("m"),
            F.sum((F.col("v") - F.col("m")) * (F.col("v") - F.col("m")))
            .alias("c0"),
            F.sum(
                (F.col("v") - F.col("m")) * (F.col("v1") - F.col("m"))
            ).alias("c1"),
            F.sum(
                (F.col("v") - F.col("m")) * (F.col("v2") - F.col("m"))
            ).alias("c2"),
            F.expr("max_by(v, idx)").alias("vlast"),
            F.expr("max_by(v1, idx)").alias("vprev"),
        )
        .select(
            "n",
            F.round("m", 6).alias("mean"),
            F.round(F.col("c1") / F.col("c0"), 9).alias("rho1"),
            F.round(F.col("c2") / F.col("c0"), 9).alias("rho2"),
            "vlast",
            "vprev",
        )
        .select(
            "*",
            F.round(
                F.col("rho1")
                * (1 - F.col("rho2"))
                / (1 - F.col("rho1") * F.col("rho1")),
                6,
            ).alias("phi1"),
            F.round(
                (F.col("rho2") - F.col("rho1") * F.col("rho1"))
                / (1 - F.col("rho1") * F.col("rho1")),
                6,
            ).alias("phi2"),
        )
    )
    # h-step recursion on the ROUNDED phis (deterministic end-to-end)
    fc_exprs = []
    x2, x1 = "(vprev - mean)", "(vlast - mean)"
    for h in range(1, AR2_HORIZON + 1):
        nxt = f"(phi1 * {x1} + phi2 * {x2})"
        fc_exprs.append(f"'fc_{h}', round(mean + {nxt}, 4)")
        x2, x1 = x1, nxt
    return cs.selectExpr(
        "stack("
        + str(6 + AR2_HORIZON)
        + ", 'n_days', CAST(n AS DOUBLE),"
        " 'mean', mean,"
        " 'rho1', round(rho1, 6), 'rho2', round(rho2, 6),"
        " 'phi1', phi1, 'phi2', phi2, "
        + ", ".join(fc_exprs)
        + ") AS (stat, value)"
    )


def oracle_ar2_forecast() -> str:
    fc_rows = []
    x2, x1 = "(vprev - mean)", "(vlast - mean)"
    for h in range(1, AR2_HORIZON + 1):
        nxt = f"(phi1 * {x1} + phi2 * {x2})"
        fc_rows.append(
            f"UNION ALL SELECT 'fc_{h}', round(mean + {nxt}, 4) FROM ar2p"
        )
        x2, x1 = x1, nxt
    return f"""
ar2_daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(sum(CAST(floor(value * {AR2_VAL_SCALE}) AS BIGINT))
              AS BIGINT) AS v
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1
),
ar2_s AS (
  SELECT idx, v AS vi, CAST(v AS DOUBLE) AS v,
         CAST(lag(v, 1) OVER (ORDER BY idx) AS DOUBLE) AS v1,
         CAST(lag(v, 2) OVER (ORDER BY idx) AS DOUBLE) AS v2
  FROM (SELECT day, v,
               row_number() OVER (ORDER BY day) AS idx
        FROM ar2_daily)
),
ar2_base AS (
  SELECT count(*) AS n,
         CAST(sum(vi) AS BIGINT) / CAST(count(*) AS DOUBLE) AS m
  FROM ar2_s
),
ar2_c AS (
  SELECT b.n, round(b.m, 6) AS mean,
         round(sum((s.v - b.m) * (s.v1 - b.m))
               / sum((s.v - b.m) * (s.v - b.m)), 9) AS rho1,
         round(sum((s.v - b.m) * (s.v2 - b.m))
               / sum((s.v - b.m) * (s.v - b.m)), 9) AS rho2,
         arg_max(s.v, s.idx) AS vlast,
         arg_max(s.v1, s.idx) AS vprev
  FROM ar2_s s, ar2_base b
  GROUP BY b.n, b.m
),
ar2p AS (
  SELECT *,
         round(rho1 * (1 - rho2) / (1 - rho1 * rho1), 6) AS phi1,
         round((rho2 - rho1 * rho1) / (1 - rho1 * rho1), 6) AS phi2
  FROM ar2_c
),
ar2_forecast AS (
  SELECT 'n_days' AS stat, CAST(n AS DOUBLE) AS value FROM ar2p
  UNION ALL SELECT 'mean', mean FROM ar2p
  UNION ALL SELECT 'rho1', round(rho1, 6) FROM ar2p
  UNION ALL SELECT 'rho2', round(rho2, 6) FROM ar2p
  UNION ALL SELECT 'phi1', phi1 FROM ar2p
  UNION ALL SELECT 'phi2', phi2 FROM ar2p
  {" ".join(fc_rows)}
)
"""


# ---------------------------------------------------------------------------
# multi-touch attribution (first / last / linear credit)
# ---------------------------------------------------------------------------

MTA_WINDOW_MS = 24 * 3600 * 1000


def attribution_report(events: DataFrame) -> DataFrame:
    """Multi-touch attribution: every purchase's journey is the same
    user's click/view touches in the 24h before it; credit is split
    by the four standard models — first_touch (all credit to the
    earliest touch), last_touch (latest), linear (1/k each),
    time_decay (weight halves every 6h of touch age: w = 2^-bucket,
    an exact DYADIC rational so the double sums are engine-exact,
    normalized per journey) — plus an 'unattributed' row for
    purchases with no preceding touch.

    Plan: purchases x touches is a per-user time-range join (bounded
    by a user's touches per day, never corpus-quadratic; the user_id
    shuffle key is uniform), then ONE window over each purchase's
    journey ranks first/last and counts k, and one hash-agg per model
    folds credit per channel. Millis integer arithmetic end-to-end;
    the only float is the linear 1/k fraction, rounded at the output
    edge (values O(1) — fold noise never reaches 4dp).

    Output: model, channel, touches, credit (round 4).
    """
    base = events.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_millis("ts").alias("ms"),
    )
    purchases = base.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"),
        F.col("event_id").alias("pid"),
        F.col("ms").alias("pms"),
    )
    touches = base.filter(
        F.col("event_type").isin("click", "view")
    ).select(
        "user_id",
        F.col("event_id").alias("tid"),
        F.col("event_type").alias("channel"),
        F.col("ms").alias("tms"),
    )
    journeys = purchases.join(touches, "user_id").filter(
        (F.col("tms") < F.col("pms"))
        & (F.col("tms") >= F.col("pms") - MTA_WINDOW_MS)
    )
    wp = Window.partitionBy("pid")
    # time-decay weight: halves per 6h age bucket — 2^-b is an exact
    # dyadic, so per-journey totals are exact and shares deterministic
    decay_w = F.lit(1.0) / F.expr(
        f"CAST(pow(2, (pms - tms) DIV {6 * 3600 * 1000}) AS DOUBLE)"
    )
    ranked = journeys.select(
        "pid",
        "channel",
        F.row_number()
        .over(wp.orderBy("tms", "tid"))
        .alias("rn_first"),
        F.row_number()
        .over(wp.orderBy(F.col("tms").desc(), F.col("tid").desc()))
        .alias("rn_last"),
        F.count("*").over(wp).alias("k"),
        decay_w.alias("w"),
        F.sum(decay_w).over(wp).alias("wtot"),
    )
    first = (
        ranked.filter(F.col("rn_first") == 1)
        .groupBy("channel")
        .agg(F.count("*").alias("touches"))
        .select(
            F.lit("first_touch").alias("model"),
            "channel",
            "touches",
            F.col("touches").cast("double").alias("credit"),
        )
    )
    last = (
        ranked.filter(F.col("rn_last") == 1)
        .groupBy("channel")
        .agg(F.count("*").alias("touches"))
        .select(
            F.lit("last_touch").alias("model"),
            "channel",
            "touches",
            F.col("touches").cast("double").alias("credit"),
        )
    )
    linear = (
        ranked.groupBy("channel")
        .agg(
            F.count("*").alias("touches"),
            F.round(F.sum(F.lit(1.0) / F.col("k")), 4).alias("credit"),
        )
        .select(F.lit("linear").alias("model"), "channel", "touches", "credit")
    )
    time_decay = (
        ranked.groupBy("channel")
        .agg(
            F.count("*").alias("touches"),
            F.round(F.sum(F.col("w") / F.col("wtot")), 4).alias(
                "credit"
            ),
        )
        .select(
            F.lit("time_decay").alias("model"),
            "channel",
            "touches",
            "credit",
        )
    )
    unattributed = (
        purchases.join(
            journeys.select("pid").distinct(), "pid", "left_anti"
        )
        .agg(F.count("*").alias("touches"))
        .select(
            F.lit("unattributed").alias("model"),
            F.lit("none").alias("channel"),
            "touches",
            F.col("touches").cast("double").alias("credit"),
        )
    )
    return (
        first.unionByName(last)
        .unionByName(linear)
        .unionByName(time_decay)
        .unionByName(unattributed)
    )


ORACLE_ATTRIBUTION = f"""
at_base AS (
  SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms FROM events
),
at_p AS (
  SELECT user_id, event_id AS pid, ms AS pms
  FROM at_base WHERE event_type = 'purchase'
),
at_t AS (
  SELECT user_id, event_id AS tid, event_type AS channel, ms AS tms
  FROM at_base WHERE event_type IN ('click', 'view')
),
at_j AS (
  SELECT p.pid, t.channel, t.tms, t.tid,
         CAST(1 AS DOUBLE)
           / CAST(pow(2, (p.pms - t.tms) // {6 * 3600 * 1000})
                  AS DOUBLE) AS w
  FROM at_p p JOIN at_t t ON p.user_id = t.user_id
  WHERE t.tms < p.pms AND t.tms >= p.pms - {MTA_WINDOW_MS}
),
at_r AS (
  SELECT pid, channel, w,
         row_number() OVER (PARTITION BY pid
                            ORDER BY tms, tid) AS rn_first,
         row_number() OVER (PARTITION BY pid
                            ORDER BY tms DESC, tid DESC) AS rn_last,
         count(*) OVER (PARTITION BY pid) AS k,
         sum(w) OVER (PARTITION BY pid) AS wtot
  FROM at_j
),
attribution_report AS (
  SELECT 'first_touch' AS model, channel,
         CAST(count(*) AS BIGINT) AS touches,
         CAST(count(*) AS DOUBLE) AS credit
  FROM at_r WHERE rn_first = 1 GROUP BY 2
  UNION ALL
  SELECT 'last_touch', channel, CAST(count(*) AS BIGINT),
         CAST(count(*) AS DOUBLE)
  FROM at_r WHERE rn_last = 1 GROUP BY 2
  UNION ALL
  SELECT 'linear', channel, CAST(count(*) AS BIGINT),
         round(sum(CAST(1 AS DOUBLE) / k), 4)
  FROM at_r GROUP BY 2
  UNION ALL
  SELECT 'time_decay', channel, CAST(count(*) AS BIGINT),
         round(sum(w / wtot), 4)
  FROM at_r GROUP BY 2
  UNION ALL
  SELECT 'unattributed', 'none', CAST(count(*) AS BIGINT),
         CAST(count(*) AS DOUBLE)
  FROM at_p WHERE pid NOT IN (SELECT DISTINCT pid FROM at_j)
)
"""


# ---------------------------------------------------------------------------
# revenue concentration: Lorenz curve + Gini coefficient
# ---------------------------------------------------------------------------

LORENZ_POINTS = 10


def revenue_concentration(events: DataFrame) -> DataFrame:
    """Lorenz curve (decile grain) + exact Gini coefficient of
    per-user purchase revenue — the concentration readout behind
    "top X% of users drive Y% of revenue". Spend is integer cents, so
    ranks, cumulative sums, and the Gini rank formula

        G = 2 * sum(i * g_i) / (n * sum(g)) - (n + 1) / n

    are exact integer aggregates until two final divisions (round 6).

    The user-grain rank i comes from the distributed
    ``ranking.global_ranked`` kernel (range exchange + local
    row_number + broadcast prefix offsets) — no single-partition sort
    at any |users|; the corpus-sized work is the one groupBy above
    it. Output rows: 'gini' + one Lorenz point per decile
    (cum_pop_frac, cum_revenue_frac round 6).
    """
    spend = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.sum(
                F.expr(f"CAST(floor(value * {AR2_VAL_SCALE}) AS BIGINT)")
            ).alias("g")
        )
    )
    ranked = _rank.global_ranked(
        spend, [F.col("g"), F.col("user_id")]
    ).select("g", F.col("_rk").alias("i"))
    gini = ranked.agg(
        F.count("*").alias("n"),
        F.sum("g").alias("sg"),
        F.sum(F.col("i") * F.col("g")).alias("sig"),
    ).select(
        F.lit("gini").alias("stat"),
        F.lit(None).cast("int").alias("decile"),
        F.round(
            F.lit(2) * F.col("sig")
            / (F.col("n") * F.col("sg").cast("double"))
            - (F.col("n") + 1) / F.col("n").cast("double"),
            6,
        ).alias("value"),
        F.lit(None).cast("double").alias("cum_revenue_frac"),
    )
    totals = ranked.agg(
        F.count("*").alias("n"), F.sum("g").alias("sg")
    )
    lorenz = (
        ranked.crossJoin(F.broadcast(totals))
        .select(
            F.expr(f"(i * {LORENZ_POINTS} + n - 1) DIV n").alias(
                "decile"
            ),
            "g",
            "sg",
        )
        .groupBy("decile")
        .agg(F.sum("g").alias("dg"), F.first("sg").alias("sg"))
        .select(
            F.lit("lorenz").alias("stat"),
            F.col("decile").cast("int"),
            (F.col("decile") / F.lit(float(LORENZ_POINTS))).alias(
                "value"
            ),
            F.round(
                F.sum("dg").over(
                    Window.orderBy("decile").rowsBetween(
                        Window.unboundedPreceding, 0
                    )
                )
                / F.col("sg").cast("double"),
                6,
            ).alias("cum_revenue_frac"),
        )
    )
    return gini.unionByName(lorenz)


ORACLE_REVENUE_CONCENTRATION = f"""
rc_spend AS (
  SELECT user_id,
         CAST(sum(CAST(floor(value * {AR2_VAL_SCALE}) AS BIGINT))
              AS BIGINT) AS g
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1
),
rc_ranked AS (
  SELECT g, row_number() OVER (ORDER BY g, user_id) AS i FROM rc_spend
),
rc_tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(g) AS BIGINT) AS sg,
         CAST(sum(i * g) AS BIGINT) AS sig
  FROM rc_ranked
),
rc_lorenz AS (
  SELECT (i * {LORENZ_POINTS} + t.n - 1) // t.n AS decile,
         CAST(sum(g) AS BIGINT) AS dg, max(t.sg) AS sg
  FROM rc_ranked r, rc_tot t
  GROUP BY 1
),
revenue_concentration AS (
  SELECT 'gini' AS stat, CAST(NULL AS INT) AS decile,
         round(2 * sig / (n * CAST(sg AS DOUBLE))
               - (n + 1) / CAST(n AS DOUBLE), 6) AS value,
         CAST(NULL AS DOUBLE) AS cum_revenue_frac
  FROM rc_tot
  UNION ALL
  SELECT 'lorenz', CAST(decile AS INT),
         decile / CAST({LORENZ_POINTS} AS DOUBLE),
         round(sum(dg) OVER (ORDER BY decile
                             ROWS UNBOUNDED PRECEDING)
               / CAST(sg AS DOUBLE), 6)
  FROM rc_lorenz
)
"""


# ---------------------------------------------------------------------------
# CUPED variance reduction (pre-period covariate adjustment)
# ---------------------------------------------------------------------------

#: pre/post split day-of-month boundary for the CUPED report.
CUPED_SPLIT_DAY = 16


def cuped_report(events: DataFrame) -> DataFrame:
    """CUPED (Controlled-experiment Using Pre-Experiment Data; Deng
    et al. 2013): regress each user's post-period spend on their
    pre-period spend and subtract the predictable part —
    theta = cov(pre, post) / var(pre), adjusted = post - theta*pre —
    the standard way to shrink A/B-test confidence intervals without
    more traffic. The report quantifies the win: theta, raw vs
    adjusted variance, percent reduction.

    One user-grain agg (integer cents) -> one 1-row moment agg; the
    variance of the adjusted metric expands algebraically from the
    same moments with the PRE-ROUNDED theta, so the whole readout is
    engine-exact. Output (stat, value): n_users, theta, var_post,
    var_adj, reduction_pct.
    """
    per_user = events.filter(F.col("event_type") == "purchase").groupBy(
        "user_id"
    ).agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.dayofmonth("ts") < CUPED_SPLIT_DAY,
                    F.expr("CAST(floor(value * 100) AS BIGINT)"),
                )
            ),
            F.lit(0),
        ).alias("pre"),
        F.coalesce(
            F.sum(
                F.when(
                    F.dayofmonth("ts") >= CUPED_SPLIT_DAY,
                    F.expr("CAST(floor(value * 100) AS BIGINT)"),
                )
            ),
            F.lit(0),
        ).alias("post"),
    )
    m = per_user.agg(
        F.count("*").alias("n"),
        F.sum("pre").alias("sp"),
        F.sum("post").alias("so"),
        F.sum(F.col("pre") * F.col("pre")).alias("spp"),
        F.sum(F.col("pre") * F.col("post")).alias("spo"),
        F.sum(F.col("post") * F.col("post")).alias("soo"),
    )
    return m.selectExpr(
        "CAST(n AS BIGINT) AS n",
        "CAST(sp AS DOUBLE) AS sp",
        "CAST(so AS DOUBLE) AS so",
        "CAST(spp AS DOUBLE) AS spp",
        "CAST(spo AS DOUBLE) AS spo",
        "CAST(soo AS DOUBLE) AS soo",
    ).selectExpr(
        "n", "sp", "so", "spp", "spo", "soo",
        "round((n * spo - sp * so) / (n * spp - sp * sp), 9) AS theta",
    ).selectExpr(
        "n",
        "theta",
        "round((soo - so * so / n) / (n - 1), 4) AS var_post",
        # Var(post - theta*pre) expanded from the same moments
        "round(((soo - 2 * theta * spo + theta * theta * spp)"
        " - (so - theta * sp) * (so - theta * sp) / n) / (n - 1), 4)"
        " AS var_adj",
    ).selectExpr(
        "stack(5,"
        " 'n_users', CAST(n AS DOUBLE),"
        " 'theta', round(theta, 6),"
        " 'var_post', var_post,"
        " 'var_adj', var_adj,"
        " 'reduction_pct', round(100.0 * (1.0 - var_adj / var_post), 4))"
        " AS (stat, value)"
    )


ORACLE_CUPED = f"""
cu_user AS (
  SELECT user_id,
         CAST(COALESCE(sum(CASE WHEN dayofmonth(ts) < {CUPED_SPLIT_DAY}
              THEN CAST(floor(value * 100) AS BIGINT) END), 0)
              AS BIGINT) AS pre,
         CAST(COALESCE(sum(CASE WHEN dayofmonth(ts) >= {CUPED_SPLIT_DAY}
              THEN CAST(floor(value * 100) AS BIGINT) END), 0)
              AS BIGINT) AS post
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1
),
cu_m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(pre) AS DOUBLE) AS sp,
         CAST(sum(post) AS DOUBLE) AS so,
         CAST(sum(pre * pre) AS DOUBLE) AS spp,
         CAST(sum(pre * post) AS DOUBLE) AS spo,
         CAST(sum(post * post) AS DOUBLE) AS soo
  FROM cu_user
),
cu_t AS (
  SELECT *, round((n * spo - sp * so) / (n * spp - sp * sp), 9) AS theta
  FROM cu_m
),
cu_v AS (
  SELECT n, theta,
         round((soo - so * so / n) / (n - 1), 4) AS var_post,
         round(((soo - 2 * theta * spo + theta * theta * spp)
                - (so - theta * sp) * (so - theta * sp) / n)
               / (n - 1), 4) AS var_adj
  FROM cu_t
),
cuped_report AS (
  SELECT 'n_users' AS stat, CAST(n AS DOUBLE) AS value FROM cu_v
  UNION ALL SELECT 'theta', round(theta, 6) FROM cu_v
  UNION ALL SELECT 'var_post', var_post FROM cu_v
  UNION ALL SELECT 'var_adj', var_adj FROM cu_v
  UNION ALL SELECT 'reduction_pct',
    round(100.0 * (1.0 - var_adj / var_post), 4) FROM cu_v
)
"""


# ---------------------------------------------------------------------------
# Hampel (median/MAD) robust outlier screen
# ---------------------------------------------------------------------------

#: Hampel threshold: 3 sigma-equivalents, MAD -> sigma factor 1.4826.
HAMPEL_K = 4.4478


def hampel_outliers(events: DataFrame) -> DataFrame:
    """Robust per-type outlier screen: median and MAD (median absolute
    deviation) instead of mean/stddev — the estimator a heavy-tailed
    value column needs (one fat order shifts a mean, not a median).
    Flags values with |v - median| > 3 * 1.4826 * MAD.

    Two exact-percentile passes (median, then MAD on the residuals
    against the PRE-ROUNDED median — the broadcast join keeps both
    engines comparing identical operands) + one counting pass; all
    three shuffle on event_type with map-side partials. Output per
    type: n, median, mad, n_outliers, outlier_pct.
    """
    med = events.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("med")
    )
    with_med = events.join(F.broadcast(med), "event_type")
    mad = with_med.groupBy("event_type").agg(
        F.round(
            F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)),
            6,
        ).alias("mad")
    )
    flagged = with_med.join(F.broadcast(mad), "event_type")
    return flagged.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.first("med").alias("median"),
        F.first("mad").alias("mad"),
        F.sum(
            (
                F.abs(F.col("value") - F.col("med"))
                > F.lit(HAMPEL_K) * F.col("mad")
            ).cast("bigint")
        ).alias("n_outliers"),
        F.round(
            F.sum(
                (
                    F.abs(F.col("value") - F.col("med"))
                    > F.lit(HAMPEL_K) * F.col("mad")
                ).cast("bigint")
            )
            / F.count("*"),
            4,
        ).alias("outlier_pct"),
    )


ORACLE_HAMPEL = f"""
hm_med AS (
  SELECT event_type, round(quantile_cont(value, 0.5), 6) AS med
  FROM events GROUP BY 1
),
hm_mad AS (
  SELECT e.event_type,
         round(quantile_cont(abs(e.value - m.med), 0.5), 6) AS mad
  FROM events e JOIN hm_med m USING (event_type)
  GROUP BY 1
),
hampel_outliers AS (
  SELECT e.event_type,
         CAST(count(*) AS BIGINT) AS n,
         max(m.med) AS median,
         max(d.mad) AS mad,
         CAST(sum(CASE WHEN abs(e.value - m.med)
                         > CAST({HAMPEL_K} AS DOUBLE) * d.mad
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
         round(sum(CASE WHEN abs(e.value - m.med)
                          > CAST({HAMPEL_K} AS DOUBLE) * d.mad
                        THEN 1 ELSE 0 END)
               / CAST(count(*) AS DOUBLE), 4) AS outlier_pct
  FROM events e
  JOIN hm_med m USING (event_type)
  JOIN hm_mad d USING (event_type)
  GROUP BY 1
)
"""


# ---------------------------------------------------------------------------
# multiple-testing control: per-type Welch tests + Benjamini-Hochberg
# ---------------------------------------------------------------------------

#: BH false-discovery-rate budget (q).
BH_Q_PCT = 10
#: Abramowitz-Stegun 26.2.17 normal-CDF coefficients.
_AS_B = (0.319381530, -0.356563782, 1.781477937, -1.821255978, 1.330274429)


def _phi_tail_expr(zcol: str) -> str:
    """1 - Phi(|z|) via the A&S 26.2.17 polynomial — identical
    operation order in both engines; inputs are pre-rounded z scores
    so the doubles agree to libm ulps, absorbed by the p round."""
    b = [f"CAST({c!r} AS DOUBLE)" for c in _AS_B]
    t = (
        f"(CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE)"
        f" + CAST(0.2316419 AS DOUBLE) * abs({zcol})))"
    )
    pdf = (
        f"(exp(-abs({zcol}) * abs({zcol}) / 2)"
        f" / CAST(2.5066282746310002 AS DOUBLE))"
    )
    poly = (
        f"({t} * ({b[0]} + {t} * ({b[1]} + {t} * ({b[2]} + {t} *"
        f" ({b[3]} + {t} * {b[4]})))))"
    )
    return f"({pdf} * {poly})"


def multi_test_bh(events: DataFrame) -> DataFrame:
    """One Welch z-test PER EVENT TYPE (variant = user parity, metric
    = per-user value total) with Benjamini-Hochberg FDR control
    across the family — the multiple-comparisons hygiene a metrics
    platform runs when every segment gets its own test: rank
    p-values ascending, find the largest i with p_(i) <= i*q/m, and
    flag ranks up to it.

    Per-type moments are pre-rounded (the ab_test protocol), p-values
    come from the A&S normal-CDF polynomial (same expression text in
    both engines, rounded 6), and the BH step-up is a window over m
    rows (m = #types — tiny). Output per type: event_type, welch_z,
    p_value, bh_rank, bh_threshold, significant.
    """
    per_user = events.groupBy("event_type", "user_id").agg(
        F.round(F.sum("value"), 4).alias("user_total")
    ).withColumn("variant", (F.col("user_id") % 2).cast("int"))
    g = per_user.groupBy("event_type").agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("n1"),
        F.round(
            F.avg(F.when(F.col("variant") == 0, F.col("user_total"))), 6
        ).alias("mean0"),
        F.round(
            F.avg(F.when(F.col("variant") == 1, F.col("user_total"))), 6
        ).alias("mean1"),
        F.round(
            F.var_samp(
                F.when(F.col("variant") == 0, F.col("user_total"))
            ),
            6,
        ).alias("var0"),
        F.round(
            F.var_samp(
                F.when(F.col("variant") == 1, F.col("user_total"))
            ),
            6,
        ).alias("var1"),
    )
    z = g.select(
        "event_type",
        F.round(
            (F.col("mean1") - F.col("mean0"))
            / F.sqrt(
                F.col("var0") / F.col("n0") + F.col("var1") / F.col("n1")
            ),
            6,
        ).alias("welch_z"),
    ).selectExpr(
        "event_type",
        "welch_z",
        f"round(2 * {_phi_tail_expr('welch_z')}, 6) AS p_value",
    )
    wr = Window.orderBy("p_value", "event_type")
    wall = Window.partitionBy()
    ranked = z.select(
        "*",
        F.row_number().over(wr).alias("bh_rank"),
        F.count("*").over(wall).alias("m"),
    ).select(
        "*",
        F.round(
            F.col("bh_rank") * BH_Q_PCT / (F.lit(100.0) * F.col("m")), 6
        ).alias("bh_threshold"),
    )
    cutoff = ranked.select(
        "*",
        F.max(
            F.when(
                F.col("p_value") <= F.col("bh_threshold"),
                F.col("bh_rank"),
            )
        )
        .over(wall)
        .alias("cutoff"),
    )
    return cutoff.select(
        "event_type",
        "welch_z",
        "p_value",
        "bh_rank",
        "bh_threshold",
        F.coalesce(
            F.col("bh_rank") <= F.col("cutoff"), F.lit(False)
        ).alias("significant"),
    )


def oracle_multi_test_bh() -> str:
    tail = _phi_tail_expr("welch_z")
    return f"""
bh_user AS (
  SELECT event_type, user_id, round(sum(value), 4) AS user_total,
         CAST(user_id % 2 AS INT) AS variant
  FROM events GROUP BY 1, 2
),
bh_g AS (
  SELECT event_type,
         sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS n0,
         sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS n1,
         round(avg(CASE WHEN variant = 0 THEN user_total END), 6)
           AS mean0,
         round(avg(CASE WHEN variant = 1 THEN user_total END), 6)
           AS mean1,
         round(var_samp(CASE WHEN variant = 0 THEN user_total END), 6)
           AS var0,
         round(var_samp(CASE WHEN variant = 1 THEN user_total END), 6)
           AS var1
  FROM bh_user GROUP BY 1
),
bh_z AS (
  SELECT event_type,
         round((mean1 - mean0)
               / sqrt(var0 / n0 + var1 / n1), 6) AS welch_z
  FROM bh_g
),
bh_p AS (
  SELECT event_type, welch_z,
         round(2 * {tail}, 6) AS p_value
  FROM bh_z
),
bh_r AS (
  SELECT *, row_number() OVER (ORDER BY p_value, event_type)
              AS bh_rank,
         count(*) OVER () AS m
  FROM bh_p
),
bh_t AS (
  SELECT *, round(bh_rank * {BH_Q_PCT}
                  / (CAST(100 AS DOUBLE) * m), 6) AS bh_threshold
  FROM bh_r
),
bh_c AS (
  SELECT *, max(CASE WHEN p_value <= bh_threshold
                     THEN bh_rank END) OVER () AS cutoff
  FROM bh_t
),
multi_test_bh AS (
  SELECT event_type, welch_z, p_value, CAST(bh_rank AS INT) AS bh_rank,
         bh_threshold,
         COALESCE(bh_rank <= cutoff, FALSE) AS significant
  FROM bh_c
)
"""


# ---------------------------------------------------------------------------
# robust trend: Mann-Kendall test + Theil-Sen slope
# ---------------------------------------------------------------------------


def robust_trend(events: DataFrame) -> DataFrame:
    """Nonparametric trend readout for the daily revenue series:
    Mann-Kendall S (sum of sign(v_j - v_i) over day pairs — exact
    integer), its tie-corrected variance and z statistic, plus the
    Theil-Sen slope (median of pairwise slopes — the robust
    trend-rate estimator a single outlier day cannot move).

    The pair set is DAYS-grain quadratic — bounded by the calendar
    (~66k pairs for a year), never by corpus size; the corpus-sized
    work is the one daily hash-agg above it. S and the tie term are
    exact BIGINTs; z is one rounded expression; the slope median is
    an exact percentile over integer-ratio doubles. Output
    (stat, value): n_days, s, var_s, z, theil_sen_slope.
    """
    daily = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(
                F.expr(f"CAST(floor(value * {AR2_VAL_SCALE}) AS BIGINT)")
            ).alias("v")
        )
    )
    w = Window.orderBy("day")
    s = daily.select(
        F.row_number().over(w).alias("i"), F.col("v")
    )
    a = s.select(F.col("i").alias("i"), F.col("v").alias("vi"))
    b = s.select(F.col("i").alias("j"), F.col("v").alias("vj"))
    pairs = a.join(b, F.col("i") < F.col("j"))
    pair_stats = pairs.agg(
        F.sum(F.signum(F.col("vj") - F.col("vi")).cast("bigint")).alias(
            "s_stat"
        ),
        F.round(
            F.percentile(
                (F.col("vj") - F.col("vi"))
                / (F.col("j") - F.col("i")).cast("double"),
                F.lit(0.5),
            ),
            4,
        ).alias("theil_sen_slope"),
    )
    ties = (
        s.groupBy("v")
        .agg(F.count("*").alias("t"))
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("tie_term"),
            F.sum("t").alias("n"),
        )
    )
    return (
        pair_stats.crossJoin(F.broadcast(ties))
        .selectExpr(
            "CAST(n AS BIGINT) AS n",
            "s_stat",
            "theil_sen_slope",
            "(n * (n - 1) * (2 * n + 5) - tie_term)"
            " / CAST(18 AS DOUBLE) AS var_s",
        )
        .selectExpr(
            "n", "s_stat", "theil_sen_slope", "var_s",
            "CASE WHEN s_stat > 0"
            " THEN round((s_stat - 1) / sqrt(var_s), 6)"
            " WHEN s_stat < 0"
            " THEN round((s_stat + 1) / sqrt(var_s), 6)"
            " ELSE CAST(0 AS DOUBLE) END AS z",
        )
        .selectExpr(
            "stack(5,"
            " 'n_days', CAST(n AS DOUBLE),"
            " 's', CAST(s_stat AS DOUBLE),"
            " 'var_s', round(var_s, 4),"
            " 'z', z,"
            " 'theil_sen_slope', theil_sen_slope) AS (stat, value)"
        )
    )


ORACLE_ROBUST_TREND = f"""
rt_daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(sum(CAST(floor(value * {AR2_VAL_SCALE}) AS BIGINT))
              AS BIGINT) AS v
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1
),
rt_s AS (
  SELECT row_number() OVER (ORDER BY day) AS i, v FROM rt_daily
),
rt_pairs AS (
  SELECT CAST(sum(CAST(sign(b.v - a.v) AS BIGINT)) AS BIGINT)
           AS s_stat,
         round(quantile_cont((b.v - a.v)
               / CAST(b.i - a.i AS DOUBLE), 0.5), 4)
           AS theil_sen_slope
  FROM rt_s a JOIN rt_s b ON a.i < b.i
),
rt_ties AS (
  SELECT CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term,
         CAST(sum(t) AS BIGINT) AS n
  FROM (SELECT count(*) AS t FROM rt_s GROUP BY v)
),
rt_v AS (
  SELECT n, s_stat, theil_sen_slope,
         (n * (n - 1) * (2 * n + 5) - tie_term)
           / CAST(18 AS DOUBLE) AS var_s
  FROM rt_pairs, rt_ties
),
robust_trend AS (
  SELECT 'n_days' AS stat, CAST(n AS DOUBLE) AS value FROM rt_v
  UNION ALL SELECT 's', CAST(s_stat AS DOUBLE) FROM rt_v
  UNION ALL SELECT 'var_s', round(var_s, 4) FROM rt_v
  UNION ALL SELECT 'z',
    CASE WHEN s_stat > 0 THEN round((s_stat - 1) / sqrt(var_s), 6)
         WHEN s_stat < 0 THEN round((s_stat + 1) / sqrt(var_s), 6)
         ELSE CAST(0 AS DOUBLE) END FROM rt_v
  UNION ALL SELECT 'theil_sen_slope', theil_sen_slope FROM rt_v
)
"""


# ---------------------------------------------------------------------------
# Markov stationary distribution (integer power iteration)
# ---------------------------------------------------------------------------

#: fixed power-iteration rounds for the stationary distribution; the
#: chain on |types| states mixes in a handful of rounds and BOTH
#: engines run the same unrolled count, so parity is exact regardless.
STATIONARY_ITERATIONS = 8

#: probability scale (millionths) — same integer-arithmetic stance as
#: graph.pagerank_products: float matrix powers are fold-order
#: sensitive across engines, floor-division mass flow is exact.
STATIONARY_SCALE = 1_000_000


def markov_stationary(
    events: DataFrame, iterations: int = STATIONARY_ITERATIONS
) -> DataFrame:
    """Stationary distribution of the first-order event-type Markov
    chain by integer power iteration: pi'_j = sum_i (pi_i * n_ij) DIV
    n_i on a millionths scale, starting uniform. The long-run "where
    does the funnel settle" readout on top of ``markov_transitions``.

    The transition table is |types|^2 rows, so every iteration is a
    joins-and-aggs plan over a broadcast-sized table; the heavy stage
    remains the ONE per-user window that built the pairs. Floor
    division leaks ≤1 millionth per edge per round (documented,
    deterministic, identical in the oracle) — the price of
    cross-engine exactness.

    Output: (state, pi_millionths, n_iterations).
    """
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts"), "event_id"
    )
    pairs = (
        events.select(
            "user_id",
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n"))
    )
    totals = pairs.groupBy("from_type").agg(F.sum("n").alias("n_from"))
    trans = pairs.join(F.broadcast(totals), "from_type").localCheckpoint(
        eager=True
    )
    n_states = totals.agg(F.count("*").alias("k"))
    pi = totals.select(F.col("from_type").alias("state")).crossJoin(
        F.broadcast(n_states)
    ).select(
        "state",
        (F.lit(STATIONARY_SCALE) / F.col("k")).cast("bigint").alias("pi"),
    )
    for _ in range(iterations):
        pi = (
            trans.join(pi, trans.from_type == pi.state)
            .select(
                F.col("to_type").alias("state"),
                ((F.col("pi") * F.col("n")) / F.col("n_from"))
                .cast("bigint")
                .alias("flow"),
            )
            .groupBy("state")
            .agg(F.sum("flow").alias("pi"))
        )
    return pi.select(
        "state",
        F.col("pi").alias("pi_millionths"),
        F.lit(iterations).alias("n_iterations"),
    )


def oracle_markov_stationary(
    iterations: int = STATIONARY_ITERATIONS,
) -> str:
    ctes = [
        """
mst_counts AS MATERIALIZED (
  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
  FROM (
    SELECT event_type AS from_type,
           lead(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS to_type
    FROM events
  ) WHERE to_type IS NOT NULL
  GROUP BY 1, 2
),
mst_tot AS MATERIALIZED (
  SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from
  FROM mst_counts GROUP BY 1
),
mst_trans AS MATERIALIZED (
  SELECT c.from_type, c.to_type, c.n, t.n_from
  FROM mst_counts c JOIN mst_tot t USING (from_type)
),
mst_p0 AS (
  SELECT from_type AS state,
         CAST({scale} // (SELECT count(*) FROM mst_tot) AS BIGINT) AS pi
  FROM mst_tot
)""".format(scale=STATIONARY_SCALE)
    ]
    prev = "mst_p0"
    for i in range(1, iterations + 1):
        ctes.append(
            """
mst_p{i} AS MATERIALIZED (
  SELECT t.to_type AS state,
         CAST(sum((p.pi * t.n) // t.n_from) AS BIGINT) AS pi
  FROM mst_trans t JOIN {prev} p ON t.from_type = p.state
  GROUP BY 1
)""".format(i=i, prev=prev)
        )
        prev = f"mst_p{i}"
    ctes.append(
        """
markov_stationary AS (
  SELECT state, pi AS pi_millionths,
         {it} AS n_iterations
  FROM {prev}
)""".format(it=iterations, prev=prev)
    )
    return ",".join(ctes)


# ---------------------------------------------------------------------------
# exact Shapley-value channel attribution
# ---------------------------------------------------------------------------

#: fixed channel vocabulary -> bitmask bit (the four non-conversion
#: event types of the fixture; 'purchase' is the conversion). Exact
#: Shapley enumerates 2^|channels| coalitions — tractable precisely
#: because the channel vocabulary is tiny and FIXED, never data-sized.
SHAPLEY_CHANNEL_BITS: tuple[tuple[str, int], ...] = (
    ("click", 1),
    ("error", 2),
    ("signup", 4),
    ("view", 8),
)

#: n=4 coalition weights: |S|! * (n-1-|S|)! for |S| = 0..3; the
#: denominator n! = 24 stays symbolic so every Shapley value is an
#: exact integer number of 24ths.
_SHAPLEY_W = {0: 6, 1: 2, 2: 2, 3: 6}


def shapley_attribution(events: DataFrame) -> DataFrame:
    """EXACT Shapley-value channel attribution over pre-conversion
    journeys: the characteristic function v(S) counts converting
    users whose touched-channel set is contained in coalition S
    (touches = distinct non-purchase event types strictly before the
    user's first purchase), and each channel's Shapley value is the
    weighted sum of marginals v(S ∪ {c}) − v(S) over the 2^4
    coalitions. The game-theoretic MTA model that
    ``attribution_report``'s heuristic models (first/last/linear/
    time-decay) approximate.

    Scale shape: the fact-sized work is one groupBy(user) min-ts and
    one distinct on (user, channel-bit) — everything after lives on a
    ≤16-row mask-count table expanded to coalitions via a
    higher-order-function superset explode (no nested-loop join, no
    driver collect). All counts and weights are integers; the single
    division by 4! happens at the rounded edge.

    Output: (channel, shapley_24ths, shapley) — shapley values sum to
    v(full) − v(empty) by construction (efficiency axiom).
    """
    fp = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("fp_us"))
    )
    bit_expr = F.when(F.lit(False), F.lit(0))
    for name, bit in SHAPLEY_CHANNEL_BITS:
        bit_expr = bit_expr.when(F.col("event_type") == name, F.lit(bit))
    touches = (
        events.join(fp, "user_id")
        .filter(
            (F.unix_micros("ts") < F.col("fp_us"))
            & (F.col("event_type") != "purchase")
        )
        .select("user_id", bit_expr.alias("bit"))
        .distinct()
    )
    masks = (
        fp.join(
            touches.groupBy("user_id").agg(F.sum("bit").alias("mask")),
            "user_id",
            "left",
        )
        .select(F.coalesce(F.col("mask"), F.lit(0)).alias("mask"))
        .groupBy("mask")
        .agg(F.count("*").alias("n_users"))
    )
    # v(S) for all 16 coalitions: explode each mask to its supersets
    # (HOF filter over sequence(0,15) — map-side, 16x at most), agg.
    v = (
        masks.select(
            F.explode(
                F.expr("filter(sequence(0, 15), s -> (s & mask) = mask)")
            ).alias("S"),
            "n_users",
        )
        .groupBy("S")
        .agg(F.sum("n_users").alias("v"))
    )
    spark = events.sparkSession
    combos = spark.range(16).select(
        F.col("id").cast("int").alias("S"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("channel"),
                        F.lit(bit).alias("c_bit"),
                    )
                    for name, bit in SHAPLEY_CHANNEL_BITS
                ]
            )
        ).alias("ch"),
    ).select("S", "ch.channel", "ch.c_bit").filter(
        F.expr("(S & c_bit) = 0")
    )
    w_expr = (
        F.when(F.expr("bit_count(S)") == 0, F.lit(_SHAPLEY_W[0]))
        .when(F.expr("bit_count(S)") == 1, F.lit(_SHAPLEY_W[1]))
        .when(F.expr("bit_count(S)") == 2, F.lit(_SHAPLEY_W[2]))
        .otherwise(F.lit(_SHAPLEY_W[3]))
    )
    vS = v.select(F.col("S").alias("vs_key"), F.col("v").alias("v_s"))
    vSc = v.select(F.col("S").alias("vc_key"), F.col("v").alias("v_sc"))
    scored = (
        combos.withColumn("w", w_expr)
        .withColumn("Sc", F.expr("S | c_bit"))
        .join(F.broadcast(vS), F.col("S") == F.col("vs_key"), "left")
        .join(F.broadcast(vSc), F.col("Sc") == F.col("vc_key"), "left")
        .select(
            "channel",
            (
                F.col("w")
                * (
                    F.coalesce(F.col("v_sc"), F.lit(0))
                    - F.coalesce(F.col("v_s"), F.lit(0))
                )
            ).alias("contrib"),
        )
    )
    return scored.groupBy("channel").agg(
        F.sum("contrib").alias("shapley_24ths")
    ).select(
        "channel",
        "shapley_24ths",
        F.round(
            F.col("shapley_24ths") / F.lit(24).cast("double"), 6
        ).alias("shapley"),
    )


ORACLE_SHAPLEY = """
shp_fp AS (
  SELECT user_id, min(ts) AS fp_ts
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
shp_touch AS (
  SELECT DISTINCT e.user_id,
         CASE e.event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
              WHEN 'signup' THEN 4 WHEN 'view' THEN 8 END AS bit
  FROM events e JOIN shp_fp f ON e.user_id = f.user_id
  WHERE e.ts < f.fp_ts AND e.event_type <> 'purchase'
),
shp_masks AS MATERIALIZED (
  SELECT coalesce(t.mask, 0) AS mask, CAST(count(*) AS BIGINT) AS n_users
  FROM shp_fp f
  LEFT JOIN (SELECT user_id, CAST(sum(bit) AS BIGINT) AS mask
             FROM shp_touch GROUP BY 1) t
    ON f.user_id = t.user_id
  GROUP BY 1
),
shp_v AS MATERIALIZED (
  SELECT s.s AS S, CAST(sum(m.n_users) AS BIGINT) AS v
  FROM shp_masks m, LATERAL unnest(range(16)) AS s(s)
  WHERE (CAST(s.s AS BIGINT) & m.mask) = m.mask
  GROUP BY 1
),
shp_combos AS (
  SELECT CAST(s.s AS INT) AS S, c.channel, c.c_bit
  FROM (SELECT * FROM range(16)) s(s)
  CROSS JOIN (VALUES ('click', 1), ('error', 2),
                     ('signup', 4), ('view', 8)) c(channel, c_bit)
  WHERE (CAST(s.s AS INT) & c.c_bit) = 0
),
shapley_attribution AS (
  SELECT c.channel,
         CAST(sum((CASE bit_count(c.S) WHEN 0 THEN 6 WHEN 1 THEN 2
                        WHEN 2 THEN 2 ELSE 6 END)
                  * (coalesce(vc.v, 0) - coalesce(vs.v, 0))) AS BIGINT)
           AS shapley_24ths,
         round(CAST(sum((CASE bit_count(c.S) WHEN 0 THEN 6 WHEN 1 THEN 2
                              WHEN 2 THEN 2 ELSE 6 END)
                        * (coalesce(vc.v, 0) - coalesce(vs.v, 0)))
                    AS DOUBLE) / CAST(24 AS DOUBLE), 6) AS shapley
  FROM shp_combos c
  LEFT JOIN shp_v vs ON c.S = vs.S
  LEFT JOIN shp_v vc ON (c.S | c.c_bit) = vc.S
  GROUP BY 1
)
"""


# ---------------------------------------------------------------------------
# difference-in-differences estimator
# ---------------------------------------------------------------------------

def did_report(events: DataFrame) -> DataFrame:
    """Difference-in-differences on the purchase metric: variant =
    user parity (the engine's standing deterministic assignment),
    period = event time before/after the stream's midpoint (one
    min/max agg broadcast back — no calendar constant baked in).
    DiD = (treat_post − treat_pre) − (ctrl_post − ctrl_pre), the
    workhorse quasi-experimental estimator when only the treated
    group crosses an exposure boundary.

    Cell means come from EXACT integer cent sums (value quantized to
    cents — the dbscan stance), so the four means and the estimate
    are each one rounded division of BIGINTs; the whole query is two
    hash-aggs (cell grain = 4 rows) + a 1-row broadcast.

    Output: one row per (variant, period) cell with n/mean, plus one
    ('did', NULL) row carrying the estimate.
    """
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    base = events.filter(F.col("event_type") == AB_METRIC_TYPE).select(
        (F.col("user_id") % 2).cast("int").alias("variant"),
        F.unix_micros("ts").alias("us"),
        cents.alias("cents"),
    )
    span = base.agg(
        ((F.min("us") + F.max("us")) / 2).cast("bigint").alias("mid")
    )
    cells = (
        base.crossJoin(F.broadcast(span))
        .select(
            "variant",
            (F.col("us") >= F.col("mid")).cast("int").alias("post"),
            "cents",
        )
        .groupBy("variant", "post")
        .agg(F.count("*").alias("n"), F.sum("cents").alias("s"))
    )
    mean = F.round(F.col("s") / (F.lit(100.0) * F.col("n")), 6)
    rows = cells.select(
        F.col("variant").cast("string").alias("cell_variant"),
        F.col("post"),
        "n",
        mean.alias("mean_value"),
    )
    # DiD from the 4 exact cell sums: one conditional agg, one
    # rounded expression (means expanded algebraically).
    did = cells.agg(
        F.lit("did").alias("cell_variant"),
        F.lit(None).cast("int").alias("post"),
        F.sum("n").alias("n"),
        F.round(
            (
                F.sum(F.when((F.col("variant") == 1) & (F.col("post") == 1), F.col("s")).otherwise(0))
                / (F.lit(100.0) * F.sum(F.when((F.col("variant") == 1) & (F.col("post") == 1), F.col("n")).otherwise(0)))
                - F.sum(F.when((F.col("variant") == 1) & (F.col("post") == 0), F.col("s")).otherwise(0))
                / (F.lit(100.0) * F.sum(F.when((F.col("variant") == 1) & (F.col("post") == 0), F.col("n")).otherwise(0)))
            )
            - (
                F.sum(F.when((F.col("variant") == 0) & (F.col("post") == 1), F.col("s")).otherwise(0))
                / (F.lit(100.0) * F.sum(F.when((F.col("variant") == 0) & (F.col("post") == 1), F.col("n")).otherwise(0)))
                - F.sum(F.when((F.col("variant") == 0) & (F.col("post") == 0), F.col("s")).otherwise(0))
                / (F.lit(100.0) * F.sum(F.when((F.col("variant") == 0) & (F.col("post") == 0), F.col("n")).otherwise(0)))
            ),
            6,
        ).alias("mean_value"),
    )
    return rows.unionByName(did)


ORACLE_DID = """
did_base AS (
  SELECT CAST(user_id % 2 AS INT) AS variant,
         epoch_us(ts) AS us,
         CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
did_span AS (
  SELECT CAST((min(us) + max(us)) // 2 AS BIGINT) AS mid FROM did_base
),
did_cells AS MATERIALIZED (
  SELECT variant, CAST(us >= (SELECT mid FROM did_span) AS INT) AS post,
         CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS s
  FROM did_base
  GROUP BY 1, 2
),
did_report AS (
  SELECT CAST(variant AS VARCHAR) AS cell_variant, post, n,
         round(s / (CAST(100 AS DOUBLE) * n), 6) AS mean_value
  FROM did_cells
  UNION ALL
  SELECT 'did', CAST(NULL AS INT), CAST(sum(n) AS BIGINT),
         round((sum(CASE WHEN variant = 1 AND post = 1 THEN s ELSE 0 END)
                / (CAST(100 AS DOUBLE) *
                   sum(CASE WHEN variant = 1 AND post = 1 THEN n ELSE 0 END))
                - sum(CASE WHEN variant = 1 AND post = 0 THEN s ELSE 0 END)
                / (CAST(100 AS DOUBLE) *
                   sum(CASE WHEN variant = 1 AND post = 0 THEN n ELSE 0 END)))
               - (sum(CASE WHEN variant = 0 AND post = 1 THEN s ELSE 0 END)
                  / (CAST(100 AS DOUBLE) *
                     sum(CASE WHEN variant = 0 AND post = 1 THEN n ELSE 0 END))
                  - sum(CASE WHEN variant = 0 AND post = 0 THEN s ELSE 0 END)
                  / (CAST(100 AS DOUBLE) *
                     sum(CASE WHEN variant = 0 AND post = 0 THEN n ELSE 0 END))),
               6) AS mean_value
  FROM did_cells
)
"""


# ---------------------------------------------------------------------------
# quantile normalization (per-type -> pooled distribution alignment)
# ---------------------------------------------------------------------------

#: prefix-sum bucket width (cents) for the no-global-sort rank
#: machinery shared with the KS/AUC computations.
QN_BUCKET_CENTS = 1000


def quantile_normalize(events: DataFrame) -> DataFrame:
    """Quantile normalization of per-type value distributions onto the
    POOLED distribution (the microarray-era normalizer, now the
    standard way to make per-source quality/score columns comparable
    before corpus mixing): a value at relative rank p within its type
    maps to the pooled distribution's p-quantile (linear
    interpolation).

    Everything up to the final rounding is INTEGER rank algebra:
    within-type doubled midranks m2 = 2s + c + 1 at the (type, cents)
    grain, pooled position split as
    pos_num = (m2 - 1)·(N - 1), denom = 2·n_g,
    idx = pos_num DIV denom, rem = pos_num MOD denom,
    and the interpolated target v[idx] + rem/denom·(v[idx+1] − v[idx])
    divides once at the rounded edge. Pooled rank→value lookup is an
    EQUI-join against the span-exploded pooled value grain (sequence
    per span — linear in rows, uniformly keyed); ranks come from
    bucketed prefix-sums, so no data-sized single-partition window
    exists anywhere.

    Output: (event_type, cents, c, norm_value).
    """
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    base = events.select("event_type", cents.alias("cents"))
    # (type, cents) grain with within-type start offsets
    tv = base.groupBy("event_type", "cents").agg(
        F.count("*").alias("c")
    ).withColumn("bucket", F.expr(f"cents div {QN_BUCKET_CENTS}"))
    tb = tv.groupBy("event_type", "bucket").agg(F.sum("c").alias("bc"))
    wtb = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    toff = tb.select(
        "event_type",
        "bucket",
        F.coalesce(F.sum("bc").over(wtb), F.lit(0)).alias("off"),
    )
    wiv = (
        Window.partitionBy("event_type", "bucket")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tranked = (
        tv.join(toff, ["event_type", "bucket"])
        .withColumn(
            "s", F.col("off") + F.coalesce(F.sum("c").over(wiv), F.lit(0))
        )
        .select("event_type", "cents", "c", "s")
    )
    ng = base.groupBy("event_type").agg(F.count("*").alias("n_g"))
    ntot = base.agg(F.count("*").alias("n_pool"))
    # pooled value grain -> 0-based rank spans -> exploded rank table
    pv = base.groupBy("cents").agg(F.count("*").alias("pc")).withColumn(
        "bucket", F.expr(f"cents div {QN_BUCKET_CENTS}")
    )
    pb = pv.groupBy("bucket").agg(F.sum("pc").alias("bc"))
    wpb = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    poff = pb.select(
        "bucket", F.coalesce(F.sum("bc").over(wpb), F.lit(0)).alias("off")
    )
    wpv = (
        Window.partitionBy("bucket")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pranked = (
        pv.join(F.broadcast(poff), "bucket")
        .withColumn(
            "s0", F.col("off") + F.coalesce(F.sum("pc").over(wpv), F.lit(0))
        )
        .select("cents", "pc", "s0")
    )
    pool_ranks = pranked.select(
        F.col("cents").alias("pv"),
        F.explode(
            F.sequence(F.col("s0"), F.col("s0") + F.col("pc") - 1)
        ).alias("rk"),
    )
    pos = (
        tranked.join(ng, "event_type")
        .crossJoin(F.broadcast(ntot))
        .withColumn("m2", F.lit(2) * F.col("s") + F.col("c") + 1)
        .withColumn(
            "pos_num", (F.col("m2") - 1) * (F.col("n_pool") - 1)
        )
        .withColumn("denom", F.lit(2) * F.col("n_g"))
        .withColumn("idx", F.expr("pos_num div denom"))
        .withColumn("rem", F.expr("pos_num - idx * denom"))
    )
    lo = pool_ranks.select(F.col("rk").alias("idx"), F.col("pv").alias("v0"))
    hi = pool_ranks.select(
        (F.col("rk") - 1).alias("idx"), F.col("pv").alias("v1")
    )
    return (
        pos.join(lo, "idx")
        .join(hi, "idx", "left")
        .select(
            "event_type",
            "cents",
            "c",
            F.round(
                (
                    F.col("v0")
                    + (F.col("rem") / F.col("denom"))
                    * (F.coalesce(F.col("v1"), F.col("v0")) - F.col("v0"))
                )
                / 100.0,
                6,
            ).alias("norm_value"),
        )
    )


ORACLE_QUANTILE_NORM = """
qn_base AS (
  SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events
),
qn_tv AS (
  SELECT event_type, cents, CAST(count(*) AS BIGINT) AS c
  FROM qn_base GROUP BY 1, 2
),
qn_tranked AS (
  SELECT event_type, cents, c,
         CAST(coalesce(sum(c) OVER (PARTITION BY event_type
           ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING
           AND 1 PRECEDING), 0) AS BIGINT) AS s
  FROM qn_tv
),
qn_ng AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_g
  FROM qn_base GROUP BY 1
),
qn_ntot AS (SELECT CAST(count(*) AS BIGINT) AS n_pool FROM qn_base),
qn_pv AS (
  SELECT cents, CAST(count(*) AS BIGINT) AS pc,
         CAST(coalesce(sum(count(*)) OVER (ORDER BY cents
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS s0
  FROM qn_base GROUP BY cents
),
qn_pool_ranks AS MATERIALIZED (
  SELECT cents AS pv, CAST(u.rk AS BIGINT) AS rk
  FROM qn_pv, LATERAL unnest(generate_series(s0, s0 + pc - 1)) AS u(rk)
),
qn_pos AS (
  SELECT t.event_type, t.cents, t.c,
         (2 * t.s + t.c + 1 - 1) * (n.n_pool - 1) AS pos_num,
         2 * g.n_g AS denom
  FROM qn_tranked t
  JOIN qn_ng g USING (event_type)
  CROSS JOIN qn_ntot n
),
quantile_normalize AS (
  SELECT p.event_type, p.cents, p.c,
         round((lo.pv + ((p.pos_num - (p.pos_num // p.denom) * p.denom)
                         / CAST(p.denom AS DOUBLE))
                        * (coalesce(hi.pv, lo.pv) - lo.pv)) / 100.0, 6)
           AS norm_value
  FROM qn_pos p
  JOIN qn_pool_ranks lo ON lo.rk = p.pos_num // p.denom
  LEFT JOIN qn_pool_ranks hi ON hi.rk = p.pos_num // p.denom + 1
)
"""


# ---------------------------------------------------------------------------
# forecast backtest: naive / seasonal-naive / truncated-EWMA / drift
# ---------------------------------------------------------------------------

def forecast_backtest(events: DataFrame) -> DataFrame:
    """One-step-ahead backtest of four closed-form forecasters on the
    daily purchase-revenue series — the model-selection harness that
    says WHICH of the engine's forecasting rungs (naive, weekly
    seasonal-naive, 8-day dyadic EWMA, drift) earns its keep, scored
    on a common eval window with MAE / MAPE / MASE.

    Every forecast is an exact rational with a model-specific integer
    denominator s (1, 1, 255, 7): the dyadic EWMA is
    (128·l1 + … + 1·l8)/255 and drift is (8·l1 − l8)/7, so each
    error is |s·v − num| / s with BIGINT numerators — MAE and MASE
    are exact-integer ratios rounded once, and MAPE averages
    per-term rationals. The series is DAYS-grain (calendar-bounded),
    so the lag windows sort thousands of rows at most; the one
    corpus-sized stage is the first hash-agg.

    Output per model: (model, n_evals, mae, mape, mase).
    """
    daily = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(
                F.expr(f"CAST(floor(value * {AR2_VAL_SCALE}) AS BIGINT)")
            ).alias("v")
        )
    )
    w = Window.orderBy("day")
    lagged = daily.select(
        "v", *[F.lag("v", i).over(w).alias(f"l{i}") for i in range(1, 9)]
    ).filter(F.col("l8").isNotNull() & (F.col("v") > 0))
    ewma_num = sum(
        (F.lit(2 ** (8 - i)) * F.col(f"l{i}") for i in range(2, 9)),
        F.lit(128) * F.col("l1"),
    )
    models = {
        "naive": (F.col("l1"), 1),
        "snaive7": (F.col("l7"), 1),
        "ewma8": (ewma_num, 255),
        "drift": (F.lit(8) * F.col("l1") - F.col("l8"), 7),
    }
    naive_abs = F.sum(F.abs(F.col("v") - F.col("l1"))).alias("naive_abs")
    out = None
    for name, (num, s) in models.items():
        e_abs = F.abs(F.lit(s) * F.col("v") - num)
        row = lagged.agg(
            F.lit(name).alias("model"),
            F.count("*").alias("n_evals"),
            F.sum(e_abs).alias("abs_sum"),
            F.sum(F.abs(F.col("v") - F.col("l1"))).alias("naive_sum"),
            F.round(
                F.avg(e_abs / (F.lit(float(s)) * F.col("v"))), 6
            ).alias("mape"),
        ).select(
            "model",
            "n_evals",
            F.round(
                F.col("abs_sum")
                / (F.lit(float(s) * 100.0) * F.col("n_evals")),
                6,
            ).alias("mae"),
            "mape",
            F.round(
                F.col("abs_sum")
                / (F.lit(float(s)) * F.col("naive_sum")),
                6,
            ).alias("mase"),
        )
        out = row if out is None else out.unionByName(row)
    return out


ORACLE_FORECAST_BACKTEST = f"""
fb_daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(sum(CAST(floor(value * {AR2_VAL_SCALE}) AS BIGINT))
              AS BIGINT) AS v
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
fb_lagged AS MATERIALIZED (
  SELECT * FROM (
    SELECT v,
           lag(v, 1) OVER w AS l1, lag(v, 2) OVER w AS l2,
           lag(v, 3) OVER w AS l3, lag(v, 4) OVER w AS l4,
           lag(v, 5) OVER w AS l5, lag(v, 6) OVER w AS l6,
           lag(v, 7) OVER w AS l7, lag(v, 8) OVER w AS l8
    FROM fb_daily WINDOW w AS (ORDER BY day)
  ) WHERE l8 IS NOT NULL AND v > 0
),
forecast_backtest AS (
  SELECT 'naive' AS model, CAST(count(*) AS BIGINT) AS n_evals,
         round(sum(abs(v - l1)) / (CAST(100 AS DOUBLE) * count(*)), 6)
           AS mae,
         round(avg(abs(v - l1) / (CAST(1 AS DOUBLE) * v)), 6) AS mape,
         round(sum(abs(v - l1)) / (CAST(1 AS DOUBLE) * sum(abs(v - l1))),
               6) AS mase
  FROM fb_lagged
  UNION ALL
  SELECT 'snaive7', CAST(count(*) AS BIGINT),
         round(sum(abs(v - l7)) / (CAST(100 AS DOUBLE) * count(*)), 6),
         round(avg(abs(v - l7) / (CAST(1 AS DOUBLE) * v)), 6),
         round(sum(abs(v - l7)) / (CAST(1 AS DOUBLE) * sum(abs(v - l1))),
               6)
  FROM fb_lagged
  UNION ALL
  SELECT 'ewma8', CAST(count(*) AS BIGINT),
         round(sum(abs(255 * v - (128*l1 + 64*l2 + 32*l3 + 16*l4
                                  + 8*l5 + 4*l6 + 2*l7 + l8)))
               / (CAST(25500 AS DOUBLE) * count(*)), 6),
         round(avg(abs(255 * v - (128*l1 + 64*l2 + 32*l3 + 16*l4
                                  + 8*l5 + 4*l6 + 2*l7 + l8))
                   / (CAST(255 AS DOUBLE) * v)), 6),
         round(sum(abs(255 * v - (128*l1 + 64*l2 + 32*l3 + 16*l4
                                  + 8*l5 + 4*l6 + 2*l7 + l8)))
               / (CAST(255 AS DOUBLE) * sum(abs(v - l1))), 6)
  FROM fb_lagged
  UNION ALL
  SELECT 'drift', CAST(count(*) AS BIGINT),
         round(sum(abs(7 * v - (8 * l1 - l8)))
               / (CAST(700 AS DOUBLE) * count(*)), 6),
         round(avg(abs(7 * v - (8 * l1 - l8))
                   / (CAST(7 AS DOUBLE) * v)), 6),
         round(sum(abs(7 * v - (8 * l1 - l8)))
               / (CAST(7 AS DOUBLE) * sum(abs(v - l1))), 6)
  FROM fb_lagged
)
"""


# ---------------------------------------------------------------------------
# A/B power analysis: MDE + required sample size
# ---------------------------------------------------------------------------

#: two-sided alpha=.05 and 80% power normal quantiles (z_{.975},
#: z_{.80}) — fixed double literals, identical text in both engines.
POWER_Z_ALPHA = 1.959964
POWER_Z_BETA = 0.841621
#: target relative lift the sample-size row is computed for.
POWER_TARGET_REL = 0.05


def ab_power_mde(events: DataFrame) -> DataFrame:
    """Experiment power readout on the purchase metric: the minimum
    detectable effect at the CURRENT sample (two-sample normal
    approximation, alpha=.05 two-sided, 80% power) and the per-arm
    sample size a 5%-of-mean lift would need — the two numbers a team
    checks BEFORE trusting (or launching) the A/B readout that
    `ab_test_report` / `cuped_report` deliver.

        mde = (z_a + z_b) * sqrt(s2 * (1/n0 + 1/n1))
        n_per_arm = 2 * s2 * (z_a + z_b)^2 / (target_rel * mean)^2

    User-grain totals come from exact integer cent sums; the pooled
    variance uses the n·Σx²−(Σx)² BIGINT identity, so the only floats
    are the final closed-form expressions (identical text in both
    engines, rounded at the edge).

    Output (1 row): n0, n1, mean_value, sd_value, mde_abs, mde_rel,
    n_per_arm_5pct.
    """
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    per_user = (
        events.filter(F.col("event_type") == AB_METRIC_TYPE)
        .groupBy("user_id")
        .agg(F.sum(cents).alias("uc"))
        .select(
            (F.col("user_id") % 2).cast("int").alias("variant"),
            "uc",
        )
    )
    m = per_user.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("n1"),
        F.count("*").alias("n"),
        F.sum("uc").alias("s1"),
        F.sum(F.col("uc") * F.col("uc")).alias("s2m"),
    )
    z = POWER_Z_ALPHA + POWER_Z_BETA
    s2 = (
        (F.col("n") * F.col("s2m") - F.col("s1") * F.col("s1"))
        / (F.col("n") * (F.col("n") - 1))
    ) / F.lit(10000.0)
    mean = F.col("s1") / (F.lit(100.0) * F.col("n"))
    mde = F.lit(z) * F.sqrt(
        s2 * (1.0 / F.col("n0") + 1.0 / F.col("n1"))
    )
    return m.select(
        "n0",
        "n1",
        F.round(mean, 6).alias("mean_value"),
        F.round(F.sqrt(s2), 6).alias("sd_value"),
        F.round(mde, 6).alias("mde_abs"),
        F.round(mde / mean, 6).alias("mde_rel"),
        F.round(
            F.lit(2.0)
            * s2
            * F.lit(z * z)
            / ((F.lit(POWER_TARGET_REL) * mean)
               * (F.lit(POWER_TARGET_REL) * mean)),
            2,
        ).alias("n_per_arm_5pct"),
    )


ORACLE_AB_POWER = f"""
pw_user AS (
  SELECT CAST(user_id % 2 AS INT) AS variant,
         CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS uc
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
pw_m AS (
  SELECT CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n0,
         CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n1,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(uc) AS BIGINT) AS s1,
         CAST(sum(uc * uc) AS BIGINT) AS s2m
  FROM pw_user
),
ab_power_mde AS (
  SELECT n0, n1,
         round(s1 / (CAST(100 AS DOUBLE) * n), 6) AS mean_value,
         round(sqrt(((n * s2m - s1 * s1)
                     / CAST(n * (n - 1) AS DOUBLE)) / 10000.0), 6)
           AS sd_value,
         round({POWER_Z_ALPHA + POWER_Z_BETA}
               * sqrt((((n * s2m - s1 * s1)
                        / CAST(n * (n - 1) AS DOUBLE)) / 10000.0)
                      * (CAST(1 AS DOUBLE) / n0
                         + CAST(1 AS DOUBLE) / n1)), 6) AS mde_abs,
         round(({POWER_Z_ALPHA + POWER_Z_BETA}
                * sqrt((((n * s2m - s1 * s1)
                         / CAST(n * (n - 1) AS DOUBLE)) / 10000.0)
                       * (CAST(1 AS DOUBLE) / n0
                          + CAST(1 AS DOUBLE) / n1)))
               / (s1 / (CAST(100 AS DOUBLE) * n)), 6) AS mde_rel,
         round(2.0 * (((n * s2m - s1 * s1)
                       / CAST(n * (n - 1) AS DOUBLE)) / 10000.0)
               * {(POWER_Z_ALPHA + POWER_Z_BETA) ** 2}
               / (({POWER_TARGET_REL} * (s1 / (CAST(100 AS DOUBLE) * n)))
                  * ({POWER_TARGET_REL}
                     * (s1 / (CAST(100 AS DOUBLE) * n)))), 2)
           AS n_per_arm_5pct
  FROM pw_m
)
"""


# ---------------------------------------------------------------------------
# Markov removal-effect attribution (data-driven MTA)
# ---------------------------------------------------------------------------

#: absorption-iteration rounds: P(absorb into conv within K steps)
#: from START; both engines run the SAME unrolled count. K=10 covers
#: paths far longer than any fixture journey.
MRA_ROUNDS = 10
#: millionths probability scale (the PageRank/stationary stance).
MRA_SCALE = 1_000_000
#: the removable channels (the non-conversion event types).
MRA_CHANNELS: tuple[str, ...] = ("click", "error", "signup", "view")


def markov_removal_attribution(events: DataFrame) -> DataFrame:
    """Markov-chain attribution by removal effect (Anderl et al.
    2014) — the data-driven MTA model that closes the engine's
    attribution ladder (heuristics in `attribution_report`,
    game-theoretic Shapley in `shapley_attribution`): build the
    first-order journey chain START → channels → conv/null from each
    user's pre-first-purchase history, then for each channel compute
    how much conversion probability disappears when that channel's
    node is removed (entries into it re-routed to null, its
    out-edges dropped):

        effect_c = (P(conv) − P_c(conv)) / P(conv),
        share_c  = effect_c / Σ effects.

    Absorption probabilities run as INTEGER millionths flows
    a_k(s) = (Σ_t cnt(s,t)·a_{k-1}(t)) DIV n_s over ``MRA_ROUNDS``
    unrolled rounds — all five chain variants (none + 4 removals)
    iterate TOGETHER as one (variant, from, to) table, so each round
    is one tiny join + hash-agg regardless of how many channels are
    audited. The only fact-sized stages are the first-purchase agg
    and one per-user lead() window (the sessionization shuffle every
    journey model shares).

    Output per channel: (channel, p_conv_base_mill, p_conv_removed_mill,
    removal_effect, attribution_share).
    """
    us = F.unix_micros("ts")
    fp = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(us).alias("fp_us"))
    )
    allu = events.select("user_id").distinct()
    base = (
        events.join(fp, "user_id", "left")
        .filter(
            (F.col("event_type") != "purchase")
            & (F.col("fp_us").isNull() | (us < F.col("fp_us")))
        )
        .select(
            "user_id",
            F.col("event_type").alias("ch"),
            us.alias("ts_us"),
            "event_id",
            F.col("fp_us").isNotNull().alias("conv"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seq = base.select(
        "user_id",
        "ch",
        "conv",
        F.row_number().over(w).alias("rn"),
        F.lead("ch").over(w).alias("nxt"),
    )
    mids = seq.select(
        F.col("ch").alias("src"),
        F.coalesce(
            F.col("nxt"),
            F.when(F.col("conv"), F.lit("conv")).otherwise(F.lit("null")),
        ).alias("dst"),
    )
    starts = seq.filter(F.col("rn") == 1).select(
        F.lit("START").alias("src"), F.col("ch").alias("dst")
    )
    lonely = (
        allu.join(base.select("user_id").distinct(), "user_id", "left_anti")
        .join(fp.select("user_id", F.lit(True).alias("c")), "user_id", "left")
        .select(
            F.lit("START").alias("src"),
            F.when(F.col("c"), F.lit("conv")).otherwise(F.lit("null")).alias("dst"),
        )
    )
    counts = (
        mids.unionByName(starts)
        .unionByName(lonely)
        .groupBy("src", "dst")
        .agg(F.count("*").alias("cnt"))
    )
    variants = F.array(
        *[F.lit(v) for v in ("none",) + MRA_CHANNELS]
    )
    var_counts = (
        counts.select(
            F.explode(variants).alias("variant"), "src", "dst", "cnt"
        )
        .filter(F.col("src") != F.col("variant"))
        .select(
            "variant",
            "src",
            F.when(F.col("dst") == F.col("variant"), F.lit("null"))
            .otherwise(F.col("dst"))
            .alias("dst"),
            "cnt",
        )
        .groupBy("variant", "src", "dst")
        .agg(F.sum("cnt").alias("cnt"))
    )
    tot = var_counts.groupBy("variant", "src").agg(
        F.sum("cnt").alias("n_src")
    )
    trans = var_counts.join(tot, ["variant", "src"]).localCheckpoint(
        eager=True
    )
    absorbing = (
        trans.select("variant")
        .distinct()
        .select(
            "variant",
            F.explode(
                F.array(
                    F.struct(
                        F.lit("conv").alias("state"),
                        F.lit(MRA_SCALE).cast("bigint").alias("a"),
                    ),
                    F.struct(
                        F.lit("null").alias("state"),
                        F.lit(0).cast("bigint").alias("a"),
                    ),
                )
            ).alias("s"),
        )
        .select("variant", "s.state", "s.a")
        .localCheckpoint(eager=True)
    )
    a = absorbing
    for _ in range(MRA_ROUNDS):
        stepped = (
            trans.join(
                a.select(
                    "variant", F.col("state").alias("dst"), F.col("a").alias("av")
                ),
                ["variant", "dst"],
                "left",
            )
            .groupBy("variant", "src", "n_src")
            .agg(F.sum(F.col("cnt") * F.coalesce(F.col("av"), F.lit(0))).alias("flow"))
            .select(
                "variant",
                F.col("src").alias("state"),
                F.expr("flow div n_src").alias("a"),
            )
        )
        a = stepped.unionByName(absorbing)
    start_a = a.filter(F.col("state") == "START").select(
        "variant", F.col("a").alias("p_conv")
    )
    base_p = start_a.filter(F.col("variant") == "none").select(
        F.col("p_conv").alias("p_base")
    )
    per_ch = (
        start_a.filter(F.col("variant") != "none")
        .crossJoin(F.broadcast(base_p))
        .select(
            F.col("variant").alias("channel"),
            F.col("p_base").alias("p_conv_base_mill"),
            F.col("p_conv").alias("p_conv_removed_mill"),
            F.round(
                (F.col("p_base") - F.col("p_conv"))
                / F.col("p_base").cast("double"),
                6,
            ).alias("removal_effect"),
            (F.col("p_base") - F.col("p_conv")).alias("eff_num"),
        )
    )
    eff_tot = per_ch.agg(F.sum("eff_num").alias("eff_sum"))
    return (
        per_ch.crossJoin(F.broadcast(eff_tot))
        .select(
            "channel",
            "p_conv_base_mill",
            "p_conv_removed_mill",
            "removal_effect",
            F.round(
                F.col("eff_num") / F.col("eff_sum").cast("double"), 6
            ).alias("attribution_share"),
        )
    )


def oracle_markov_removal(rounds: int = MRA_ROUNDS) -> str:
    ctes = [
        """
mra_fp AS (
  SELECT user_id, min(epoch_us(ts)) AS fp_us
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
mra_base AS (
  SELECT e.user_id, e.event_type AS ch, epoch_us(e.ts) AS ts_us,
         e.event_id, f.fp_us IS NOT NULL AS conv
  FROM events e LEFT JOIN mra_fp f ON e.user_id = f.user_id
  WHERE e.event_type <> 'purchase'
    AND (f.fp_us IS NULL OR epoch_us(e.ts) < f.fp_us)
),
mra_seq AS (
  SELECT user_id, ch, conv,
         row_number() OVER w AS rn, lead(ch) OVER w AS nxt
  FROM mra_base
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
mra_counts AS MATERIALIZED (
  SELECT src, dst, CAST(count(*) AS BIGINT) AS cnt FROM (
    SELECT ch AS src,
           coalesce(nxt, CASE WHEN conv THEN 'conv' ELSE 'null' END)
             AS dst
    FROM mra_seq
    UNION ALL
    SELECT 'START', ch FROM mra_seq WHERE rn = 1
    UNION ALL
    SELECT 'START',
           CASE WHEN f.user_id IS NOT NULL THEN 'conv' ELSE 'null' END
    FROM (SELECT DISTINCT user_id FROM events) u
    LEFT JOIN (SELECT DISTINCT user_id FROM mra_base) b
      ON u.user_id = b.user_id
    LEFT JOIN mra_fp f ON u.user_id = f.user_id
    WHERE b.user_id IS NULL
  )
  GROUP BY 1, 2
),
mra_var AS MATERIALIZED (
  SELECT v.variant, c.src,
         CASE WHEN c.dst = v.variant THEN 'null' ELSE c.dst END AS dst,
         CAST(sum(c.cnt) AS BIGINT) AS cnt
  FROM mra_counts c
  CROSS JOIN (VALUES ('none'), ('click'), ('error'),
                     ('signup'), ('view')) v(variant)
  WHERE c.src <> v.variant
  GROUP BY 1, 2, 3
),
mra_trans AS MATERIALIZED (
  SELECT vc.*, t.n_src FROM mra_var vc
  JOIN (SELECT variant, src, CAST(sum(cnt) AS BIGINT) AS n_src
        FROM mra_var GROUP BY 1, 2) t USING (variant, src)
),
mra_a0 AS (
  SELECT variant, 'conv' AS state,
         CAST({scale} AS BIGINT) AS a
  FROM (SELECT DISTINCT variant FROM mra_trans)
  UNION ALL
  SELECT variant, 'null', CAST(0 AS BIGINT)
  FROM (SELECT DISTINCT variant FROM mra_trans)
)""".format(scale=MRA_SCALE)
    ]
    prev = "mra_a0"
    for k in range(1, rounds + 1):
        ctes.append(
            """
mra_a{k} AS MATERIALIZED (
  SELECT t.variant, t.src AS state,
         CAST(sum(t.cnt * coalesce(p.a, 0)) // max(t.n_src) AS BIGINT)
           AS a
  FROM mra_trans t
  LEFT JOIN {prev} p ON t.variant = p.variant AND t.dst = p.state
  GROUP BY 1, 2
  UNION ALL
  SELECT * FROM mra_a0
)""".format(k=k, prev=prev)
        )
        prev = f"mra_a{k}"
    ctes.append(
        """
mra_start AS (
  SELECT variant, a AS p_conv FROM {prev} WHERE state = 'START'
),
markov_removal_attribution AS (
  SELECT s.variant AS channel,
         b.p_conv AS p_conv_base_mill,
         s.p_conv AS p_conv_removed_mill,
         round((b.p_conv - s.p_conv) / CAST(b.p_conv AS DOUBLE), 6)
           AS removal_effect,
         round((b.p_conv - s.p_conv)
               / CAST((SELECT sum(b2.p_conv - s2.p_conv)
                       FROM mra_start s2
                       CROSS JOIN (SELECT p_conv FROM mra_start
                                   WHERE variant = 'none') b2
                       WHERE s2.variant <> 'none') AS DOUBLE), 6)
           AS attribution_share
  FROM mra_start s
  CROSS JOIN (SELECT p_conv FROM mra_start WHERE variant = 'none') b
  WHERE s.variant <> 'none'
)""".format(prev=prev)
    )
    return ",".join(ctes)


# ---------------------------------------------------------------------------
# Croston intermittent-demand forecast (per-product)
# ---------------------------------------------------------------------------

#: dyadic EWMA over the last 4 demand events / intervals: weights
#: 8,4,2,1 (/15 cancels in the final ratio) — exact integers.
CROSTON_LAGS = 4


def croston_forecast(lineitem: DataFrame) -> DataFrame:
    """Croston's method for intermittent demand, per product: smooth
    the nonzero demand SIZES and the INTER-demand intervals
    separately, forecast = smoothed size / smoothed interval (units
    per day). The per-entity member of the forecasting family (AR2/
    Holt/backtest run on the global series) — sparse, gappy demand
    is exactly where naive smoothing fails and Croston is the
    textbook answer.

    Both smoothers are truncated dyadic EWMAs over the last 4 demand
    events (weights 8,4,2,1): z_num = 8q1+4q2+2q3+q4 and
    p_num = 8i1+4i2+2i3+i4 are exact BIGINTs (quantities integral,
    intervals in whole days), the /15 normalizations cancel, and the
    forecast is ONE rounded division — no recursive float state, so
    per-product forecasts hash-match at any scale. One hash-agg to
    (product, day), one per-product window (bounded by a product's
    demand-day count), products with <5 demand days excluded.

    Output: (product, n_demand_days, z_num, p_num, croston_rate).
    """
    dd = (
        lineitem.groupBy(
            F.col("l_partkey").alias("product"),
            F.to_date("l_shipdate").alias("day"),
        )
        .agg(
            F.sum(F.round(F.col("l_quantity"), 0).cast("bigint")).alias("q")
        )
    )
    w = Window.partitionBy("product").orderBy(F.desc("day"))
    last = (
        dd.select(
            "product",
            "day",
            "q",
            F.row_number().over(w).alias("rn"),
            F.count("*").over(Window.partitionBy("product")).alias(
                "n_demand_days"
            ),
            *[F.lead("q", i).over(w).alias(f"q{i}") for i in range(1, CROSTON_LAGS)],
            *[F.lead("day", i).over(w).alias(f"d{i}") for i in range(1, CROSTON_LAGS + 1)],
        )
        .filter((F.col("rn") == 1) & F.col(f"d{CROSTON_LAGS}").isNotNull())
    )
    z_num = (
        F.lit(8) * F.col("q")
        + F.lit(4) * F.col("q1")
        + F.lit(2) * F.col("q2")
        + F.col("q3")
    )
    p_num = (
        F.lit(8) * F.datediff(F.col("day"), F.col("d1"))
        + F.lit(4) * F.datediff(F.col("d1"), F.col("d2"))
        + F.lit(2) * F.datediff(F.col("d2"), F.col("d3"))
        + F.datediff(F.col("d3"), F.col("d4"))
    )
    return last.select(
        "product",
        "n_demand_days",
        z_num.cast("bigint").alias("z_num"),
        p_num.cast("bigint").alias("p_num"),
        F.round(z_num / p_num.cast("double"), 6).alias("croston_rate"),
    )


ORACLE_CROSTON = f"""
cr_dd AS (
  SELECT l_partkey AS product, CAST(l_shipdate AS DATE) AS day,
         CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT) AS q
  FROM lineitem GROUP BY 1, 2
),
cr_last AS (
  SELECT * FROM (
    SELECT product, day, q,
           row_number() OVER w AS rn,
           count(*) OVER (PARTITION BY product) AS n_demand_days,
           lead(q, 1) OVER w AS q1, lead(q, 2) OVER w AS q2,
           lead(q, 3) OVER w AS q3,
           lead(day, 1) OVER w AS d1, lead(day, 2) OVER w AS d2,
           lead(day, 3) OVER w AS d3, lead(day, 4) OVER w AS d4
    FROM cr_dd WINDOW w AS (PARTITION BY product ORDER BY day DESC)
  ) WHERE rn = 1 AND d4 IS NOT NULL
),
croston_forecast AS (
  SELECT product, CAST(n_demand_days AS BIGINT) AS n_demand_days,
         CAST(8 * q + 4 * q1 + 2 * q2 + q3 AS BIGINT) AS z_num,
         CAST(8 * date_diff('day', d1, day)
              + 4 * date_diff('day', d2, d1)
              + 2 * date_diff('day', d3, d2)
              + date_diff('day', d4, d3) AS BIGINT) AS p_num,
         round((8 * q + 4 * q1 + 2 * q2 + q3)
               / CAST(8 * date_diff('day', d1, day)
                      + 4 * date_diff('day', d2, d1)
                      + 2 * date_diff('day', d3, d2)
                      + date_diff('day', d4, d3) AS DOUBLE), 6)
           AS croston_rate
  FROM cr_last
)
"""


# ---------------------------------------------------------------------------
# log-log price elasticity by brand
# ---------------------------------------------------------------------------

def price_elasticity(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Own-price elasticity of demand per brand by the log-log OLS
    slope: elasticity = cov(ln q, ln p) / var(ln p) over line items
    (unit price p = extendedprice/quantity) — the pricing-analytics
    staple; |elasticity| > 1 marks elastic brands. One broadcast dim
    join + one hash-agg of five log moments per brand; the slope is
    a single rounded ratio (cancellation noise sits ~1e-9 below the
    6-dp edge).

    Output: (brand, n, elasticity, avg_ln_price, avg_ln_qty).
    """
    rows = lineitem.join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        lineitem.l_partkey == F.col("p_partkey"),
    ).select(
        F.col("p_brand").alias("brand"),
        F.log(F.col("l_extendedprice") / F.col("l_quantity")).alias("x"),
        F.log("l_quantity").alias("y"),
    )
    m = rows.groupBy("brand").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    return m.select(
        "brand",
        "n",
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")),
            6,
        ).alias("elasticity"),
        F.round(F.col("sx") / F.col("n"), 6).alias("avg_ln_price"),
        F.round(F.col("sy") / F.col("n"), 6).alias("avg_ln_qty"),
    )


ORACLE_ELASTICITY = """
el_rows AS (
  SELECT p.p_brand AS brand,
         ln(l.l_extendedprice / l.l_quantity) AS x,
         ln(l.l_quantity) AS y
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
el_m AS (
  SELECT brand, CAST(count(*) AS BIGINT) AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM el_rows GROUP BY 1
),
price_elasticity AS (
  SELECT brand, n,
         round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
           AS elasticity,
         round(sx / n, 6) AS avg_ln_price,
         round(sy / n, 6) AS avg_ln_qty
  FROM el_m
)
"""


# ---------------------------------------------------------------------------
# two-proportion z-test on conversion rates
# ---------------------------------------------------------------------------

def conversion_ztest(events: DataFrame) -> DataFrame:
    """Two-proportion z-test on user CONVERSION (did the user purchase
    at all) by the standing parity variants — the binary-outcome
    companion of the Welch mean test: z = (p1 − p0) /
    sqrt(p̂(1−p̂)(1/n0 + 1/n1)) with the pooled p̂. Everything is
    exact integer counts until the one closed-form expression; the
    significance flag compares the 6-dp-rounded |z| against the fixed
    two-sided 5% critical value, so both engines decide identically.

    One distinct-user agg + one 4-count conditional agg — the
    conversion readout costs two shuffles of user-grain keys at any
    event volume.

    Output (1 row): n0, n1, conv0, conv1, p0, p1, z, significant.
    """
    conv = (
        events.groupBy("user_id")
        .agg(
            F.max(
                (F.col("event_type") == "purchase").cast("int")
            ).alias("c")
        )
        .select(
            (F.col("user_id") % 2).cast("int").alias("variant"), "c"
        )
    )
    m = conv.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("variant") == 0, F.col("c")).otherwise(0)).alias(
            "c0"
        ),
        F.sum(F.when(F.col("variant") == 1, F.col("c")).otherwise(0)).alias(
            "c1"
        ),
    )
    p0 = F.col("c0") / F.col("n0").cast("double")
    p1 = F.col("c1") / F.col("n1").cast("double")
    pp = (F.col("c0") + F.col("c1")) / (
        F.col("n0") + F.col("n1")
    ).cast("double")
    z = F.round(
        (p1 - p0)
        / F.sqrt(
            pp
            * (1.0 - pp)
            * (
                1.0 / F.col("n0").cast("double")
                + 1.0 / F.col("n1").cast("double")
            )
        ),
        6,
    )
    return m.select(
        "n0",
        "n1",
        F.col("c0").alias("conv0"),
        F.col("c1").alias("conv1"),
        F.round(p0, 6).alias("p0"),
        F.round(p1, 6).alias("p1"),
        z.alias("z"),
        (F.abs(z) > F.lit(POWER_Z_ALPHA)).cast("int").alias("significant"),
    )


ORACLE_CONVERSION_ZTEST = f"""
cz_conv AS (
  SELECT CAST(user_id % 2 AS INT) AS variant,
         CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS INT) AS c
  FROM events GROUP BY user_id
),
cz_m AS (
  SELECT CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n0,
         CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n1,
         CAST(sum(CASE WHEN variant = 0 THEN c ELSE 0 END) AS BIGINT)
           AS c0,
         CAST(sum(CASE WHEN variant = 1 THEN c ELSE 0 END) AS BIGINT)
           AS c1
  FROM cz_conv
),
conversion_ztest AS (
  SELECT n0, n1, c0 AS conv0, c1 AS conv1,
         round(c0 / CAST(n0 AS DOUBLE), 6) AS p0,
         round(c1 / CAST(n1 AS DOUBLE), 6) AS p1,
         round((c1 / CAST(n1 AS DOUBLE) - c0 / CAST(n0 AS DOUBLE))
               / sqrt(((c0 + c1) / CAST(n0 + n1 AS DOUBLE))
                      * (1.0 - (c0 + c1) / CAST(n0 + n1 AS DOUBLE))
                      * (CAST(1 AS DOUBLE) / n0
                         + CAST(1 AS DOUBLE) / n1)), 6) AS z,
         CAST(abs(round((c1 / CAST(n1 AS DOUBLE)
                         - c0 / CAST(n0 AS DOUBLE))
               / sqrt(((c0 + c1) / CAST(n0 + n1 AS DOUBLE))
                      * (1.0 - (c0 + c1) / CAST(n0 + n1 AS DOUBLE))
                      * (CAST(1 AS DOUBLE) / n0
                         + CAST(1 AS DOUBLE) / n1)), 6))
              > {POWER_Z_ALPHA} AS INT) AS significant
  FROM cz_m
)
"""


# ---------------------------------------------------------------------------
# Spearman rank correlation (engagement vs spend)
# ---------------------------------------------------------------------------

#: bucket width (cents) for the spend-side rank prefix-sum buckets.
SPEARMAN_Y_BUCKET = 100_000


def spearman_corr(events: DataFrame) -> DataFrame:
    """Spearman rank correlation between per-user engagement (view
    count) and per-user spend (purchase cents) — the monotone-
    association companion of the Pearson `feature_correlations`:
    rank-based, so whales and heavy tails cannot fake (or hide) a
    relationship.

    Rank arithmetic is exact: ties become midranks, and the DOUBLED
    midrank of a distinct value at cumulative position p with tie
    count c is the integer 2p + c + 1 (the Mann-Whitney machinery).
    rho is then Pearson on the doubled ranks — the doubling cancels —
    so all five moment sums are BIGINTs and both engines agree
    bit-for-bit until the one rounded division. Cumulative positions
    come from bucketed prefix-sums over the DISTINCT-value grain (no
    global sort); the value→rank maps join back to users on value
    equality.

    At 100 TB the doubled-rank products approach 4N^3 — past ~1e9
    users the moment sums need decimal(38,0) instead of BIGINT (same
    plan, wider accumulator).

    Output (1 row): n, s_dxdy, rho, t_stat, significant.
    """
    per_user = events.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "view", 1).otherwise(0)
        ).alias("x"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100, 0).cast("bigint"),
            ).otherwise(0)
        ).alias("y"),
    )

    def _doubled_ranks(col: str, bucket_div: int, out: str) -> DataFrame:
        per_v = (
            per_user.groupBy(col)
            .agg(F.count("*").alias("c"))
            .withColumn("bucket", F.expr(f"{col} DIV {bucket_div}"))
        )
        btot = per_v.groupBy("bucket").agg(F.sum("c").alias("bc"))
        woff = Window.orderBy("bucket").rowsBetween(
            Window.unboundedPreceding, -1
        )
        offsets = btot.select(
            "bucket",
            F.coalesce(F.sum("bc").over(woff), F.lit(0)).alias("off"),
        )
        win = Window.partitionBy("bucket").orderBy(col).rowsBetween(
            Window.unboundedPreceding, -1
        )
        return (
            per_v.join(F.broadcast(offsets), "bucket")
            .select(
                col,
                (
                    F.lit(2)
                    * (
                        F.col("off")
                        + F.coalesce(F.sum("c").over(win), F.lit(0))
                    )
                    + F.col("c")
                    + 1
                ).alias(out),
            )
        )

    paired = per_user.join(_doubled_ranks("x", 1, "dx"), "x").join(
        _doubled_ranks("y", SPEARMAN_Y_BUCKET, "dy"), "y"
    )
    m = paired.agg(
        F.count("*").alias("n"),
        F.sum("dx").alias("sx"),
        F.sum("dy").alias("sy"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sy").cast("double")
    denx = nd * F.col("sxx").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sx").cast("double")
    deny = nd * F.col("syy").cast("double") - F.col("sy").cast(
        "double"
    ) * F.col("sy").cast("double")
    # t derives from the 6-dp-ROUNDED rho so both engines feed the t
    # formula literally identical doubles (DuckDB's ^2 pow vs x*x
    # could differ in the last ulp on the unrounded value).
    rho6 = F.round(num / F.sqrt(denx * deny), 6)
    t = rho6 * F.sqrt((nd - 2) / (1.0 - rho6 * rho6))
    return m.select(
        "n",
        F.col("sxy").alias("s_dxdy"),
        rho6.alias("rho"),
        F.round(t, 6).alias("t_stat"),
        (F.abs(F.round(t, 6)) > 1.96).alias("significant"),
    )


ORACLE_SPEARMAN = """
sp_user AS (
  SELECT user_id,
         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              AS BIGINT) AS x,
         CAST(sum(CASE WHEN event_type = 'purchase'
                       THEN CAST(round(value * 100, 0) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS y
  FROM events GROUP BY 1
),
sp_xr AS (
  SELECT v, 2 * p + c + 1 AS dx FROM (
    SELECT x AS v, CAST(count(*) AS BIGINT) AS c,
           CAST(coalesce(sum(count(*)) OVER (ORDER BY x
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS p
    FROM sp_user GROUP BY 1
  )
),
sp_yr AS (
  SELECT v, 2 * p + c + 1 AS dy FROM (
    SELECT y AS v, CAST(count(*) AS BIGINT) AS c,
           CAST(coalesce(sum(count(*)) OVER (ORDER BY y
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS p
    FROM sp_user GROUP BY 1
  )
),
sp_m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(rx.dx) AS BIGINT) AS sx,
         CAST(sum(ry.dy) AS BIGINT) AS sy,
         CAST(sum(rx.dx * ry.dy) AS BIGINT) AS sxy,
         CAST(sum(rx.dx * rx.dx) AS BIGINT) AS sxx,
         CAST(sum(ry.dy * ry.dy) AS BIGINT) AS syy
  FROM sp_user u
  JOIN sp_xr rx ON u.x = rx.v
  JOIN sp_yr ry ON u.y = ry.v
),
sp_r AS (
  SELECT n, sxy,
         round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                      * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
               6) AS rho
  FROM sp_m
),
spearman_corr AS (
  SELECT n, sxy AS s_dxdy, rho,
         round(rho * sqrt((CAST(n AS DOUBLE) - 2)
                          / (1.0 - rho * rho)), 6) AS t_stat,
         abs(round(rho * sqrt((CAST(n AS DOUBLE) - 2)
                          / (1.0 - rho * rho)), 6)) > 1.96
           AS significant
  FROM sp_r
)
"""


# ---------------------------------------------------------------------------
# one-way ANOVA F-test (value by event type)
# ---------------------------------------------------------------------------

#: F critical value at alpha=0.05 for df1=4 (5 groups), df2=inf.
ANOVA_F_CRIT_05 = 2.372


def anova_f_test(events: DataFrame) -> DataFrame:
    """One-way ANOVA F-test of event value (cents) across the five
    event types — "do the type means differ at all", the k-group
    generalization the pairwise Welch/Mann-Whitney tests can't answer
    without multiplicity (that correction lives in
    ``events_multi_test_bh``).

    All per-group moments (n_g, Σx, Σx²) are exact BIGINTs from ONE
    map-side-combinable hash-agg over the fact table; SSB/SSW then
    assemble from the k=5 group rows in doubles (the only float sums
    cross 5 rows, so fold-order noise is bounded ~5 ulp at 1e13 —
    twelve orders below the 6-dp edge of F). The critical value is a
    fixed df1=4 literal (df2 is effectively infinite at any scale
    this engine targets). At 100 TB Σx² in cents² approaches BIGINT
    range around 1e18 — switch the q accumulator to decimal(38,0) at
    that point; the plan is unchanged.

    Output (1 row): k, n, ssb, ssw, f_stat, significant.
    """
    g = (
        events.select(
            "event_type",
            F.round(F.col("value") * 100, 0).cast("bigint").alias("c"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("ng"),
            F.sum("c").alias("sg"),
            F.sum(F.col("c") * F.col("c")).alias("qg"),
        )
    )
    m = g.agg(
        F.count("*").alias("k"),
        F.sum("ng").alias("n"),
        F.sum("sg").alias("s"),
        F.sum("qg").alias("q"),
        F.sum(
            F.col("sg").cast("double")
            * F.col("sg").cast("double")
            / F.col("ng").cast("double")
        ).alias("t1"),
    )
    nd = F.col("n").cast("double")
    ssb = F.col("t1") - F.col("s").cast("double") * F.col("s").cast(
        "double"
    ) / nd
    ssw = F.col("q").cast("double") - F.col("t1")
    fstat = (ssb / (F.col("k").cast("double") - 1)) / (
        ssw / (nd - F.col("k").cast("double"))
    )
    return m.select(
        "k",
        "n",
        F.round(ssb, 4).alias("ssb"),
        F.round(ssw, 4).alias("ssw"),
        F.round(fstat, 6).alias("f_stat"),
        (F.round(fstat, 6) > ANOVA_F_CRIT_05).alias("significant"),
    )


ORACLE_ANOVA = f"""
av_g AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS ng,
         CAST(sum(c) AS BIGINT) AS sg,
         CAST(sum(c * c) AS BIGINT) AS qg
  FROM (
    SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS c
    FROM events
  ) GROUP BY 1
),
av_m AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
         CAST(sum(ng) AS BIGINT) AS n,
         CAST(sum(sg) AS BIGINT) AS s,
         CAST(sum(qg) AS BIGINT) AS q,
         sum(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
             / CAST(ng AS DOUBLE)) AS t1
  FROM av_g
),
anova_f_test AS (
  SELECT k, n,
         round(t1 - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                    / CAST(n AS DOUBLE), 4) AS ssb,
         round(CAST(q AS DOUBLE) - t1, 4) AS ssw,
         round(((t1 - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                      / CAST(n AS DOUBLE)) / (CAST(k AS DOUBLE) - 1))
               / ((CAST(q AS DOUBLE) - t1)
                  / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))),
               6) AS f_stat,
         round(((t1 - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                      / CAST(n AS DOUBLE)) / (CAST(k AS DOUBLE) - 1))
               / ((CAST(q AS DOUBLE) - t1)
                  / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))),
               6) > {ANOVA_F_CRIT_05} AS significant
  FROM av_m
)
"""


# ---------------------------------------------------------------------------
# permutation test (exact randomization inference for the A/B lift)
# ---------------------------------------------------------------------------

#: number of md5-derived label permutations.
PERM_B = 64


def permutation_test(events: DataFrame, b: int = PERM_B) -> DataFrame:
    """Randomization (permutation) test for the A/B mean-spend lift —
    the assumption-free significance check beside the parametric
    Welch/z family: reshuffle the variant labels B times, recompute
    the mean difference under each reshuffle, and report how often a
    label-blind world produces a gap at least as large as the
    observed one. p = (1 + #extreme) / (B + 1), the standard
    add-one-permutation estimator.

    Reshuffle b assigns user u to arm md5(u ':' b) parity — the
    deterministic permutation stream both engines replay identically.
    ALL B reshuffles run in ONE pass: explode the per-user spend
    table by sequence(0, B-1) (linear B×users rows, map-side
    combinable) and hash-agg to B difference rows; per-b sums are
    exact BIGINT cents, each difference is one scalar expression
    rounded at 6 dp before the >= comparison so the extreme-count is
    boundary-safe. B scales the explode linearly — at 100 TB pick B
    by the same token budget as any fact-table pass (the shuffle
    carries 4·B aggregate cells, nothing more).

    Output (1 row): n_users, b, obs_diff, n_extreme, p_value.
    """
    per_user = (
        events.filter(F.col("event_type") == AB_METRIC_TYPE)
        .groupBy("user_id")
        .agg(
            F.sum(
                F.round(F.col("value") * 100, 0).cast("bigint")
            ).alias("uc")
        )
    )
    obs = per_user.agg(
        F.count("*").alias("n_users"),
        F.round(
            F.sum(
                F.when(F.col("user_id") % 2 == 0, F.col("uc")).otherwise(0)
            )
            / F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0))
            - F.sum(
                F.when(F.col("user_id") % 2 == 1, F.col("uc")).otherwise(0)
            )
            / F.sum(F.when(F.col("user_id") % 2 == 1, 1).otherwise(0)),
            6,
        ).alias("obs_diff"),
    )
    lab = (
        per_user.select(
            "user_id",
            "uc",
            F.explode(F.sequence(F.lit(0), F.lit(b - 1))).alias("b"),
        )
        .withColumn(
            "arm",
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.col("user_id"), F.col("b"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint")
            % 2,
        )
    )
    per_b = lab.groupBy("b").agg(
        F.round(
            F.sum(F.when(F.col("arm") == 0, F.col("uc")).otherwise(0))
            / F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
            - F.sum(F.when(F.col("arm") == 1, F.col("uc")).otherwise(0))
            / F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)),
            6,
        ).alias("diff")
    )
    return (
        per_b.crossJoin(F.broadcast(obs))
        .agg(
            F.max("n_users").alias("n_users"),
            F.count("*").alias("b"),
            F.max("obs_diff").alias("obs_diff"),
            F.sum(
                (F.abs(F.col("diff")) >= F.abs(F.col("obs_diff"))).cast(
                    "int"
                )
            ).alias("n_extreme"),
        )
        .select(
            "n_users",
            "b",
            "obs_diff",
            "n_extreme",
            F.round(
                (1 + F.col("n_extreme")) / (F.col("b").cast("double") + 1),
                6,
            ).alias("p_value"),
        )
    )


ORACLE_PERMTEST = f"""
pt_user AS (
  SELECT user_id,
         CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS uc
  FROM events WHERE event_type = '{AB_METRIC_TYPE}' GROUP BY 1
),
pt_obs AS (
  SELECT CAST(count(*) AS BIGINT) AS n_users,
         round(CAST(sum(CASE WHEN user_id % 2 = 0 THEN uc ELSE 0 END)
                    AS BIGINT)
               / CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                      AS BIGINT)
               - CAST(sum(CASE WHEN user_id % 2 = 1 THEN uc ELSE 0 END)
                      AS BIGINT)
               / CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
                      AS BIGINT), 6) AS obs_diff
  FROM pt_user
),
pt_lab AS (
  SELECT u.uc, t.b,
         CAST(('0x' || substr(md5(u.user_id || ':' || t.b), 1, 15))
              AS BIGINT) % 2 AS arm
  FROM pt_user u, LATERAL (SELECT unnest(range({PERM_B})) AS b) t
),
pt_b AS (
  SELECT b,
         round(CAST(sum(CASE WHEN arm = 0 THEN uc ELSE 0 END) AS BIGINT)
               / CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
               - CAST(sum(CASE WHEN arm = 1 THEN uc ELSE 0 END) AS BIGINT)
               / CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT),
               6) AS diff
  FROM pt_lab GROUP BY 1
),
permutation_test AS (
  SELECT max(o.n_users) AS n_users,
         CAST(count(*) AS BIGINT) AS b,
         max(o.obs_diff) AS obs_diff,
         CAST(sum(CASE WHEN abs(p.diff) >= abs(o.obs_diff)
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
         round((1 + CAST(sum(CASE WHEN abs(p.diff) >= abs(o.obs_diff)
                             THEN 1 ELSE 0 END) AS BIGINT))
               / (CAST(count(*) AS DOUBLE) + 1), 6) AS p_value
  FROM pt_b p, pt_obs o
)
"""


# ---------------------------------------------------------------------------
# Theil inequality decomposition (customer revenue, between/within nations)
# ---------------------------------------------------------------------------


def theil_decomposition(
    orders: DataFrame, customer: DataFrame, nation: DataFrame
) -> DataFrame:
    """Theil T inequality index of customer revenue, decomposed into
    BETWEEN-nation and WITHIN-nation components — the additive
    decomposition Gini/Lorenz (``events_revenue_gini``) cannot give:
    T_total = Σ_g share_g · T_g + Σ_g share_g · ln(mean_g / mean).

    One order-grain agg to customer cents (exact BIGINT), one
    customer→nation join (nation broadcast), one nation-grain moment
    agg (n_g, Σx, Σ x·ln x); the global row attaches by a 1-row
    broadcast cross join. The only doubles are the per-group Σ x·ln x
    (noise ~1e-12 relative to T_g at the 6-dp edge) and the ln of
    exact-integer ratios, identical IEEE scalars in both engines.

    Output per nation: nation, n_cust, s_cents, theil_within_g
    (T_g), between_term, within_term.
    """
    cust = orders.groupBy("o_custkey").agg(
        F.sum(
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
        ).alias("x")
    )
    grp = (
        cust.join(
            customer.select("c_custkey", "c_nationkey"),
            cust.o_custkey == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("ng"),
            F.sum("x").alias("sg"),
            F.sum(
                F.col("x").cast("double") * F.log(F.col("x").cast("double"))
            ).alias("xlx"),
        )
    )
    tot = grp.agg(
        F.sum("ng").alias("n"), F.sum("sg").alias("s")
    )
    sgd = F.col("sg").cast("double")
    sd = F.col("s").cast("double")
    tg = F.col("xlx") / sgd - F.log(sgd / F.col("ng").cast("double"))
    share = sgd / sd
    between = share * F.log(
        (sgd / F.col("ng").cast("double"))
        / (sd / F.col("n").cast("double"))
    )
    return grp.crossJoin(F.broadcast(tot)).select(
        "nation",
        F.col("ng").alias("n_cust"),
        F.col("sg").alias("s_cents"),
        F.round(tg, 6).alias("theil_within_g"),
        F.round(between, 6).alias("between_term"),
        F.round(share * tg, 6).alias("within_term"),
    )


ORACLE_THEIL = """
th_cust AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS x
  FROM orders GROUP BY 1
),
th_g AS (
  SELECT n.n_name AS nation,
         CAST(count(*) AS BIGINT) AS ng,
         CAST(sum(t.x) AS BIGINT) AS sg,
         sum(CAST(t.x AS DOUBLE) * ln(CAST(t.x AS DOUBLE))) AS xlx
  FROM th_cust t
  JOIN customer c ON t.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1
),
th_tot AS (
  SELECT CAST(sum(ng) AS BIGINT) AS n, CAST(sum(sg) AS BIGINT) AS s
  FROM th_g
),
theil_decomposition AS (
  SELECT g.nation, g.ng AS n_cust, g.sg AS s_cents,
         round(g.xlx / CAST(g.sg AS DOUBLE)
               - ln(CAST(g.sg AS DOUBLE) / CAST(g.ng AS DOUBLE)),
               6) AS theil_within_g,
         round(CAST(g.sg AS DOUBLE) / CAST(t.s AS DOUBLE)
               * ln((CAST(g.sg AS DOUBLE) / CAST(g.ng AS DOUBLE))
                    / (CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE))),
               6) AS between_term,
         round(CAST(g.sg AS DOUBLE) / CAST(t.s AS DOUBLE)
               * (g.xlx / CAST(g.sg AS DOUBLE)
                  - ln(CAST(g.sg AS DOUBLE) / CAST(g.ng AS DOUBLE))),
               6) AS within_term
  FROM th_g g, th_tot t
)
"""


# ---------------------------------------------------------------------------
# Nelson-Aalen cumulative hazard (companion of Kaplan-Meier)
# ---------------------------------------------------------------------------


def nelson_aalen(events: DataFrame) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimator over the same
    censored user lifetimes as ``km_survival``: H(t) = Σ_{t_i<=t}
    d_i/n_i, with the Poisson variance Σ d_i/n_i² and the
    Fleming-Harrington survival exp(−H) beside it — the hazard-scale
    view KM's product form cannot give (H is additive, so hazards of
    disjoint cohorts/windows merge by +).

    Identical distributed shape to KM: one user-grain span agg, one
    distinct-duration grain table (bounded by the day span), and
    cumulative sums over the ORDERED duration grain — both engines
    fold the d/n rationals in the same order, so results agree to the
    last double bit before round(6).

    Output per churn time: t_days, n_risk, n_churned, cum_hazard,
    var_hazard, fh_survival.
    """
    spans = events.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("d0"),
        F.max(F.to_date("ts")).alias("d1"),
    )
    horizon = events.agg(F.max(F.to_date("ts")).alias("dmax"))
    users = spans.crossJoin(F.broadcast(horizon)).select(
        F.datediff("d1", "d0").alias("t_days"),
        (F.datediff("dmax", "d1") < KM_CENSOR_DAYS).alias("censored"),
    )
    per_t = users.groupBy("t_days").agg(
        F.count("*").alias("n_exit"),
        F.sum(F.when(~F.col("censored"), 1).otherwise(0)).alias(
            "n_churned"
        ),
    )
    w = Window.orderBy("t_days").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wS = Window.orderBy("t_days").rowsBetween(
        Window.unboundedPreceding, 0
    )
    total = users.count()
    nr = F.lit(total) - F.coalesce(F.sum("n_exit").over(w), F.lit(0))
    curve = (
        per_t.withColumn("n_risk", nr)
        .withColumn(
            "hterm",
            F.col("n_churned").cast("double")
            / F.col("n_risk").cast("double"),
        )
        .withColumn(
            "vterm",
            F.col("n_churned").cast("double")
            / (
                F.col("n_risk").cast("double")
                * F.col("n_risk").cast("double")
            ),
        )
        .withColumn("h", F.sum("hterm").over(wS))
        .withColumn("v", F.sum("vterm").over(wS))
    )
    return curve.filter(F.col("n_churned") > 0).select(
        "t_days",
        "n_risk",
        "n_churned",
        F.round("h", 6).alias("cum_hazard"),
        F.round("v", 6).alias("var_hazard"),
        F.round(F.exp(-F.col("h")), 6).alias("fh_survival"),
    )


ORACLE_NELSON_AALEN = f"""
na_u AS (
  SELECT date_diff('day', d0, d1) AS t_days,
         date_diff('day', d1,
                   (SELECT max(CAST(ts AS DATE)) FROM events))
           < {KM_CENSOR_DAYS} AS censored
  FROM (SELECT user_id, min(CAST(ts AS DATE)) AS d0,
               max(CAST(ts AS DATE)) AS d1
        FROM events GROUP BY 1)
),
na_t AS (
  SELECT t_days, CAST(count(*) AS BIGINT) AS n_exit,
         CAST(sum(CASE WHEN NOT censored THEN 1 ELSE 0 END) AS BIGINT)
           AS n_churned
  FROM na_u GROUP BY 1
),
na_c AS (
  SELECT t_days, n_churned,
         CAST((SELECT count(*) FROM na_u)
           - COALESCE(sum(n_exit) OVER (ORDER BY t_days
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS n_risk
  FROM na_t
),
na_h AS (
  SELECT t_days, n_risk, n_churned,
         sum(CAST(n_churned AS DOUBLE) / CAST(n_risk AS DOUBLE))
           OVER (ORDER BY t_days
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS h,
         sum(CAST(n_churned AS DOUBLE)
             / (CAST(n_risk AS DOUBLE) * CAST(n_risk AS DOUBLE)))
           OVER (ORDER BY t_days
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS v
  FROM na_c
),
nelson_aalen AS (
  SELECT t_days, n_risk, n_churned,
         round(h, 6) AS cum_hazard,
         round(v, 6) AS var_hazard,
         round(exp(-h), 6) AS fh_survival
  FROM na_h WHERE n_churned > 0
)
"""


# ---------------------------------------------------------------------------
# group-sequential A/B test (O'Brien-Fleming boundaries)
# ---------------------------------------------------------------------------

#: number of interim looks.
GS_LOOKS = 5
#: two-sided alpha=0.05 O'Brien-Fleming z boundaries for K=5 looks.
GS_OBF_BOUNDS = (4.877, 3.357, 2.680, 2.290, 2.031)


def group_sequential_test(events: DataFrame) -> DataFrame:
    """Group-sequential A/B monitoring with O'Brien-Fleming stopping
    boundaries: the observation window splits into K=5 equal-width
    epochs, and at each look k the CUMULATIVE purchase-value z
    (variant 0 vs 1, exact integer-cent moments through epoch k) is
    compared to the OBF boundary — the peeking-safe alternative to
    re-running a fixed-horizon test daily (which inflates false
    positives ~3x at daily peeks).

    One fact pass to (epoch, variant) moment cells (10 rows), then
    cumulative sums over the ordered 5-row epoch grain; each z is one
    closed-form expression on exact BIGINTs, boundaries are fixed
    literals. Epoch edges derive from the min/max event day (1-row
    broadcast), so the split is deterministic at any scale.

    Output per look: look, n_cum, z (rounded 6), obf_bound, crossed.
    """
    days = events.agg(
        F.min(F.to_date("ts")).alias("d0"),
        (F.datediff(F.max(F.to_date("ts")), F.min(F.to_date("ts"))) + 1)
        .alias("span"),
    )
    cells = (
        events.filter(F.col("event_type") == AB_METRIC_TYPE)
        .crossJoin(F.broadcast(days))
        .select(
            F.least(
                F.lit(GS_LOOKS - 1),
                (
                    F.lit(GS_LOOKS)
                    * F.datediff(F.to_date("ts"), F.col("d0"))
                )
                / F.col("span"),
            )
            .cast("int")
            .alias("epoch"),
            (F.col("user_id") % 2).cast("int").alias("variant"),
            F.round(F.col("value") * 100, 0).cast("bigint").alias("c"),
        )
        .groupBy("epoch", "variant")
        .agg(
            F.count("*").alias("n"),
            F.sum("c").alias("s"),
            F.sum(F.col("c") * F.col("c")).alias("q"),
        )
    )
    wcum = Window.partitionBy("variant").orderBy("epoch").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = cells.select(
        "epoch",
        "variant",
        F.sum("n").over(wcum).alias("cn"),
        F.sum("s").over(wcum).alias("cs"),
        F.sum("q").over(wcum).alias("cq"),
    )
    looks = (
        cum.groupBy("epoch")
        .agg(
            F.sum(F.when(F.col("variant") == 0, F.col("cn"))).alias("n0"),
            F.sum(F.when(F.col("variant") == 0, F.col("cs"))).alias("s0"),
            F.sum(F.when(F.col("variant") == 0, F.col("cq"))).alias("q0"),
            F.sum(F.when(F.col("variant") == 1, F.col("cn"))).alias("n1"),
            F.sum(F.when(F.col("variant") == 1, F.col("cs"))).alias("s1"),
            F.sum(F.when(F.col("variant") == 1, F.col("cq"))).alias("q1"),
        )
    )
    n0d = F.col("n0").cast("double")
    n1d = F.col("n1").cast("double")
    # per-arm variance via the n·Σx² − (Σx)² identity on exact ints,
    # assembled in doubles (single scalar expression per look).
    v0 = (
        n0d * F.col("q0").cast("double")
        - F.col("s0").cast("double") * F.col("s0").cast("double")
    ) / (n0d * n0d * (n0d - 1))
    v1 = (
        n1d * F.col("q1").cast("double")
        - F.col("s1").cast("double") * F.col("s1").cast("double")
    ) / (n1d * n1d * (n1d - 1))
    z = (
        F.col("s1").cast("double") / n1d
        - F.col("s0").cast("double") / n0d
    ) / F.sqrt(v0 + v1)
    bound = F.element_at(
        F.array(*[F.lit(b) for b in GS_OBF_BOUNDS]), F.col("epoch") + 1
    )
    return looks.select(
        (F.col("epoch") + 1).alias("look"),
        (F.col("n0") + F.col("n1")).alias("n_cum"),
        F.round(z, 6).alias("z"),
        bound.alias("obf_bound"),
        (F.abs(F.round(z, 6)) > bound).alias("crossed"),
    )


def oracle_group_sequential() -> str:
    bounds = ", ".join(
        f"({i + 1}, CAST({b} AS DOUBLE))"
        for i, b in enumerate(GS_OBF_BOUNDS)
    )
    return f"""
gs_days AS (
  SELECT min(CAST(ts AS DATE)) AS d0,
         date_diff('day', min(CAST(ts AS DATE)),
                   max(CAST(ts AS DATE))) + 1 AS span
  FROM events
),
gs_cells AS (
  SELECT CAST(least({GS_LOOKS - 1},
              ({GS_LOOKS} * date_diff('day', d.d0, CAST(e.ts AS DATE)))
              // d.span) AS INT) AS epoch,
         CAST(e.user_id % 2 AS INT) AS variant,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(e.value * 100, 0) AS BIGINT)) AS BIGINT)
           AS s,
         CAST(sum(CAST(round(e.value * 100, 0) AS BIGINT)
                  * CAST(round(e.value * 100, 0) AS BIGINT)) AS BIGINT)
           AS q
  FROM events e, gs_days d
  WHERE e.event_type = '{AB_METRIC_TYPE}'
  GROUP BY 1, 2
),
gs_cum AS (
  SELECT epoch, variant,
         CAST(sum(n) OVER wc AS BIGINT) AS cn,
         CAST(sum(s) OVER wc AS BIGINT) AS cs,
         CAST(sum(q) OVER wc AS BIGINT) AS cq
  FROM gs_cells
  WINDOW wc AS (PARTITION BY variant ORDER BY epoch
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
gs_looks AS (
  SELECT epoch,
         CAST(sum(CASE WHEN variant = 0 THEN cn END) AS BIGINT) AS n0,
         CAST(sum(CASE WHEN variant = 0 THEN cs END) AS BIGINT) AS s0,
         CAST(sum(CASE WHEN variant = 0 THEN cq END) AS BIGINT) AS q0,
         CAST(sum(CASE WHEN variant = 1 THEN cn END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN variant = 1 THEN cs END) AS BIGINT) AS s1,
         CAST(sum(CASE WHEN variant = 1 THEN cq END) AS BIGINT) AS q1
  FROM gs_cum GROUP BY 1
),
gs_bounds (look, b) AS (VALUES {bounds}),
gs_z AS (
  SELECT epoch + 1 AS look, n0 + n1 AS n_cum,
         round((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
               / sqrt((CAST(n0 AS DOUBLE) * CAST(q0 AS DOUBLE)
                       - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE))
                      / (CAST(n0 AS DOUBLE) * CAST(n0 AS DOUBLE)
                         * (CAST(n0 AS DOUBLE) - 1))
                      + (CAST(n1 AS DOUBLE) * CAST(q1 AS DOUBLE)
                         - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                        / (CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE)
                           * (CAST(n1 AS DOUBLE) - 1))), 6) AS z
  FROM gs_looks
),
group_sequential_test AS (
  SELECT g.look, g.n_cum, g.z, b.b AS obf_bound,
         abs(g.z) > b.b AS crossed
  FROM gs_z g JOIN gs_bounds b ON g.look = b.look
)
"""


# ---------------------------------------------------------------------------
# uplift deciles + Qini curve (incrementality evaluation)
# ---------------------------------------------------------------------------


def qini_uplift(events: DataFrame) -> DataFrame:
    """Uplift-by-decile table with the cumulative Qini statistic: rank
    users by a targeting score (pre-conversion engagement = view
    count), split into score deciles (best first), and per decile
    compare conversion between the randomized arms; the Qini value at
    cut k is the classic CONV_T(k) − CONV_C(k)·N_T(k)/N_C(k) on
    cumulative counts — "how many EXTRA conversions did targeting the
    top k deciles cause". The evaluation half of uplift modeling —
    plug any score in; this one uses a transparent covariate so the
    whole readout is oracle-checkable.

    Deciles come from descending prefix-sums over the DISTINCT-score
    grain (ties share a decile; no global sort) and everything
    downstream lives on the 10-row decile grain — exact BIGINT counts
    until the two rounded ratios per row.

    Output per decile: decile, n_t, n_c, conv_t, conv_c, uplift,
    qini_cum.
    """
    per_user = events.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "view", 1).otherwise(0)
        ).alias("x"),
        F.max(
            (F.col("event_type") == "purchase").cast("int")
        ).alias("y"),
    ).select(
        "x", "y", (F.col("user_id") % 2).cast("int").alias("t")
    )
    per_v = per_user.groupBy("x").agg(F.count("*").alias("c"))
    tot = per_user.agg(F.count("*").alias("n_all"))
    # descending EXCLUSIVE prefix count via the distributed-rank
    # kernel (inclusive running sum minus own count) — the distinct-
    # score table is value-grain, but a hot scorer makes it user-
    # grain-sized, so no unpartitioned window here either.
    dec = (
        _rank.global_ranked(per_v, [F.desc("x")], sum_cols=["c"])
        .withColumn("p", F.col("_run_c") - F.col("c"))
        .crossJoin(F.broadcast(tot))
        .select(
            "x",
            F.least(
                F.lit(9), (10 * F.col("p")) / F.col("n_all")
            )
            .cast("int")
            .alias("decile"),
        )
    )
    cells = (
        per_user.join(dec, "x")
        .groupBy("decile")
        .agg(
            F.sum(F.when(F.col("t") == 1, 1).otherwise(0)).alias("n_t"),
            F.sum(F.when(F.col("t") == 0, 1).otherwise(0)).alias("n_c"),
            F.sum(F.when(F.col("t") == 1, F.col("y")).otherwise(0)).alias(
                "conv_t"
            ),
            F.sum(F.when(F.col("t") == 0, F.col("y")).otherwise(0)).alias(
                "conv_c"
            ),
        )
    )
    wc = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return cells.select(
        "decile",
        "n_t",
        "n_c",
        "conv_t",
        "conv_c",
        F.round(
            F.col("conv_t") / F.col("n_t")
            - F.col("conv_c") / F.col("n_c"),
            6,
        ).alias("uplift"),
        F.round(
            F.sum("conv_t").over(wc)
            - F.sum("conv_c").over(wc)
            * F.sum("n_t").over(wc)
            / F.sum("n_c").over(wc),
            6,
        ).alias("qini_cum"),
    )


ORACLE_QINI = """
qn_user AS (
  SELECT CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              AS BIGINT) AS x,
         CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS y,
         CAST(user_id % 2 AS INT) AS t
  FROM events GROUP BY user_id
),
qn_dec AS (
  SELECT x, CAST(least(9, (10 * p) // n_all) AS INT) AS decile FROM (
    SELECT x,
           CAST(coalesce(sum(count(*)) OVER (ORDER BY x DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS p,
           (SELECT count(*) FROM qn_user) AS n_all
    FROM qn_user GROUP BY 1
  )
),
qn_cells AS (
  SELECT d.decile,
         CAST(sum(CASE WHEN u.t = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_t,
         CAST(sum(CASE WHEN u.t = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_c,
         CAST(sum(CASE WHEN u.t = 1 THEN u.y ELSE 0 END) AS BIGINT)
           AS conv_t,
         CAST(sum(CASE WHEN u.t = 0 THEN u.y ELSE 0 END) AS BIGINT)
           AS conv_c
  FROM qn_user u JOIN qn_dec d ON u.x = d.x
  GROUP BY 1
),
qini_uplift AS (
  SELECT decile, n_t, n_c, conv_t, conv_c,
         round(conv_t / CAST(n_t AS DOUBLE)
               - conv_c / CAST(n_c AS DOUBLE), 6) AS uplift,
         round(CAST(sum(conv_t) OVER wq AS BIGINT)
               - CAST(sum(conv_c) OVER wq AS BIGINT)
                 * CAST(sum(n_t) OVER wq AS BIGINT)
                 / CAST(sum(n_c) OVER wq AS DOUBLE), 6) AS qini_cum
  FROM qn_cells
  WINDOW wq AS (ORDER BY decile
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
"""


# ---------------------------------------------------------------------------
# off-policy evaluation (IPS / SNIPS replay on randomized logs)
# ---------------------------------------------------------------------------

#: target policy: treat users with at least this many views.
IPS_POLICY_MIN_VIEWS = 3


def offpolicy_ips(events: DataFrame) -> DataFrame:
    """Off-policy (counterfactual) evaluation by replay: the A/B log
    randomized arms uniformly (p = 1/2), so ANY deterministic target
    policy π can be valued offline — IPS = (1/N) Σ 1[a=π(x)]·r/p and
    its self-normalized SNIPS variant (lower variance, the standard
    fix when match rates drift). Here π targets engaged users
    (views ≥ {mv}); reward is purchase cents. This is the bandit /
    recommender-replay primitive: evaluate tomorrow's policy on
    yesterday's randomized traffic without an experiment.

    One user-grain agg (arm, views, exact cents), one conditional
    1-row reduction — every statistic is a ratio of BIGINT sums.

    Output (1 row): n, n_match, v_logged, v_ips, v_snips.
    """
    per_user = events.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "view", 1).otherwise(0)
        ).alias("x"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100, 0).cast("bigint"),
            ).otherwise(0)
        ).alias("r"),
    ).select(
        "x",
        "r",
        (F.col("user_id") % 2).cast("int").alias("a"),
    )
    pi = F.when(
        F.col("x") >= IPS_POLICY_MIN_VIEWS, F.lit(1)
    ).otherwise(F.lit(0))
    m = per_user.select(
        "r", (F.col("a") == pi).cast("int").alias("match")
    ).agg(
        F.count("*").alias("n"),
        F.sum("match").alias("n_match"),
        F.sum("r").alias("s_all"),
        F.sum(F.col("match") * F.col("r")).alias("s_match"),
    )
    return m.select(
        "n",
        "n_match",
        F.round(F.col("s_all") / F.col("n"), 6).alias("v_logged"),
        F.round(
            F.lit(2) * F.col("s_match") / F.col("n"), 6
        ).alias("v_ips"),
        F.round(F.col("s_match") / F.col("n_match"), 6).alias(
            "v_snips"
        ),
    )


offpolicy_ips.__doc__ = offpolicy_ips.__doc__.format(
    mv=IPS_POLICY_MIN_VIEWS
)


ORACLE_IPS = f"""
op_user AS (
  SELECT CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              AS BIGINT) AS x,
         CAST(sum(CASE WHEN event_type = 'purchase'
                       THEN CAST(round(value * 100, 0) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS r,
         CAST(user_id % 2 AS INT) AS a
  FROM events GROUP BY user_id
),
op_m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN a = (CASE WHEN x >= {IPS_POLICY_MIN_VIEWS}
                                      THEN 1 ELSE 0 END)
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
         CAST(sum(r) AS BIGINT) AS s_all,
         CAST(sum(CASE WHEN a = (CASE WHEN x >= {IPS_POLICY_MIN_VIEWS}
                                      THEN 1 ELSE 0 END)
                       THEN r ELSE 0 END) AS BIGINT) AS s_match
  FROM op_user
),
offpolicy_ips AS (
  SELECT n, n_match,
         round(s_all / CAST(n AS DOUBLE), 6) AS v_logged,
         round(2 * s_match / CAST(n AS DOUBLE), 6) AS v_ips,
         round(s_match / CAST(n_match AS DOUBLE), 6) AS v_snips
  FROM op_m
)
"""


# ---------------------------------------------------------------------------
# log-rank test (survival difference between the A/B arms)
# ---------------------------------------------------------------------------


def logrank_test(events: DataFrame) -> DataFrame:
    """Log-rank test comparing the two arms' churn survival curves —
    the hypothesis test the KM/Nelson-Aalen estimators describe: at
    each distinct churn time, arm 1's observed churn d1 is compared
    to its hypergeometric expectation d·n1/n given the at-risk sets,
    and z = Σ(O−E)/sqrt(ΣV). Censoring (active in the final window)
    is handled exactly as in ``km_survival``.

    All at-risk counts are exact BIGINT prefix-sums over the ordered
    distinct-DURATION grain (bounded by the day span); the O−E and
    variance terms are per-row scalars on those integers, summed over
    the duration grain (noise ~1e-15 vs the 6-dp edge). V terms with
    n ≤ 1 are 0 by definition.

    Output (1 row): n_times, o1, e1, z, significant.
    """
    spans = events.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("d0"),
        F.max(F.to_date("ts")).alias("d1"),
        F.max(F.col("user_id") % 2).alias("arm"),
    )
    horizon = events.agg(F.max(F.to_date("ts")).alias("dmax"))
    users = spans.crossJoin(F.broadcast(horizon)).select(
        F.datediff("d1", "d0").alias("t_days"),
        (F.datediff("dmax", "d1") < KM_CENSOR_DAYS).alias("censored"),
        F.col("arm").cast("int").alias("arm"),
    )
    per_t = users.groupBy("t_days").agg(
        F.count("*").alias("ex"),
        F.sum(F.when(~F.col("censored"), 1).otherwise(0)).alias("ch"),
        F.sum("arm").alias("ex1"),
        F.sum(
            F.when(~F.col("censored"), F.col("arm")).otherwise(0)
        ).alias("ch1"),
    )
    tot = users.agg(
        F.count("*").alias("nn"), F.sum("arm").alias("nn1")
    )
    w = Window.orderBy("t_days").rowsBetween(
        Window.unboundedPreceding, -1
    )
    risk = (
        per_t.withColumn(
            "cex", F.coalesce(F.sum("ex").over(w), F.lit(0))
        )
        .withColumn(
            "cex1", F.coalesce(F.sum("ex1").over(w), F.lit(0))
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "ch",
            "ch1",
            (F.col("nn") - F.col("cex")).alias("n"),
            (F.col("nn1") - F.col("cex1")).alias("n1"),
        )
        .filter(F.col("ch") > 0)
    )
    nd = F.col("n").cast("double")
    n1d = F.col("n1").cast("double")
    chd = F.col("ch").cast("double")
    eterm = chd * n1d / nd
    vterm = F.when(
        F.col("n") > 1,
        chd
        * (n1d / nd)
        * (1.0 - n1d / nd)
        * (nd - chd)
        / (nd - 1.0),
    ).otherwise(F.lit(0.0))
    agg = risk.agg(
        F.count("*").alias("n_times"),
        F.sum("ch1").alias("o1"),
        F.sum(eterm).alias("e1"),
        F.sum(F.col("ch1").cast("double") - eterm).alias("ome"),
        F.sum(vterm).alias("v"),
    )
    z = F.col("ome") / F.sqrt(F.col("v"))
    return agg.select(
        "n_times",
        "o1",
        F.round("e1", 6).alias("e1"),
        F.round(z, 6).alias("z"),
        (F.abs(F.round(z, 6)) > 1.96).alias("significant"),
    )


ORACLE_LOGRANK = f"""
lr_u AS (
  SELECT date_diff('day', d0, d1) AS t_days,
         date_diff('day', d1,
                   (SELECT max(CAST(ts AS DATE)) FROM events))
           < {KM_CENSOR_DAYS} AS censored,
         arm
  FROM (SELECT user_id, min(CAST(ts AS DATE)) AS d0,
               max(CAST(ts AS DATE)) AS d1,
               CAST(max(user_id % 2) AS INT) AS arm
        FROM events GROUP BY 1)
),
lr_t AS (
  SELECT t_days,
         CAST(count(*) AS BIGINT) AS ex,
         CAST(sum(CASE WHEN NOT censored THEN 1 ELSE 0 END) AS BIGINT)
           AS ch,
         CAST(sum(arm) AS BIGINT) AS ex1,
         CAST(sum(CASE WHEN NOT censored THEN arm ELSE 0 END)
              AS BIGINT) AS ch1
  FROM lr_u GROUP BY 1
),
lr_tot AS (
  SELECT CAST(count(*) AS BIGINT) AS nn,
         CAST(sum(arm) AS BIGINT) AS nn1
  FROM lr_u
),
lr_r AS (
  SELECT ch, ch1,
         t.nn - CAST(coalesce(sum(ex) OVER wp, 0) AS BIGINT) AS n,
         t.nn1 - CAST(coalesce(sum(ex1) OVER wp, 0) AS BIGINT) AS n1
  FROM lr_t, lr_tot t
  WINDOW wp AS (ORDER BY t_days
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
lr_a AS (
  SELECT CAST(count(*) AS BIGINT) AS n_times,
         CAST(sum(ch1) AS BIGINT) AS o1,
         sum(CAST(ch AS DOUBLE) * CAST(n1 AS DOUBLE)
             / CAST(n AS DOUBLE)) AS e1,
         sum(CAST(ch1 AS DOUBLE)
             - CAST(ch AS DOUBLE) * CAST(n1 AS DOUBLE)
               / CAST(n AS DOUBLE)) AS ome,
         sum(CASE WHEN n > 1
                  THEN CAST(ch AS DOUBLE)
                       * (CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE))
                       * (1.0 - CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE))
                       * (CAST(n AS DOUBLE) - CAST(ch AS DOUBLE))
                       / (CAST(n AS DOUBLE) - 1.0)
                  ELSE 0.0 END) AS v
  FROM lr_r WHERE ch > 0
),
logrank_test AS (
  SELECT n_times, o1, round(e1, 6) AS e1,
         round(ome / sqrt(v), 6) AS z,
         abs(round(ome / sqrt(v), 6)) > 1.96 AS significant
  FROM lr_a
)
"""


# ---------------------------------------------------------------------------
# order backlog curve (open orders over time, sweep line)
# ---------------------------------------------------------------------------


def orders_backlog_curve(
    orders: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """Open-order backlog over time: an order opens at o_orderdate and
    closes when its LAST lineitem ships (max l_shipdate — the fixture's
    fulfillment timestamp), so
    the backlog on day d = Σ(+1 opens, −1 closes) up to d — the
    sweep-line / interval-stabbing reduction (the fulfillment-ops
    sibling of the session concurrency curve). Little's law readers
    can divide avg backlog by the open rate to recover lead time.

    One lineitem hash-agg (max ship day per order), one order-grain
    join, then ±1 deltas collapse to the DAY grain — the cumulative
    window runs over a few thousand day rows at ANY fact scale, so
    the single-partition prefix is data-independent.

    Output per day: day, n_opened, n_closed, backlog.
    """
    closes = lineitem.groupBy("l_orderkey").agg(
        F.max(F.to_date("l_shipdate")).alias("close_day")
    )
    spans = orders.select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.to_date("o_orderdate").alias("open_day"),
    ).join(closes, "l_orderkey")
    deltas = spans.select(
        F.col("open_day").alias("day"),
        F.lit(1).alias("opened"),
        F.lit(0).alias("closed"),
    ).unionByName(
        spans.select(
            F.col("close_day").alias("day"),
            F.lit(0).alias("opened"),
            F.lit(1).alias("closed"),
        )
    )
    per_day = deltas.groupBy("day").agg(
        F.sum("opened").alias("n_opened"),
        F.sum("closed").alias("n_closed"),
    )
    wc = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return per_day.select(
        "day",
        "n_opened",
        "n_closed",
        F.sum(F.col("n_opened") - F.col("n_closed"))
        .over(wc)
        .alias("backlog"),
    )


ORACLE_BACKLOG = """
bk_close AS (
  SELECT l_orderkey, max(CAST(l_shipdate AS DATE)) AS close_day
  FROM lineitem GROUP BY 1
),
bk_span AS (
  SELECT CAST(o.o_orderdate AS DATE) AS open_day, c.close_day
  FROM orders o JOIN bk_close c ON o.o_orderkey = c.l_orderkey
),
bk_delta AS (
  SELECT open_day AS day, 1 AS opened, 0 AS closed FROM bk_span
  UNION ALL
  SELECT close_day AS day, 0 AS opened, 1 AS closed FROM bk_span
),
bk_day AS (
  SELECT day, CAST(sum(opened) AS BIGINT) AS n_opened,
         CAST(sum(closed) AS BIGINT) AS n_closed
  FROM bk_delta GROUP BY 1
),
orders_backlog_curve AS (
  SELECT day, n_opened, n_closed,
         CAST(sum(n_opened - n_closed) OVER (ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS backlog
  FROM bk_day
)
"""


# ---------------------------------------------------------------------------
# iterative proportional fitting (survey raking) on the type x variant grid
# ---------------------------------------------------------------------------

#: IPF rounds (each = one row-scale + one column-scale).
IPF_ROUNDS = 3
#: weight scale (millionths).
IPF_SCALE = 1_000_000


def ipf_raking(events: DataFrame) -> DataFrame:
    """Survey raking / iterative proportional fitting: reweight the
    observed (event_type × variant) contingency cells so the weighted
    margins match TARGET margins (uniform over types, 50/50 over
    variants) — the standard post-stratification weighting when a
    sample's composition drifts from the population's. Each IPF round
    scales rows then columns by target/current margin; weights are
    integer millionths with floor division, so the unrolled rounds
    replay exactly in any engine.

    The fact table collapses to the k×2 cell grid in ONE hash-agg;
    every IPF round after that is two aggs + two joins on the
    CELL-GRAIN table (bounded by the category product, never data) —
    at 100 TB the iteration cost does not change.

    Output per cell: event_type, variant, n_obs, w_mill (final
    weight, millionths of the initial uniform weight).
    """
    # one fact pass to the k x 2 cell grid, then CHECKPOINT: every IPF
    # round references the weight table twice (margin agg + rescale
    # join), so without a lineage cut the fact agg re-runs 4^rounds
    # times (measured 12 s -> ~1 s at sf0.01).
    cells = (
        events.groupBy(
            "event_type",
            (F.col("user_id") % 2).cast("int").alias("variant"),
        )
        .agg(F.count("*").alias("n_obs"))
        .localCheckpoint(eager=True)
    )
    tot = cells.agg(F.sum("n_obs").alias("n"), F.count("*").alias("k"))
    # target margins: each type gets n/n_types, each variant n/2 —
    # expressed per cell via 1-row broadcast.
    w = (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "variant",
            "n_obs",
            "n",
            F.lit(IPF_SCALE).cast("bigint").alias("w"),
        )
    )
    n_types = cells.select("event_type").distinct().count()
    # margins as partitioned windows over the cell grid (the oracle's
    # exact shape) — no per-round joins, so the unrolled plan stays
    # flat: 2 window ops per round over k x 2 rows.
    wr = Window.partitionBy("event_type")
    wc = Window.partitionBy("variant")
    for _ in range(IPF_ROUNDS):
        w = w.withColumn(
            "rm", F.sum(F.col("w") * F.col("n_obs")).over(wr)
        ).select(
            "event_type",
            "variant",
            "n_obs",
            "n",
            F.expr(
                f"CAST(w * (n * {IPF_SCALE} DIV {n_types})"
                " DIV rm AS BIGINT)"
            ).alias("w"),
        )
        w = w.withColumn(
            "cm", F.sum(F.col("w") * F.col("n_obs")).over(wc)
        ).select(
            "event_type",
            "variant",
            "n_obs",
            "n",
            F.expr(
                f"CAST(w * (n * {IPF_SCALE} DIV 2)"
                " DIV cm AS BIGINT)"
            ).alias("w"),
        )
    return w.select(
        "event_type", "variant", "n_obs", F.col("w").alias("w_mill")
    )


def oracle_ipf_raking(rounds: int = IPF_ROUNDS) -> str:
    ctes = [
        f"""
ipf_cells AS (
  SELECT event_type, CAST(user_id % 2 AS INT) AS variant,
         CAST(count(*) AS BIGINT) AS n_obs
  FROM events GROUP BY 1, 2
),
ipf_tot AS (
  SELECT CAST(sum(n_obs) AS BIGINT) AS n,
         CAST(count(DISTINCT event_type) AS BIGINT) AS nt
  FROM ipf_cells
),
ipf_w0 AS (
  SELECT event_type, variant, n_obs, n, nt,
         CAST({IPF_SCALE} AS BIGINT) AS w
  FROM ipf_cells, ipf_tot
)"""
    ]
    prev = "ipf_w0"
    for i in range(1, rounds + 1):
        ctes.append(
            f"""
ipf_r{i} AS MATERIALIZED (
  SELECT event_type, variant, n_obs, n, nt,
         CAST(w * (n * {IPF_SCALE} // nt)
              // (CAST(sum(w * n_obs) OVER (PARTITION BY event_type)
                  AS BIGINT)) AS BIGINT) AS w
  FROM {prev}
),
ipf_c{i} AS MATERIALIZED (
  SELECT event_type, variant, n_obs, n, nt,
         CAST(w * (n * {IPF_SCALE} // 2)
              // (CAST(sum(w * n_obs) OVER (PARTITION BY variant)
                  AS BIGINT)) AS BIGINT) AS w
  FROM ipf_r{i}
)"""
        )
        prev = f"ipf_c{i}"
    ctes.append(
        f"""
ipf_raking AS (
  SELECT event_type, variant, n_obs, w AS w_mill FROM {prev}
)"""
    )
    return ",".join(ctes)


# ---------------------------------------------------------------------------
# stratified average treatment effect (post-stratification causal readout)
# ---------------------------------------------------------------------------

#: engagement strata (quartiles of the view-count proxy).
ATE_STRATA = 4


def stratified_ate(events: DataFrame) -> DataFrame:
    """Post-stratified average treatment effect: users stratify into
    engagement quartiles (view-count prefix-sum buckets — the
    propensity-proxy blocking step), the arm contrast is estimated
    WITHIN each stratum, and the ATE is the stratum-weighted sum —
    the causal design that removes covariate imbalance a raw
    difference-in-means inherits (here the arms are randomized, so
    this doubles as a balance check: contributions should agree).

    Per-stratum means come from exact BIGINT cent sums; each output
    row carries its weight n_g/N and contribution weight·diff, so
    ATE = Σ ate_contrib is readable off the result. Strata cuts use
    the same DISTINCT-score prefix machinery as the Qini deciles.

    Output per stratum: stratum, n_t, n_c, mean_t, mean_c, diff,
    weight, ate_contrib.
    """
    per_user = events.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "view", 1).otherwise(0)
        ).alias("x"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100, 0).cast("bigint"),
            ).otherwise(0)
        ).alias("r"),
    ).select(
        "x", "r", (F.col("user_id") % 2).cast("int").alias("t")
    )
    per_v = per_user.groupBy("x").agg(F.count("*").alias("c"))
    tot = per_user.agg(F.count("*").alias("n_all"))
    # ascending EXCLUSIVE prefix count via the distributed-rank
    # kernel (inclusive running sum minus own count) — the distinct
    # view-count table is engagement-bounded in practice but
    # data-dependent in principle, so no unpartitioned window here
    # (same conversion as the qini/decile siblings, r4 verdict #6)
    strata = (
        _rank.global_ranked(per_v, [F.asc("x")], sum_cols=["c"])
        .withColumn("p", F.col("_run_c") - F.col("c"))
        .crossJoin(F.broadcast(tot))
        .select(
            "x",
            F.least(
                F.lit(ATE_STRATA - 1),
                (ATE_STRATA * F.col("p")) / F.col("n_all"),
            )
            .cast("int")
            .alias("stratum"),
            "n_all",
        )
    )
    cells = (
        per_user.join(strata, "x")
        .groupBy("stratum")
        .agg(
            F.max("n_all").alias("n_all"),
            F.sum(F.when(F.col("t") == 1, 1).otherwise(0)).alias("n_t"),
            F.sum(F.when(F.col("t") == 0, 1).otherwise(0)).alias("n_c"),
            F.sum(F.when(F.col("t") == 1, F.col("r")).otherwise(0)).alias(
                "s_t"
            ),
            F.sum(F.when(F.col("t") == 0, F.col("r")).otherwise(0)).alias(
                "s_c"
            ),
        )
    )
    mt = F.col("s_t").cast("double") / F.col("n_t").cast("double")
    mc = F.col("s_c").cast("double") / F.col("n_c").cast("double")
    wgt = (F.col("n_t") + F.col("n_c")).cast("double") / F.col(
        "n_all"
    ).cast("double")
    return cells.select(
        "stratum",
        "n_t",
        "n_c",
        F.round(mt, 6).alias("mean_t"),
        F.round(mc, 6).alias("mean_c"),
        F.round(mt - mc, 6).alias("diff"),
        F.round(wgt, 6).alias("weight"),
        F.round(wgt * (mt - mc), 6).alias("ate_contrib"),
    )


ORACLE_STRAT_ATE = f"""
sa_user AS (
  SELECT CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              AS BIGINT) AS x,
         CAST(sum(CASE WHEN event_type = 'purchase'
                       THEN CAST(round(value * 100, 0) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS r,
         CAST(user_id % 2 AS INT) AS t
  FROM events GROUP BY user_id
),
sa_strata AS (
  SELECT x, CAST(least({ATE_STRATA - 1},
                       ({ATE_STRATA} * p) // n_all) AS INT) AS stratum,
         n_all
  FROM (
    SELECT x,
           CAST(coalesce(sum(count(*)) OVER (ORDER BY x
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS p,
           (SELECT count(*) FROM sa_user) AS n_all
    FROM sa_user GROUP BY 1
  )
),
sa_cells AS (
  SELECT s.stratum,
         CAST(max(s.n_all) AS BIGINT) AS n_all,
         CAST(sum(CASE WHEN u.t = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_t,
         CAST(sum(CASE WHEN u.t = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_c,
         CAST(sum(CASE WHEN u.t = 1 THEN u.r ELSE 0 END) AS BIGINT)
           AS s_t,
         CAST(sum(CASE WHEN u.t = 0 THEN u.r ELSE 0 END) AS BIGINT)
           AS s_c
  FROM sa_user u JOIN sa_strata s ON u.x = s.x
  GROUP BY 1
),
stratified_ate AS (
  SELECT stratum, n_t, n_c,
         round(CAST(s_t AS DOUBLE) / CAST(n_t AS DOUBLE), 6)
           AS mean_t,
         round(CAST(s_c AS DOUBLE) / CAST(n_c AS DOUBLE), 6)
           AS mean_c,
         round(CAST(s_t AS DOUBLE) / CAST(n_t AS DOUBLE)
               - CAST(s_c AS DOUBLE) / CAST(n_c AS DOUBLE), 6)
           AS diff,
         round(CAST(n_t + n_c AS DOUBLE) / CAST(n_all AS DOUBLE), 6)
           AS weight,
         round(CAST(n_t + n_c AS DOUBLE) / CAST(n_all AS DOUBLE)
               * (CAST(s_t AS DOUBLE) / CAST(n_t AS DOUBLE)
                  - CAST(s_c AS DOUBLE) / CAST(n_c AS DOUBLE)), 6)
           AS ate_contrib
  FROM sa_cells
)
"""


# ---------------------------------------------------------------------------
# standardized effect size (Cohen's d / Hedges g for the A/B contrast)
# ---------------------------------------------------------------------------


def effect_size_report(events: DataFrame) -> DataFrame:
    """Standardized effect size of the A/B spend contrast — the
    magnitude readout the significance family (Welch z, Mann-Whitney,
    permutation) deliberately doesn't give: Cohen's d on the pooled
    SD, the small-sample Hedges g correction, and the 95% CI of d.
    "Significant but d = 0.02" and "underpowered but d = 0.8" are the
    two decisions this row exists for.

    Per-arm moments are exact BIGINT cents from ONE user-grain agg +
    one 1-row reduction; d/g/CI are a single scalar expression each
    (the n·Σx² − (Σx)² variance identity), so both engines agree to
    the last bit before round(6).

    Output (1 row): n0, n1, mean_diff, cohen_d, hedges_g, d_lo, d_hi.
    """
    per_user = (
        events.filter(F.col("event_type") == AB_METRIC_TYPE)
        .groupBy("user_id")
        .agg(
            F.sum(
                F.round(F.col("value") * 100, 0).cast("bigint")
            ).alias("uc")
        )
        .select(
            "uc", (F.col("user_id") % 2).cast("int").alias("v")
        )
    )
    m = per_user.agg(
        F.sum(F.when(F.col("v") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("v") == 0, F.col("uc")).otherwise(0)).alias(
            "s0"
        ),
        F.sum(
            F.when(F.col("v") == 0, F.col("uc") * F.col("uc")).otherwise(0)
        ).alias("q0"),
        F.sum(F.when(F.col("v") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("v") == 1, F.col("uc")).otherwise(0)).alias(
            "s1"
        ),
        F.sum(
            F.when(F.col("v") == 1, F.col("uc") * F.col("uc")).otherwise(0)
        ).alias("q1"),
    )
    n0, n1 = F.col("n0").cast("double"), F.col("n1").cast("double")
    ss0 = F.col("q0").cast("double") - F.col("s0").cast(
        "double"
    ) * F.col("s0").cast("double") / n0
    ss1 = F.col("q1").cast("double") - F.col("s1").cast(
        "double"
    ) * F.col("s1").cast("double") / n1
    sp = F.sqrt((ss0 + ss1) / (n0 + n1 - 2))
    diff = F.col("s1").cast("double") / n1 - F.col("s0").cast(
        "double"
    ) / n0
    d = diff / sp
    g = d * (1.0 - 3.0 / (4.0 * (n0 + n1) - 9.0))
    se = F.sqrt((n0 + n1) / (n0 * n1) + d * d / (2.0 * (n0 + n1)))
    return m.select(
        "n0",
        "n1",
        F.round(diff, 6).alias("mean_diff"),
        F.round(d, 6).alias("cohen_d"),
        F.round(g, 6).alias("hedges_g"),
        F.round(d - 1.96 * se, 6).alias("d_lo"),
        F.round(d + 1.96 * se, 6).alias("d_hi"),
    )


ORACLE_EFFECT_SIZE = f"""
es_u AS (
  SELECT CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS uc,
         CAST(user_id % 2 AS INT) AS v
  FROM events WHERE event_type = '{AB_METRIC_TYPE}'
  GROUP BY user_id
),
es_m AS (
  SELECT CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         CAST(sum(CASE WHEN v = 0 THEN uc ELSE 0 END) AS BIGINT) AS s0,
         CAST(sum(CASE WHEN v = 0 THEN uc * uc ELSE 0 END) AS BIGINT)
           AS q0,
         CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN v = 1 THEN uc ELSE 0 END) AS BIGINT) AS s1,
         CAST(sum(CASE WHEN v = 1 THEN uc * uc ELSE 0 END) AS BIGINT)
           AS q1
  FROM es_u
),
es_d AS (
  SELECT n0, n1,
         CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
           - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS diff,
         (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
          - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
         / sqrt(((CAST(q0 AS DOUBLE)
                  - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE)
                    / CAST(n0 AS DOUBLE))
                 + (CAST(q1 AS DOUBLE)
                    - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                      / CAST(n1 AS DOUBLE)))
                / (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE) - 2))
           AS d
  FROM es_m
),
effect_size_report AS (
  SELECT n0, n1,
         round(diff, 6) AS mean_diff,
         round(d, 6) AS cohen_d,
         round(d * (1.0 - 3.0 / (4.0 * (CAST(n0 AS DOUBLE)
                                        + CAST(n1 AS DOUBLE)) - 9.0)),
               6) AS hedges_g,
         round(d - 1.96 * sqrt((CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE))
                 / (CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE))
                 + d * d / (2.0 * (CAST(n0 AS DOUBLE)
                                   + CAST(n1 AS DOUBLE)))), 6) AS d_lo,
         round(d + 1.96 * sqrt((CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE))
                 / (CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE))
                 + d * d / (2.0 * (CAST(n0 AS DOUBLE)
                                   + CAST(n1 AS DOUBLE)))), 6) AS d_hi
  FROM es_d
)
"""


# ---------------------------------------------------------------------------
# Hill tail-index estimator (power-law heaviness of the spend tail)
# ---------------------------------------------------------------------------

#: tail fraction (top 1/20 of users by spend).
HILL_TAIL_DIV = 20


def hill_tail_index(events: DataFrame) -> DataFrame:
    """Hill estimator of the spend distribution's power-law tail
    index: over the top ~5% of users by spend, alpha =
    k / Σ ln(x_i / x_min) — the heavy-tail diagnostic behind "is
    revenue Pareto enough that whale outliers are structural, not
    anomalies" (alpha ≤ 2 means infinite variance: cap-based
    anomaly rules will misfire forever). Companion to the Zipf fit
    on term frequencies, pointed at money.

    The tail cut uses the descending DISTINCT-value prefix machinery
    (a straddling tie group joins the tail as a unit; k_eff is
    reported); ln terms are per-user scalars summed over the
    k-bounded tail only.

    Output (1 row): n_users, k_tail, xmin_cents, alpha.
    """
    per_user = (
        events.filter(F.col("event_type") == AB_METRIC_TYPE)
        .groupBy("user_id")
        .agg(
            F.sum(
                F.round(F.col("value") * 100, 0).cast("bigint")
            ).alias("uc")
        )
    )
    per_v = per_user.groupBy("uc").agg(F.count("*").alias("c"))
    tot = per_user.agg(F.count("*").alias("n_all"))
    # distinct spend-cents is effectively user-grain (cent totals are
    # nearly unique), so the descending exclusive prefix comes from
    # the distributed-rank kernel, not an unpartitioned window.
    tail_vals = (
        _rank.global_ranked(per_v, [F.desc("uc")], sum_cols=["c"])
        .withColumn("p", F.col("_run_c") - F.col("c"))
        .crossJoin(F.broadcast(tot))
        .filter(
            F.col("p") < F.expr(f"n_all DIV {HILL_TAIL_DIV}")
        )
        .select("uc", "c", "n_all")
    )
    m = tail_vals.agg(
        F.max("n_all").alias("n_users"),
        F.sum("c").alias("k_tail"),
        F.min("uc").alias("xmin"),
        F.sum(
            F.col("c").cast("double")
            * F.log(F.col("uc").cast("double"))
        ).alias("slnx"),
    )
    alpha = F.col("k_tail").cast("double") / (
        F.col("slnx")
        - F.col("k_tail").cast("double")
        * F.log(F.col("xmin").cast("double"))
    )
    return m.select(
        "n_users",
        "k_tail",
        F.col("xmin").alias("xmin_cents"),
        F.round(alpha, 6).alias("alpha"),
    )


ORACLE_HILL = f"""
hl_u AS (
  SELECT CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS uc
  FROM events WHERE event_type = '{AB_METRIC_TYPE}'
  GROUP BY user_id
),
hl_v AS (
  SELECT uc, CAST(count(*) AS BIGINT) AS c,
         CAST(coalesce(sum(count(*)) OVER (ORDER BY uc DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS p,
         (SELECT count(*) FROM hl_u) AS n_all
  FROM hl_u GROUP BY 1
),
hl_m AS (
  SELECT CAST(max(n_all) AS BIGINT) AS n_users,
         CAST(sum(c) AS BIGINT) AS k_tail,
         CAST(min(uc) AS BIGINT) AS xmin,
         sum(CAST(c AS DOUBLE) * ln(CAST(uc AS DOUBLE))) AS slnx
  FROM hl_v WHERE p < n_all // {HILL_TAIL_DIV}
),
hill_tail_index AS (
  SELECT n_users, k_tail, xmin AS xmin_cents,
         round(CAST(k_tail AS DOUBLE)
               / (slnx - CAST(k_tail AS DOUBLE)
                         * ln(CAST(xmin AS DOUBLE))), 6) AS alpha
  FROM hl_m
)
"""


# ---------------------------------------------------------------------------
# top journey paths (ordered pre-conversion sequences)
# ---------------------------------------------------------------------------

#: path prefix length and output cap.
PATH_PREFIX_LEN = 4
PATH_TOP_N = 20


def top_paths(events: DataFrame) -> DataFrame:
    """Top pre-conversion journey paths: each user's first
    {PATH_PREFIX_LEN} non-purchase event types (in time order, the
    same pre-first-purchase journey the Markov/Shapley attribution
    models read) become a path string, ranked by how many users walk
    it and annotated with its conversion rate — the "Pathfinder"
    readout: WHICH sequences convert, not just which steps.

    One per-user window (the shared sessionization shuffle), one
    user-grain agg building the capped path via sorted collect +
    slice (bounded by the prefix cap, never the event count), one
    path-grain agg, and a deterministic (n_users DESC, path) top-N.

    Output: path, n_users, n_conv, conv_rate — {PATH_TOP_N} rows.
    """
    fp = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(F.expr("unix_micros(ts)")).alias("fp_us"))
    )
    base = (
        events.filter(F.col("event_type") != "purchase")
        .join(fp, "user_id", "left")
        .filter(
            F.col("fp_us").isNull()
            | (F.expr("unix_micros(ts)") < F.col("fp_us"))
        )
        .select(
            "user_id",
            "event_type",
            F.expr("unix_micros(ts)").alias("us"),
            "event_id",
            F.col("fp_us").isNotNull().alias("conv"),
        )
    )
    per_user = base.groupBy("user_id").agg(
        F.concat_ws(
            ">",
            F.slice(
                F.expr(
                    "transform(array_sort(collect_list("
                    "struct(us, event_id, event_type))),"
                    " x -> x.event_type)"
                ),
                1,
                PATH_PREFIX_LEN,
            ),
        ).alias("path"),
        F.max(F.col("conv").cast("int")).alias("conv"),
    )
    paths = per_user.groupBy("path").agg(
        F.count("*").alias("n_users"),
        F.sum("conv").alias("n_conv"),
    )
    return (
        paths.orderBy(F.desc("n_users"), F.asc("path"))
        .limit(PATH_TOP_N)
        .select(
            "path",
            "n_users",
            "n_conv",
            F.round(
                F.col("n_conv") / F.col("n_users").cast("double"), 6
            ).alias("conv_rate"),
        )
    )


top_paths.__doc__ = top_paths.__doc__.format(
    PATH_PREFIX_LEN=PATH_PREFIX_LEN, PATH_TOP_N=PATH_TOP_N
)


ORACLE_TOP_PATHS = f"""
tp_fp AS (
  SELECT user_id, min(epoch_us(ts)) AS fp_us
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
tp_base AS (
  SELECT e.user_id, e.event_type, epoch_us(e.ts) AS us, e.event_id,
         f.fp_us IS NOT NULL AS conv
  FROM events e LEFT JOIN tp_fp f ON e.user_id = f.user_id
  WHERE e.event_type <> 'purchase'
    AND (f.fp_us IS NULL OR epoch_us(e.ts) < f.fp_us)
),
tp_user AS (
  SELECT user_id,
         array_to_string(
           (list(event_type ORDER BY us, event_id))
             [1:{PATH_PREFIX_LEN}], '>') AS path,
         CAST(max(CASE WHEN conv THEN 1 ELSE 0 END) AS INT) AS conv
  FROM tp_base GROUP BY 1
),
tp_paths AS (
  SELECT path, CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(conv) AS BIGINT) AS n_conv
  FROM tp_user GROUP BY 1
),
top_paths AS (
  SELECT path, n_users, n_conv,
         round(n_conv / CAST(n_users AS DOUBLE), 6) AS conv_rate
  FROM tp_paths
  ORDER BY n_users DESC, path
  LIMIT {PATH_TOP_N}
)
"""


# ---------------------------------------------------------------------------
# restricted mean survival time (area under the KM curve)
# ---------------------------------------------------------------------------

#: RMST horizon (days).
RMST_TAU = 21


def rmst_report(events: DataFrame) -> DataFrame:
    """Restricted mean survival time: the area under the Kaplan-Meier
    curve up to τ = {tau} days — "expected days retained within the
    first {tau}", the single-number summary regulators and A/B
    readouts prefer over eyeballing the curve (it is well-defined
    under censoring where the plain mean is not).

    Reuses the KM machinery verbatim (user-grain span agg, ordered
    distinct-duration grain); RMST = Σ S(t_i)·(min(t_{{i+1}},τ) −
    min(t_i,τ)) over the step function with S(0)=1 — one lead()
    window over the bounded duration grain, the ln-sum survival fold
    shared with ``km_survival``.

    Output (1 row): tau, n_users, n_churn_times, rmst_days.
    """
    spans = events.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("d0"),
        F.max(F.to_date("ts")).alias("d1"),
    )
    horizon = events.agg(F.max(F.to_date("ts")).alias("dmax"))
    users = spans.crossJoin(F.broadcast(horizon)).select(
        F.datediff("d1", "d0").alias("t_days"),
        (F.datediff("dmax", "d1") < KM_CENSOR_DAYS).alias("censored"),
    )
    per_t = users.groupBy("t_days").agg(
        F.count("*").alias("n_exit"),
        F.sum(F.when(~F.col("censored"), 1).otherwise(0)).alias(
            "n_churned"
        ),
    )
    w = Window.orderBy("t_days").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wS = Window.orderBy("t_days").rowsBetween(
        Window.unboundedPreceding, 0
    )
    total = users.count()
    curve = (
        per_t.withColumn(
            "n_risk",
            F.lit(total) - F.coalesce(F.sum("n_exit").over(w), F.lit(0)),
        )
        .withColumn(
            "lnterm",
            F.when(
                F.col("n_churned") > 0,
                F.log(
                    F.lit(1.0) - F.col("n_churned") / F.col("n_risk")
                ),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn("s", F.exp(F.sum("lnterm").over(wS)))
        .filter(F.col("n_churned") > 0)
    )
    wl = Window.orderBy("t_days")
    steps = curve.select(
        "t_days",
        "s",
        F.lead("t_days", 1, RMST_TAU).over(wl).alias("t_next"),
        F.first("t_days").over(
            Window.orderBy("t_days").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("t_first"),
    )
    # segment [0, t_first) has S=1; each churn time t contributes
    # S(t)·(min(next,τ) − min(t,τ)).
    seg = steps.select(
        (
            F.col("s")
            * (
                F.least(F.col("t_next"), F.lit(RMST_TAU))
                - F.least(F.col("t_days"), F.lit(RMST_TAU))
            ).cast("double")
        ).alias("area"),
        F.least(F.col("t_first"), F.lit(RMST_TAU)).alias("head"),
    )
    return seg.agg(
        F.lit(RMST_TAU).alias("tau"),
        F.lit(total).cast("bigint").alias("n_users"),
        F.count("*").alias("n_churn_times"),
        F.round(
            F.max("head").cast("double") + F.sum("area"), 6
        ).alias("rmst_days"),
    )


rmst_report.__doc__ = rmst_report.__doc__.format(tau=RMST_TAU)


ORACLE_RMST = f"""
rm_u AS (
  SELECT date_diff('day', d0, d1) AS t_days,
         date_diff('day', d1,
                   (SELECT max(CAST(ts AS DATE)) FROM events))
           < {KM_CENSOR_DAYS} AS censored
  FROM (SELECT user_id, min(CAST(ts AS DATE)) AS d0,
               max(CAST(ts AS DATE)) AS d1
        FROM events GROUP BY 1)
),
rm_t AS (
  SELECT t_days, CAST(count(*) AS BIGINT) AS n_exit,
         CAST(sum(CASE WHEN NOT censored THEN 1 ELSE 0 END) AS BIGINT)
           AS n_churned
  FROM rm_u GROUP BY 1
),
rm_c AS (
  SELECT t_days, n_churned,
         (SELECT count(*) FROM rm_u)
           - COALESCE(sum(n_exit) OVER (ORDER BY t_days
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS n_risk
  FROM rm_t
),
rm_s AS (
  SELECT t_days,
         exp(sum(CASE WHEN n_churned > 0
                      THEN ln(1.0 - n_churned
                              / CAST(n_risk AS DOUBLE))
                      ELSE 0.0 END)
             OVER (ORDER BY t_days
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
           AS s,
         n_churned
  FROM rm_c
),
rm_steps AS (
  SELECT t_days, s,
         lead(t_days, 1, {RMST_TAU}) OVER (ORDER BY t_days) AS t_next,
         min(t_days) OVER () AS t_first
  FROM rm_s WHERE n_churned > 0
),
rmst_report AS (
  SELECT {RMST_TAU} AS tau,
         (SELECT CAST(count(*) AS BIGINT) FROM rm_u) AS n_users,
         CAST(count(*) AS BIGINT) AS n_churn_times,
         round(CAST(max(least(t_first, {RMST_TAU})) AS DOUBLE)
               + sum(s * CAST(least(t_next, {RMST_TAU})
                              - least(t_days, {RMST_TAU}) AS DOUBLE)),
               6) AS rmst_days
  FROM rm_steps
)
"""


# ---------------------------------------------------------------------------
# paired tests: Wilcoxon signed-rank, McNemar, runs test
# ---------------------------------------------------------------------------

#: midpoint split for the paired pre/post design (microseconds).
PAIRED_SPLIT = "2024-01-16"


def wilcoxon_signed_rank(events: DataFrame) -> DataFrame:
    """Wilcoxon signed-rank test on PAIRED per-user spend — first
    half vs second half of the observation window for the SAME user —
    the within-subject companion of the (between-subject)
    Mann-Whitney: pairing removes user-level variance, so it detects
    temporal shifts whales would otherwise drown out. Zero
    differences drop (the standard convention); |d| midranks come
    from the doubled-rank prefix-sum machinery, W+ = Σ ranks of
    positive diffs stays integral (doubled), and z uses the
    tie-corrected normal approximation.

    Output (1 row): n_pairs, w_plus_x2, z, significant.
    """
    per_user = (
        events.filter(F.col("event_type") == AB_METRIC_TYPE)
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.col("ts") < F.lit(PAIRED_SPLIT).cast("timestamp"),
                    F.round(F.col("value") * 100, 0).cast("bigint"),
                ).otherwise(0)
            ).alias("pre"),
            F.sum(
                F.when(
                    F.col("ts") >= F.lit(PAIRED_SPLIT).cast("timestamp"),
                    F.round(F.col("value") * 100, 0).cast("bigint"),
                ).otherwise(0)
            ).alias("post"),
        )
        .select((F.col("post") - F.col("pre")).alias("d"))
        .filter(F.col("d") != 0)
    )
    per_v = per_user.groupBy(F.abs("d").alias("ad")).agg(
        F.sum(F.when(F.col("d") > 0, 1).otherwise(0)).alias("cp"),
        F.sum(F.when(F.col("d") < 0, 1).otherwise(0)).alias("cn"),
    ).withColumn("c", F.col("cp") + F.col("cn")).withColumn(
        "bucket", F.expr("ad DIV 100000")
    )
    btot = per_v.groupBy("bucket").agg(F.sum("c").alias("bc"))
    woff = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = btot.select(
        "bucket",
        F.coalesce(F.sum("bc").over(woff), F.lit(0)).alias("off"),
    )
    win = Window.partitionBy("bucket").orderBy("ad").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = per_v.join(F.broadcast(offsets), "bucket").select(
        "cp",
        "cn",
        "c",
        (
            F.col("off") + F.coalesce(F.sum("c").over(win), F.lit(0))
        ).alias("p"),
    )
    agg = ranked.agg(
        F.sum(F.col("cp") + F.col("cn")).alias("n"),
        F.sum(
            F.col("cp") * (F.lit(2) * F.col("p") + F.col("c") + 1)
        ).alias("wp_x2"),
        F.sum(
            F.col("c") * F.col("c") * F.col("c") - F.col("c")
        ).alias("tie_sum"),
    )
    nd = F.col("n").cast("double")
    mu_x2 = nd * (nd + 1) / 2.0
    var_x4 = nd * (nd + 1) * (2 * nd + 1) / 6.0 - F.col(
        "tie_sum"
    ).cast("double") / 12.0
    z = (F.col("wp_x2").cast("double") - mu_x2) / F.sqrt(var_x4)
    return agg.select(
        F.col("n").alias("n_pairs"),
        F.col("wp_x2").alias("w_plus_x2"),
        F.round(z, 6).alias("z"),
        (F.abs(F.round(z, 6)) > 1.96).alias("significant"),
    )


ORACLE_WILCOXON = f"""
wx_u AS (
  SELECT CAST(sum(CASE WHEN ts < TIMESTAMP '{PAIRED_SPLIT}'
                       THEN CAST(round(value * 100, 0) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS pre,
         CAST(sum(CASE WHEN ts >= TIMESTAMP '{PAIRED_SPLIT}'
                       THEN CAST(round(value * 100, 0) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS post
  FROM events WHERE event_type = '{AB_METRIC_TYPE}'
  GROUP BY user_id
),
wx_d AS (
  SELECT post - pre AS d FROM wx_u WHERE post - pre <> 0
),
wx_v AS (
  SELECT abs(d) AS ad,
         CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS cp,
         CAST(sum(CASE WHEN d < 0 THEN 1 ELSE 0 END) AS BIGINT) AS cn,
         CAST(count(*) AS BIGINT) AS c
  FROM wx_d GROUP BY 1
),
wx_r AS (
  SELECT cp, cn, c,
         CAST(coalesce(sum(c) OVER (ORDER BY ad
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS p
  FROM wx_v
),
wx_a AS (
  SELECT CAST(sum(cp + cn) AS BIGINT) AS n,
         CAST(sum(cp * (2 * p + c + 1)) AS BIGINT) AS wp_x2,
         CAST(sum(c * c * c - c) AS BIGINT) AS tie_sum
  FROM wx_r
),
wilcoxon_signed_rank AS (
  SELECT n AS n_pairs, wp_x2 AS w_plus_x2,
         round((CAST(wp_x2 AS DOUBLE)
                - CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1) / 2.0)
               / sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1)
                      * (2 * CAST(n AS DOUBLE) + 1) / 6.0
                      - CAST(tie_sum AS DOUBLE) / 12.0), 6) AS z,
         abs(round((CAST(wp_x2 AS DOUBLE)
                - CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1) / 2.0)
               / sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1)
                      * (2 * CAST(n AS DOUBLE) + 1) / 6.0
                      - CAST(tie_sum AS DOUBLE) / 12.0), 6)) > 1.96
           AS significant
  FROM wx_a
)
"""


def mcnemar_test(events: DataFrame) -> DataFrame:
    """McNemar test on paired binary outcomes: did each user purchase
    in the first half vs the second half of the window — the paired
    2×2 where only the DISCORDANT cells carry information:
    χ² = (b − c)²/(b + c) with 1 df. The binary sibling of the
    Wilcoxon pre/post design; one user-grain agg + one 4-cell
    reduction, everything integral until the final ratio.

    Output (1 row): n_both, pre_only, post_only, n_neither, chi2,
    significant.
    """
    flags = events.groupBy("user_id").agg(
        F.max(
            (
                (F.col("event_type") == "purchase")
                & (F.col("ts") < F.lit(PAIRED_SPLIT).cast("timestamp"))
            ).cast("int")
        ).alias("pre"),
        F.max(
            (
                (F.col("event_type") == "purchase")
                & (F.col("ts") >= F.lit(PAIRED_SPLIT).cast("timestamp"))
            ).cast("int")
        ).alias("post"),
    )
    cells = flags.agg(
        F.sum(
            ((F.col("pre") == 1) & (F.col("post") == 1)).cast("int")
        ).alias("n_both"),
        F.sum(
            ((F.col("pre") == 1) & (F.col("post") == 0)).cast("int")
        ).alias("pre_only"),
        F.sum(
            ((F.col("pre") == 0) & (F.col("post") == 1)).cast("int")
        ).alias("post_only"),
        F.sum(
            ((F.col("pre") == 0) & (F.col("post") == 0)).cast("int")
        ).alias("n_neither"),
    )
    b, c = F.col("pre_only"), F.col("post_only")
    chi2 = ((b - c) * (b - c)).cast("double") / (b + c).cast("double")
    return cells.select(
        "n_both",
        "pre_only",
        "post_only",
        "n_neither",
        F.round(chi2, 6).alias("chi2"),
        (F.round(chi2, 6) > 3.841).alias("significant"),
    )


ORACLE_MCNEMAR = f"""
mn_u AS (
  SELECT CAST(max(CASE WHEN event_type = 'purchase'
                        AND ts < TIMESTAMP '{PAIRED_SPLIT}'
                       THEN 1 ELSE 0 END) AS INT) AS pre,
         CAST(max(CASE WHEN event_type = 'purchase'
                        AND ts >= TIMESTAMP '{PAIRED_SPLIT}'
                       THEN 1 ELSE 0 END) AS INT) AS post
  FROM events GROUP BY user_id
),
mn_c AS (
  SELECT CAST(sum(CASE WHEN pre = 1 AND post = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_both,
         CAST(sum(CASE WHEN pre = 1 AND post = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS pre_only,
         CAST(sum(CASE WHEN pre = 0 AND post = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS post_only,
         CAST(sum(CASE WHEN pre = 0 AND post = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_neither
  FROM mn_u
),
mcnemar_test AS (
  SELECT n_both, pre_only, post_only, n_neither,
         round(CAST((pre_only - post_only) * (pre_only - post_only)
                    AS DOUBLE)
               / CAST(pre_only + post_only AS DOUBLE), 6) AS chi2,
         round(CAST((pre_only - post_only) * (pre_only - post_only)
                    AS DOUBLE)
               / CAST(pre_only + post_only AS DOUBLE), 6) > 3.841
           AS significant
  FROM mn_c
)
"""


def runs_test(events: DataFrame) -> DataFrame:
    """Wald-Wolfowitz runs test for randomness of the daily revenue
    direction: the up/down sign sequence vs its own median-free
    expectation — too FEW runs means momentum/trend, too many means
    oscillation; either breaks the i.i.d. assumption the forecasting
    family quietly makes, so this is their admission test.

    Day-grain: signs from lag() on the ordered bounded series, runs
    counted as sign-change prefix events, mean/variance of the run
    count from the exact (n_up, n_down) integers.

    Output (1 row): n_days, n_up, n_down, n_runs, z, significant.
    """
    daily = (
        events.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100, 0).cast("bigint"),
                ).otherwise(0)
            ).alias("rev")
        )
    )
    w = Window.orderBy("day")
    # runs = 1 + number of sign changes over the day-ordered signs.
    seq = (
        daily.select(
            "day", (F.col("rev") - F.lag("rev").over(w)).alias("d")
        )
        .filter(F.col("d").isNotNull() & (F.col("d") != 0))
        .select("day", (F.col("d") > 0).cast("int").alias("s"))
    )
    wd = Window.orderBy("day")
    runs = seq.select(
        "s",
        (
            F.col("s") != F.coalesce(F.lag("s").over(wd), F.col("s"))
        ).cast("int").alias("chg"),
    )
    m = runs.agg(
        F.count("*").alias("n"),
        F.sum("s").alias("n_up"),
        F.sum(F.lit(1) - F.col("s")).alias("n_down"),
        (F.sum("chg") + 1).alias("n_runs"),
    )
    nu = F.col("n_up").cast("double")
    nd2 = F.col("n_down").cast("double")
    ntot = nu + nd2
    mu = 2 * nu * nd2 / ntot + 1
    var = (
        (2 * nu * nd2 * (2 * nu * nd2 - ntot))
        / (ntot * ntot * (ntot - 1))
    )
    z = (F.col("n_runs").cast("double") - mu) / F.sqrt(var)
    return m.select(
        F.col("n").alias("n_days"),
        "n_up",
        "n_down",
        "n_runs",
        F.round(z, 6).alias("z"),
        (F.abs(F.round(z, 6)) > 1.96).alias("significant"),
    )


ORACLE_RUNS = """
rn_daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(sum(CASE WHEN event_type = 'purchase'
                       THEN CAST(round(value * 100, 0) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS rev
  FROM events GROUP BY 1
),
rn_seq AS (
  SELECT day, CAST(d > 0 AS INT) AS s FROM (
    SELECT day, rev - lag(rev) OVER (ORDER BY day) AS d FROM rn_daily
  ) WHERE d IS NOT NULL AND d <> 0
),
rn_runs AS (
  SELECT s,
         CAST(s <> coalesce(lag(s) OVER (ORDER BY day), s) AS INT)
           AS chg
  FROM rn_seq
),
rn_m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(s) AS BIGINT) AS n_up,
         CAST(sum(1 - s) AS BIGINT) AS n_down,
         CAST(sum(chg) + 1 AS BIGINT) AS n_runs
  FROM rn_runs
),
runs_test AS (
  SELECT n AS n_days, n_up, n_down, n_runs,
         round((CAST(n_runs AS DOUBLE)
                - (2 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)
                   / (CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE))
                   + 1))
               / sqrt((2 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)
                       * (2 * CAST(n_up AS DOUBLE)
                          * CAST(n_down AS DOUBLE)
                          - (CAST(n_up AS DOUBLE)
                             + CAST(n_down AS DOUBLE))))
                      / ((CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE))
                         * (CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE))
                         * (CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE)
                            - 1))), 6) AS z,
         abs(round((CAST(n_runs AS DOUBLE)
                - (2 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)
                   / (CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE))
                   + 1))
               / sqrt((2 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)
                       * (2 * CAST(n_up AS DOUBLE)
                          * CAST(n_down AS DOUBLE)
                          - (CAST(n_up AS DOUBLE)
                             + CAST(n_down AS DOUBLE))))
                      / ((CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE))
                         * (CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE))
                         * (CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE)
                            - 1))), 6)) > 1.96 AS significant
  FROM rn_m
)
"""


# ---------------------------------------------------------------------------
# variance-homogeneity screen (Hartley's Fmax across event types)
# ---------------------------------------------------------------------------


def variance_ratio_screen(events: DataFrame) -> DataFrame:
    """Hartley's Fmax homogeneity-of-variance screen across the event
    types: max group variance / min group variance — the assumption
    check ANOVA (``events_anova``) quietly requires; Fmax >> 1 says
    use Welch-style corrections instead. Per-group variances come
    from the n·Σx² − (Σx)² identity on exact BIGINT cents (one
    map-combinable agg); the ratio picks max/min via greatest/least
    over the k=5 group rows packed into one 1-row reduction.

    Output per group + ratio columns: event_type, n, variance; the
    f_max and n_groups columns repeat on every row (grain-preserving
    so both the per-group audit AND the verdict are one readout).
    """
    g = (
        events.select(
            "event_type",
            F.round(F.col("value") * 100, 0).cast("bigint").alias("c"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("c").alias("s"),
            F.sum(F.col("c") * F.col("c")).alias("q"),
        )
    )
    nd = F.col("n").cast("double")
    var = (
        nd * F.col("q").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double")
    ) / (nd * (nd - 1))
    gv = g.select("event_type", "n", F.round(var, 4).alias("variance"))
    ext = gv.agg(
        F.max("variance").alias("vmax"),
        F.min("variance").alias("vmin"),
        F.count("*").alias("n_groups"),
    )
    return gv.crossJoin(F.broadcast(ext)).select(
        "event_type",
        "n",
        "variance",
        "n_groups",
        F.round(F.col("vmax") / F.col("vmin"), 6).alias("f_max"),
    )


ORACLE_VARRATIO = """
vr_g AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         round((CAST(count(*) AS DOUBLE) * CAST(sum(c * c) AS DOUBLE)
                - CAST(sum(c) AS DOUBLE) * CAST(sum(c) AS DOUBLE))
               / (CAST(count(*) AS DOUBLE)
                  * (CAST(count(*) AS DOUBLE) - 1)), 4) AS variance
  FROM (
    SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS c
    FROM events
  ) GROUP BY 1
),
vr_e AS (
  SELECT max(variance) AS vmax, min(variance) AS vmin,
         CAST(count(*) AS BIGINT) AS n_groups
  FROM vr_g
),
variance_ratio_screen AS (
  SELECT g.event_type, g.n, g.variance, e.n_groups,
         round(e.vmax / e.vmin, 6) AS f_max
  FROM vr_g g, vr_e e
)
"""


# ---------------------------------------------------------------------------
# newsvendor stock levels (critical-fractile empirical quantile)
# ---------------------------------------------------------------------------

#: critical ratio cu/(cu+co) as an exact fraction (3/4: underage
#: costs 3x overage).
NV_CR_NUM, NV_CR_DEN = 3, 4
#: minimum demand days for a product to be stocked by model.
NV_MIN_DAYS = 5


def newsvendor_stock(lineitem: DataFrame) -> DataFrame:
    """Newsvendor optimal stock per product: the smallest stock level
    q with empirical demand CDF F(q) >= cu/(cu+co) — the classic
    single-period inventory rule, solved on the exact per-product
    demand-day distribution (days with demand; the intermittency
    correction is Croston's job one query over). The quantile pick is
    integer cross-multiplication (cum·DEN >= NUM·n), so no float
    touches the decision; achieved service level is reported beside
    the target.

    One (product, day) hash-agg, per-product prefix sums over the
    DISTINCT demand-value grain (bounded by a product's demand-day
    count), one filtered argmin via the min-over-qualifying trick.

    Output per product: product, n_days, stock_q, service_level.
    """
    dd = (
        lineitem.groupBy(
            F.col("l_partkey").alias("product"),
            F.to_date("l_shipdate").alias("day"),
        )
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("q"))
    )
    per_v = dd.groupBy("product", "q").agg(F.count("*").alias("c"))
    wv = Window.partitionBy("product").orderBy("q").rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = dd.groupBy("product").agg(F.count("*").alias("n_days"))
    cum = (
        per_v.withColumn("cum", F.sum("c").over(wv))
        .join(tot, "product")
        .filter(F.col("n_days") >= NV_MIN_DAYS)
    )
    qualifying = cum.filter(
        F.col("cum") * NV_CR_DEN >= NV_CR_NUM * F.col("n_days")
    )
    pick = qualifying.groupBy("product").agg(
        F.max("n_days").alias("n_days"),
        F.min("q").alias("stock_q"),
    )
    achieved = cum.select(
        F.col("product").alias("p2"),
        F.col("q").alias("q2"),
        "cum",
    )
    return (
        pick.join(
            achieved,
            (pick.product == achieved.p2)
            & (pick.stock_q == achieved.q2),
        )
        .select(
            "product",
            "n_days",
            "stock_q",
            F.round(
                F.col("cum") / F.col("n_days").cast("double"), 6
            ).alias("service_level"),
        )
    )


ORACLE_NEWSVENDOR = f"""
nv_dd AS (
  SELECT l_partkey AS product, CAST(l_shipdate AS DATE) AS day,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
  FROM lineitem GROUP BY 1, 2
),
nv_v AS (
  SELECT product, q, CAST(count(*) AS BIGINT) AS c
  FROM nv_dd GROUP BY 1, 2
),
nv_cum AS (
  SELECT v.product, v.q,
         CAST(sum(v.c) OVER (PARTITION BY v.product ORDER BY v.q
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum,
         t.n_days
  FROM nv_v v
  JOIN (SELECT product, CAST(count(*) AS BIGINT) AS n_days
        FROM nv_dd GROUP BY 1) t USING (product)
  WHERE t.n_days >= {NV_MIN_DAYS}
),
nv_pick AS (
  SELECT product, max(n_days) AS n_days, min(q) AS stock_q
  FROM nv_cum
  WHERE cum * {NV_CR_DEN} >= {NV_CR_NUM} * n_days
  GROUP BY 1
),
newsvendor_stock AS (
  SELECT p.product, p.n_days, p.stock_q,
         round(c.cum / CAST(p.n_days AS DOUBLE), 6) AS service_level
  FROM nv_pick p
  JOIN nv_cum c ON p.product = c.product AND p.stock_q = c.q
)
"""


# ---------------------------------------------------------------------------
# order service level (fill rate + p90 lead time per month)
# ---------------------------------------------------------------------------

#: on-time threshold (days from order to line ship).
SL_ON_TIME_DAYS = 30


def service_level_report(
    orders: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """Monthly order-line service level: fill rate (share of lines
    shipped within {d} days of the order date) and the p90 lead time
    — the fulfillment SLA readout beside the backlog curve. The p90
    is an exact empirical quantile via per-month prefix sums on the
    DISTINCT lead-day grain with an integer cross-multiplied cut
    (cum·10 >= 9·n) — no float, no global sort.

    Output per month: month, n_lines, fill_rate, p90_lead_days.
    """
    lines = lineitem.join(
        orders.select(
            F.col("o_orderkey").alias("l_orderkey"),
            F.to_date("o_orderdate").alias("od"),
        ),
        "l_orderkey",
    ).select(
        (F.year("od") * 100 + F.month("od")).alias("month"),
        F.datediff(F.to_date("l_shipdate"), F.col("od")).alias("lead"),
    )
    per_v = lines.groupBy("month", "lead").agg(
        F.count("*").alias("c")
    )
    wv = Window.partitionBy("month").orderBy("lead").rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = lines.groupBy("month").agg(
        F.count("*").alias("n_lines"),
        F.sum(
            (F.col("lead") <= SL_ON_TIME_DAYS).cast("int")
        ).alias("on_time"),
    )
    cum = per_v.withColumn("cum", F.sum("c").over(wv)).join(
        tot, "month"
    )
    p90 = (
        cum.filter(F.col("cum") * 10 >= 9 * F.col("n_lines"))
        .groupBy("month")
        .agg(F.min("lead").alias("p90_lead_days"))
    )
    return (
        tot.join(p90, "month")
        .select(
            "month",
            "n_lines",
            F.round(
                F.col("on_time") / F.col("n_lines").cast("double"), 6
            ).alias("fill_rate"),
            "p90_lead_days",
        )
    )


service_level_report.__doc__ = service_level_report.__doc__.format(
    d=SL_ON_TIME_DAYS
)


ORACLE_SERVICE_LEVEL = f"""
sl_lines AS (
  SELECT date_part('year', CAST(o.o_orderdate AS DATE)) * 100
         + date_part('month', CAST(o.o_orderdate AS DATE)) AS month,
         date_diff('day', CAST(o.o_orderdate AS DATE),
                   CAST(l.l_shipdate AS DATE)) AS lead
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
sl_v AS (
  SELECT month, lead, CAST(count(*) AS BIGINT) AS c
  FROM sl_lines GROUP BY 1, 2
),
sl_tot AS (
  SELECT month, CAST(count(*) AS BIGINT) AS n_lines,
         CAST(sum(CASE WHEN lead <= {SL_ON_TIME_DAYS} THEN 1 ELSE 0 END)
              AS BIGINT) AS on_time
  FROM sl_lines GROUP BY 1
),
sl_cum AS (
  SELECT v.month, v.lead,
         CAST(sum(v.c) OVER (PARTITION BY v.month ORDER BY v.lead
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum,
         t.n_lines
  FROM sl_v v JOIN sl_tot t USING (month)
),
sl_p90 AS (
  SELECT month, CAST(min(lead) AS BIGINT) AS p90_lead_days
  FROM sl_cum WHERE cum * 10 >= 9 * n_lines
  GROUP BY 1
),
service_level_report AS (
  SELECT t.month, t.n_lines,
         round(t.on_time / CAST(t.n_lines AS DOUBLE), 6) AS fill_rate,
         p.p90_lead_days
  FROM sl_tot t JOIN sl_p90 p USING (month)
)
"""


# ---------------------------------------------------------------------------
# Erlang-B blocking curve (exact integer recursion)
# ---------------------------------------------------------------------------

#: staffing grid: blocking probability for 1..S servers at the
#: corpus-derived offered load. 12 servers x the A cap below keeps
#: every intermediate within DECIMAL(38,0)/HUGEINT (see envelope in
#: the docstring).
ERLANG_MAX_SERVERS = 12
#: offered-load cap (erlangs): above this, blocking at <= 12 servers
#: is ~1 anyway and a^s would overflow 38 digits; the output carries
#: a `capped` flag so a reader knows the curve saturated.
ERLANG_A_CAP = 400
#: blocking probability in integer millionths (the HITS/PageRank
#: fixed-point convention).
ERLANG_SCALE = 1_000_000


def erlang_blocking_curve(orders: DataFrame) -> DataFrame:
    """Erlang-B staffing curve: blocking probability B(s, a) for
    s = 1..{S} servers at the data-derived offered load a (mean
    orders per hour, 1-hour mean handle time — the M/M/s/s loss
    model's "how many parallel agents do we staff so arrivals aren't
    turned away"). The last "doable" entry on the deferred idea
    ledger (r5 verdict #6).

    EXACT INTEGER recursion — no float touches any value: with
    J(s) = 1/B(s,a) * a^s, the Erlang-B recurrence
    B(s) = a*B(s-1) / (s + a*B(s-1)) becomes the integer recursion
        J(0) = 1;  J(s) = a^s + s * J(s-1)
    (equivalently J(s) = sum_k a^k * s!/k!), carried in
    DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) on a 1-row frame,
    unrolled {S} levels exactly like PageRank/BFS/PACF. The output
    blocking_ppm = (a^s * 1e6) div J(s) is one exact integer
    division (the changepoint divmod split), so the whole curve
    hash-matches by construction.

    Overflow envelope: a <= {CAP} (capped, flagged) and s <= {S}
    give a^s * 1e6 <= 400^12 * 1e6 ~ 1.7e37 < 1e38, and
    J(s) <= max(a^s * e, s! * e^a) stays under 1e38 for the same
    range (a >= s: J ~ a^s * (1 + s/a + ...); a < s <= 12:
    J <= 12! * e^12 ~ 7.8e13).

    Scale: ONE global count-agg over orders (n_orders, n_days) —
    the only corpus-sized stage; the recursion is driver-free column
    algebra on the broadcast 1-row load. Output per s: servers,
    offered_load, capped, blocking_ppm.
    """
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    tot = orders.agg(
        F.count("*").alias("n"),
        F.countDistinct(F.to_date("o_orderdate")).alias("days"),
    )
    base = tot.select(
        F.expr(
            f"least((n + days * 24 - 1) div (days * 24),"
            f" cast({ERLANG_A_CAP} as bigint))"
        ).alias("a_int"),
        F.expr(
            f"cast((n + days * 24 - 1) div (days * 24)"
            f" > {ERLANG_A_CAP} as int)"
        ).alias("capped"),
    ).select(
        "a_int",
        "capped",
        dec(F.col("a_int")).alias("a"),
        dec(F.lit(1)).alias("ap"),
        dec(F.lit(1)).alias("j"),
    )
    levels = []
    cur = base
    for s in range(1, ERLANG_MAX_SERVERS + 1):
        cur = cur.select(
            "a_int",
            "capped",
            "a",
            (F.col("ap") * F.col("a")).alias("ap"),
            (
                F.col("ap") * F.col("a") + F.lit(s) * F.col("j")
            ).alias("j"),
        )
        levels.append(
            cur.select(
                F.lit(s).alias("servers"),
                F.col("a_int").alias("offered_load"),
                "capped",
                "ap",
                "j",
            )
        )
    allv = levels[0]
    for fr in levels[1:]:
        allv = allv.unionByName(fr)
    num = F.col("ap") * F.lit(ERLANG_SCALE).cast("decimal(38,0)")
    return allv.select(
        "servers",
        "offered_load",
        "capped",
        ((num - num % F.col("j")) / F.col("j"))
        .cast("bigint")
        .alias("blocking_ppm"),
    )


erlang_blocking_curve.__doc__ = erlang_blocking_curve.__doc__.format(
    S=ERLANG_MAX_SERVERS, CAP=ERLANG_A_CAP
)


def oracle_erlang_blocking(
    max_servers: int = ERLANG_MAX_SERVERS,
    cap: int = ERLANG_A_CAP,
    scale: int = ERLANG_SCALE,
) -> str:
    ctes = [
        """
eb_tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(count(DISTINCT CAST(o_orderdate AS DATE)) AS BIGINT)
           AS days
  FROM orders
)""",
        f"""
eb_0 AS (
  SELECT least((n + days * 24 - 1) // (days * 24),
               CAST({cap} AS BIGINT)) AS a_int,
         CAST((n + days * 24 - 1) // (days * 24) > {cap} AS INT)
           AS capped,
         CAST(least((n + days * 24 - 1) // (days * 24),
                    CAST({cap} AS BIGINT)) AS HUGEINT) AS a,
         CAST(1 AS HUGEINT) AS ap,
         CAST(1 AS HUGEINT) AS j
  FROM eb_tot
)""",
    ]
    for s in range(1, max_servers + 1):
        ctes.append(
            f"""
eb_{s} AS (
  SELECT a_int, capped, a, ap * a AS ap, ap * a + {s} * j AS j
  FROM eb_{s - 1}
)"""
        )
    arms = "\n  UNION ALL\n".join(
        f"  SELECT CAST({s} AS INT) AS servers,"
        f" a_int AS offered_load, capped,"
        f" CAST((ap * {scale}) // j AS BIGINT) AS blocking_ppm"
        f" FROM eb_{s}"
        for s in range(1, max_servers + 1)
    )
    ctes.append(f"""
erlang_blocking AS (
{arms}
)""")
    return ",".join(ctes)


# ---------------------------------------------------------------------------
# cohort LTV curves (cumulative revenue per signup cohort)
# ---------------------------------------------------------------------------


def cohort_ltv(events: DataFrame) -> DataFrame:
    """Cohort lifetime-value curves: users grouped by first-seen WEEK,
    purchase revenue accumulated by week offset — the revenue sibling
    of `retention_cohorts` (how much each vintage has SPENT by week w,
    normalized per cohort member). The payback question ("when does a
    cohort's cumulative LTV cross acquisition cost") reads straight
    off cum_ltv_per_user.

    One user-grain first-seen agg, one (cohort, offset) cent agg, and
    a cumulative window PARTITIONED by cohort over the bounded
    week-offset grain. Revenue is exact BIGINT cents; the per-user
    normalization divides once per grid row.

    Output: cohort_week, offset_w, cohort_size, rev_cents,
    cum_rev_cents, cum_ltv_per_user.
    """
    firsts = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cw")
    )
    sizes = firsts.groupBy("cw").agg(
        F.count("*").alias("cohort_size")
    )
    rev = (
        events.filter(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .select(
            "cw",
            F.floor(
                F.datediff(F.to_date("ts"), F.col("cw")) / 7
            ).cast("int").alias("offset_w"),
            F.round(F.col("value") * 100, 0).cast("bigint").alias("c"),
        )
        .groupBy("cw", "offset_w")
        .agg(F.sum("c").alias("rev_cents"))
    )
    wc = Window.partitionBy("cw").orderBy("offset_w").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        rev.withColumn("cum_rev_cents", F.sum("rev_cents").over(wc))
        .join(sizes, "cw")
        .select(
            F.col("cw").alias("cohort_week"),
            "offset_w",
            "cohort_size",
            "rev_cents",
            "cum_rev_cents",
            F.round(
                F.col("cum_rev_cents")
                / (F.lit(100.0) * F.col("cohort_size")),
                6,
            ).alias("cum_ltv_per_user"),
        )
    )


ORACLE_COHORT_LTV = """
cl_first AS (
  SELECT user_id,
         CAST(date_trunc('week', min(ts)) AS DATE) AS cw
  FROM events GROUP BY 1
),
cl_sizes AS (
  SELECT cw, CAST(count(*) AS BIGINT) AS cohort_size
  FROM cl_first GROUP BY 1
),
cl_rev AS (
  SELECT f.cw,
         CAST(date_diff('day', f.cw, CAST(e.ts AS DATE)) // 7 AS INT)
           AS offset_w,
         CAST(sum(CAST(round(e.value * 100, 0) AS BIGINT)) AS BIGINT)
           AS rev_cents
  FROM events e JOIN cl_first f ON e.user_id = f.user_id
  WHERE e.event_type = 'purchase'
  GROUP BY 1, 2
),
cohort_ltv AS (
  SELECT r.cw AS cohort_week, r.offset_w, s.cohort_size, r.rev_cents,
         CAST(sum(r.rev_cents) OVER (PARTITION BY r.cw
              ORDER BY r.offset_w
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum_rev_cents,
         round(CAST(sum(r.rev_cents) OVER (PARTITION BY r.cw
                   ORDER BY r.offset_w
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT)
               / (CAST(100.0 AS DOUBLE) * s.cohort_size), 6)
           AS cum_ltv_per_user
  FROM cl_rev r JOIN cl_sizes s USING (cw)
)
"""


# ---------------------------------------------------------------------------
# peak detection on the daily revenue series (windowed prominence)
# ---------------------------------------------------------------------------

#: half-window (days) for the prominence baseline.
PEAK_WINDOW_DAYS = 7


def revenue_peaks(events: DataFrame) -> DataFrame:
    """Peak detection on daily revenue: a day is a peak when it beats
    both neighbors, and its PROMINENCE is how far it rises above the
    higher of the two window-side minima (±{w} days) — the signal
    statistic that separates a real demand spike from ripple, beside
    the CUSUM/Hampel change detectors. All arithmetic is integer
    cents; the major-peak flag is cross-multiplied (5·prom >= rev, a
    20% prominence bar), so the readout is engine-exact.

    Day-grain windows only (lag/lead + two sliding mins over the
    bounded series).

    Output per peak: day, rev_cents, prom_cents, is_major.
    """
    daily = (
        events.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100, 0).cast("bigint"),
                ).otherwise(0)
            ).alias("rev")
        )
    )
    w = Window.orderBy("day")
    wl = Window.orderBy("day").rowsBetween(-PEAK_WINDOW_DAYS, -1)
    wr = Window.orderBy("day").rowsBetween(1, PEAK_WINDOW_DAYS)
    marked = daily.select(
        "day",
        "rev",
        F.lag("rev").over(w).alias("prev"),
        F.lead("rev").over(w).alias("nxt"),
        F.min("rev").over(wl).alias("lmin"),
        F.min("rev").over(wr).alias("rmin"),
    ).filter(
        F.col("prev").isNotNull()
        & F.col("nxt").isNotNull()
        & (F.col("rev") > F.col("prev"))
        & (F.col("rev") > F.col("nxt"))
    )
    prom = F.col("rev") - F.greatest("lmin", "rmin")
    return marked.select(
        "day",
        F.col("rev").alias("rev_cents"),
        prom.alias("prom_cents"),
        (F.lit(5) * prom >= F.col("rev")).cast("int").alias("is_major"),
    )


revenue_peaks.__doc__ = revenue_peaks.__doc__.format(
    w=PEAK_WINDOW_DAYS
)


ORACLE_PEAKS = f"""
pk_daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(sum(CASE WHEN event_type = 'purchase'
                       THEN CAST(round(value * 100, 0) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS rev
  FROM events GROUP BY 1
),
pk_m AS (
  SELECT day, rev,
         lag(rev) OVER w AS prev, lead(rev) OVER w AS nxt,
         min(rev) OVER (ORDER BY day
             ROWS BETWEEN {PEAK_WINDOW_DAYS} PRECEDING
             AND 1 PRECEDING) AS lmin,
         min(rev) OVER (ORDER BY day
             ROWS BETWEEN 1 FOLLOWING
             AND {PEAK_WINDOW_DAYS} FOLLOWING) AS rmin
  FROM pk_daily
  WINDOW w AS (ORDER BY day)
),
revenue_peaks AS (
  SELECT day, rev AS rev_cents,
         rev - greatest(lmin, rmin) AS prom_cents,
         CAST(5 * (rev - greatest(lmin, rmin)) >= rev AS INT)
           AS is_major
  FROM pk_m
  WHERE prev IS NOT NULL AND nxt IS NOT NULL
    AND rev > prev AND rev > nxt
)
"""


# ---------------------------------------------------------------------------
# approximate-percentile accuracy check (rank-error contract)
# ---------------------------------------------------------------------------

#: approx_percentile accuracy knob (rank error <= 1/accuracy).
APPROX_PCTL_ACCURACY = 1000
#: declared rank-error budget (5x headroom over 1/accuracy), percent.
APPROX_PCTL_RANK_TOL_PCT = 0.5


def approx_quantile_check(events: DataFrame) -> DataFrame:
    """Approximate-percentile accuracy contract, the quantile sibling
    of ``events_approx_distinct``: Spark's approx_percentile (the
    mergeable KLL/GK-family sketch you can afford at 100 TB) has a
    RANK-error guarantee, not a value guarantee — so the check
    computes the exact CDF position of the sketch's median answer and
    asserts it sits within the declared rank budget of 0.5. The
    sketch value itself is engine-specific (DuckDB's sketch differs),
    so the differential contract is exact-side + the flag: estimator
    drift past budget hash-mismatches.

    One sketch agg per type + one conditional recount against the
    broadcast answers — both map-side-combinable.

    Output per type: event_type, n, p50_exact, rank_tol_pct,
    within_bound.
    """
    approx = events.groupBy("event_type").agg(
        F.expr(
            f"approx_percentile(value, 0.5, {APPROX_PCTL_ACCURACY})"
        ).alias("p50_approx"),
        F.expr("percentile(value, 0.5)").alias("p50_exact"),
        F.count("*").alias("n"),
    )
    pos = (
        events.join(
            F.broadcast(
                approx.select("event_type", "p50_approx")
            ),
            "event_type",
        )
        .groupBy("event_type")
        .agg(
            F.sum(
                (F.col("value") <= F.col("p50_approx")).cast("int")
            ).alias("n_le")
        )
    )
    rank_err = F.abs(
        F.col("n_le").cast("double") / F.col("n").cast("double") - 0.5
    )
    return (
        approx.join(pos, "event_type")
        .select(
            "event_type",
            "n",
            F.round("p50_exact", 6).alias("p50_exact"),
            F.lit(APPROX_PCTL_RANK_TOL_PCT).alias("rank_tol_pct"),
            (rank_err * 100 <= APPROX_PCTL_RANK_TOL_PCT).alias(
                "within_bound"
            ),
        )
    )


ORACLE_APPROX_PCTL = f"""
events_approx_quantile AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         round(quantile_cont(value, 0.5), 6) AS p50_exact,
         {APPROX_PCTL_RANK_TOL_PCT} AS rank_tol_pct,
         TRUE AS within_bound
  FROM events
  GROUP BY 1
)
"""


# ---------------------------------------------------------------------------
# DAU/MAU stickiness (monthly engagement ratio)
# ---------------------------------------------------------------------------


def stickiness_report(events: DataFrame) -> DataFrame:
    """Monthly DAU/MAU stickiness: average daily active users divided
    by monthly actives — "of the users who show up at all, how many
    show up daily", the engagement ratio product teams track beside
    the rolling-DAU curve. avg DAU is the exact rational Σ(daily
    distinct)/n_days, so the only division is the final rounded one.

    Two distinct-user aggs ((month, day) and month grain — both
    map-side combinable) + one month-grain join.

    Output per month: month, n_days, mau, avg_dau, stickiness.
    """
    md = events.select(
        (F.year(F.to_date("ts")) * 100 + F.month(F.to_date("ts"))).alias(
            "month"
        ),
        F.to_date("ts").alias("day"),
        "user_id",
    )
    dau = (
        md.groupBy("month", "day")
        .agg(F.countDistinct("user_id").alias("dau"))
        .groupBy("month")
        .agg(
            F.count("*").alias("n_days"),
            F.sum("dau").alias("dau_sum"),
        )
    )
    mau = md.groupBy("month").agg(
        F.countDistinct("user_id").alias("mau")
    )
    return dau.join(mau, "month").select(
        "month",
        "n_days",
        "mau",
        F.round(
            F.col("dau_sum") / F.col("n_days").cast("double"), 6
        ).alias("avg_dau"),
        F.round(
            F.col("dau_sum").cast("double")
            / (F.col("n_days") * F.col("mau")).cast("double"),
            6,
        ).alias("stickiness"),
    )


ORACLE_STICKINESS = """
st_md AS (
  SELECT date_part('year', CAST(ts AS DATE)) * 100
         + date_part('month', CAST(ts AS DATE)) AS month,
         CAST(ts AS DATE) AS day, user_id
  FROM events
),
st_dau AS (
  SELECT month, CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(dau) AS BIGINT) AS dau_sum
  FROM (SELECT month, day,
               CAST(count(DISTINCT user_id) AS BIGINT) AS dau
        FROM st_md GROUP BY 1, 2)
  GROUP BY 1
),
st_mau AS (
  SELECT month, CAST(count(DISTINCT user_id) AS BIGINT) AS mau
  FROM st_md GROUP BY 1
),
stickiness_report AS (
  SELECT d.month, d.n_days, m.mau,
         round(d.dau_sum / CAST(d.n_days AS DOUBLE), 6) AS avg_dau,
         round(CAST(d.dau_sum AS DOUBLE)
               / CAST(d.n_days * m.mau AS DOUBLE), 6) AS stickiness
  FROM st_dau d JOIN st_mau m USING (month)
)
"""


# ---------------------------------------------------------------------------
# exact matrix-profile motif + discord on the daily revenue series
# ---------------------------------------------------------------------------

#: subsequence window length (days).
MP_WINDOW = 7


def matrix_profile_report(events: DataFrame) -> DataFrame:
    """Exact matrix-profile readout over daily revenue: the MOTIF
    (the two most similar non-overlapping {w}-day windows — the
    recurring pattern) and the DISCORD (the window farthest from its
    nearest neighbor — the anomaly), the two questions the
    time-series-mining literature answers with the matrix profile.
    Distances are EXACT BIGINT sums of squared cent differences over
    the {w} aligned days, so every argmin/argmax is engine-exact with
    (dist, i, j) tie-breaks.

    The all-pairs step is day-INDEX grain² — calendar-bounded (never
    data-bounded), which is what makes the exact profile affordable
    at any fact scale: the fact table collapses to one row per day
    first. Windows build from {wm1} lead() columns; overlapping pairs
    (|i−j| < {w}) are excluded per the trivial-match rule.

    Output (1 row): n_windows, motif_i, motif_j, motif_dist,
    discord_i, discord_nn_dist.
    """
    daily = (
        events.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100, 0).cast("bigint"),
                ).otherwise(0)
            ).alias("rev")
        )
    )
    w = Window.orderBy("day")
    idx = daily.select(
        F.row_number().over(w).alias("i"),
        "rev",
        *[
            F.lead("rev", j).over(w).alias(f"r{j}")
            for j in range(1, MP_WINDOW)
        ],
    ).filter(F.col(f"r{MP_WINDOW - 1}").isNotNull())
    a = idx.select(
        F.col("i").alias("ia"),
        F.col("rev").alias("a0"),
        *[F.col(f"r{j}").alias(f"a{j}") for j in range(1, MP_WINDOW)],
    )
    b = idx.select(
        F.col("i").alias("ib"),
        F.col("rev").alias("b0"),
        *[F.col(f"r{j}").alias(f"b{j}") for j in range(1, MP_WINDOW)],
    )
    dist = sum(
        (F.col(f"a{j}") - F.col(f"b{j}"))
        * (F.col(f"a{j}") - F.col(f"b{j}"))
        for j in range(MP_WINDOW)
    )
    pairs = (
        a.join(b, F.col("ia") < F.col("ib"))
        .filter(F.col("ib") - F.col("ia") >= MP_WINDOW)
        .select("ia", "ib", dist.alias("d"))
    )
    motif = pairs.orderBy("d", "ia", "ib").limit(1).select(
        F.col("ia").alias("motif_i"),
        F.col("ib").alias("motif_j"),
        F.col("d").alias("motif_dist"),
    )
    both_dir = pairs.select(
        F.col("ia").alias("i"), F.col("d")
    ).unionByName(pairs.select(F.col("ib").alias("i"), F.col("d")))
    nn = both_dir.groupBy("i").agg(F.min("d").alias("nn_d"))
    discord = nn.orderBy(F.desc("nn_d"), "i").limit(1).select(
        F.col("i").alias("discord_i"),
        F.col("nn_d").alias("discord_nn_dist"),
    )
    n_w = idx.agg(F.count("*").alias("n_windows"))
    return n_w.crossJoin(F.broadcast(motif)).crossJoin(
        F.broadcast(discord)
    )


matrix_profile_report.__doc__ = matrix_profile_report.__doc__.format(
    w=MP_WINDOW, wm1=MP_WINDOW - 1
)


def oracle_matrix_profile(w: int = MP_WINDOW) -> str:
    acols = ", ".join(
        f"lead(rev, {j}) OVER (ORDER BY day) AS r{j}"
        for j in range(1, w)
    )
    dterms = " + ".join(
        f"(x.{'rev' if j == 0 else f'r{j}'} - y.{'rev' if j == 0 else f'r{j}'})"
        f" * (x.{'rev' if j == 0 else f'r{j}'} - y.{'rev' if j == 0 else f'r{j}'})"
        for j in range(w)
    )
    return f"""
mp_daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(sum(CASE WHEN event_type = 'purchase'
                       THEN CAST(round(value * 100, 0) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS rev
  FROM events GROUP BY 1
),
mp_idx AS MATERIALIZED (
  SELECT * FROM (
    SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i,
           rev, {acols}
    FROM mp_daily
  ) WHERE r{w - 1} IS NOT NULL
),
mp_pairs AS MATERIALIZED (
  SELECT x.i AS ia, y.i AS ib, CAST({dterms} AS BIGINT) AS d
  FROM mp_idx x JOIN mp_idx y ON x.i < y.i AND y.i - x.i >= {w}
),
mp_motif AS (
  SELECT ia AS motif_i, ib AS motif_j, d AS motif_dist
  FROM mp_pairs ORDER BY d, ia, ib LIMIT 1
),
mp_nn AS (
  SELECT i, CAST(min(d) AS BIGINT) AS nn_d FROM (
    SELECT ia AS i, d FROM mp_pairs
    UNION ALL SELECT ib AS i, d FROM mp_pairs
  ) GROUP BY 1
),
mp_discord AS (
  SELECT i AS discord_i, nn_d AS discord_nn_dist
  FROM mp_nn ORDER BY nn_d DESC, i LIMIT 1
),
matrix_profile_report AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM mp_idx) AS n_windows,
         m.motif_i, m.motif_j, m.motif_dist,
         dc.discord_i, dc.discord_nn_dist
  FROM mp_motif m CROSS JOIN mp_discord dc
)
"""


# ---------------------------------------------------------------------------
# autocorrelation function + Ljung-Box portmanteau (lags 1..14)
# ---------------------------------------------------------------------------

#: ACF lag horizon.
ACF_MAX_LAG = 14
#: chi-squared 5% critical values for df 1..14 (Ljung-Box).
ACF_CHI2_05 = (3.841, 5.991, 7.815, 9.488, 11.070, 12.592, 14.067,
               15.507, 16.919, 18.307, 19.675, 21.026, 22.362, 23.685)


def acf_report(events: DataFrame) -> DataFrame:
    """Autocorrelation function of daily revenue at lags 1..{L} with
    the cumulative Ljung-Box Q — the residual-whiteness diagnostic
    the AR/Holt/Croston forecasting family should be judged against
    (significant Q says structure remains). Deviations center on the
    FLOOR mean (S DIV n — the deterministic integer choice), so every
    covariance c_k is an exact BIGINT product-sum; rho_k = c_k/c_0
    rounds at 6 dp BEFORE entering Q, and Q accumulates over the
    ordered 14-row lag grain — both engines fold identically.

    One day collapse, {L} lag columns over the bounded series, one
    15-sum reduction, a stack to the lag grain.

    Output per lag: lag, n_pairs, c_lag, rho, lb_q, significant.
    """
    daily = (
        events.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100, 0).cast("bigint"),
                ).otherwise(0)
            ).alias("rev")
        )
    )
    m = daily.agg(
        F.expr("sum(rev) DIV count(*)").alias("mu"),
        F.count("*").alias("n"),
    )
    w = Window.orderBy("day")
    lagged = daily.crossJoin(F.broadcast(m)).select(
        (F.col("rev") - F.col("mu")).alias("d"),
        "n",
        *[
            (F.lag("rev", k).over(w) - F.col("mu")).alias(f"d{k}")
            for k in range(1, ACF_MAX_LAG + 1)
        ],
    )
    agg = lagged.agg(
        F.max("n").alias("n"),
        F.sum(F.col("d") * F.col("d")).alias("c0"),
        *[
            F.sum(F.col("d") * F.col(f"d{k}")).alias(f"c{k}")
            for k in range(1, ACF_MAX_LAG + 1)
        ],
        *[
            F.count(F.col(f"d{k}")).alias(f"n{k}")
            for k in range(1, ACF_MAX_LAG + 1)
        ],
    )
    stacked = agg.selectExpr(
        "n",
        "c0",
        "stack({}, {}) AS (lag, c_lag, n_pairs)".format(
            ACF_MAX_LAG,
            ", ".join(
                f"{k}, c{k}, n{k}" for k in range(1, ACF_MAX_LAG + 1)
            ),
        ),
    )
    rho = F.round(
        F.col("c_lag").cast("double") / F.col("c0").cast("double"), 6
    )
    terms = stacked.select(
        "lag",
        "n_pairs",
        "c_lag",
        rho.alias("rho"),
        (
            rho * rho / (F.col("n").cast("double") - F.col("lag"))
        ).alias("term"),
        "n",
    )
    wq = Window.orderBy("lag").rowsBetween(
        Window.unboundedPreceding, 0
    )
    nd = F.col("n").cast("double")
    q = F.round(nd * (nd + 2) * F.sum("term").over(wq), 6)
    crit = F.element_at(
        F.array(*[F.lit(c) for c in ACF_CHI2_05]), F.col("lag")
    )
    return terms.select(
        "lag",
        "n_pairs",
        "c_lag",
        "rho",
        q.alias("lb_q"),
        (q > crit).alias("significant"),
    )


acf_report.__doc__ = acf_report.__doc__.format(L=ACF_MAX_LAG)


def oracle_acf(max_lag: int = ACF_MAX_LAG) -> str:
    lag_cols = ",\n         ".join(
        f"lag(rev, {k}) OVER (ORDER BY day) - mu AS d{k}"
        for k in range(1, max_lag + 1)
    )
    csums = ",\n         ".join(
        f"CAST(sum(d * d{k}) AS BIGINT) AS c{k},"
        f" CAST(count(d{k}) AS BIGINT) AS n{k}"
        for k in range(1, max_lag + 1)
    )
    arms = "\n  UNION ALL\n".join(
        f"  SELECT {k} AS lag, c{k} AS c_lag, n{k} AS n_pairs, n, c0"
        " FROM acf_a"
        for k in range(1, max_lag + 1)
    )
    crits = ", ".join(
        f"({i + 1}, CAST({c} AS DOUBLE))"
        for i, c in enumerate(ACF_CHI2_05)
    )
    return f"""
acf_daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(sum(CASE WHEN event_type = 'purchase'
                       THEN CAST(round(value * 100, 0) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS rev
  FROM events GROUP BY 1
),
acf_m AS (
  SELECT CAST(sum(rev) // count(*) AS BIGINT) AS mu,
         CAST(count(*) AS BIGINT) AS n
  FROM acf_daily
),
acf_l AS MATERIALIZED (
  SELECT rev - mu AS d, n,
         {lag_cols}
  FROM acf_daily, acf_m
),
acf_a AS MATERIALIZED (
  SELECT CAST(max(n) AS BIGINT) AS n,
         CAST(sum(d * d) AS BIGINT) AS c0,
         {csums}
  FROM acf_l
),
acf_rows AS (
{arms}
),
acf_crit (lag, crit) AS (VALUES {crits}),
acf_t AS (
  SELECT lag, n_pairs, c_lag,
         round(CAST(c_lag AS DOUBLE) / CAST(c0 AS DOUBLE), 6) AS rho,
         round(CAST(c_lag AS DOUBLE) / CAST(c0 AS DOUBLE), 6)
           * round(CAST(c_lag AS DOUBLE) / CAST(c0 AS DOUBLE), 6)
           / (CAST(n AS DOUBLE) - lag) AS term,
         n
  FROM acf_rows
),
acf_report AS (
  SELECT t.lag, t.n_pairs, t.c_lag, t.rho,
         round(CAST(t.n AS DOUBLE) * (CAST(t.n AS DOUBLE) + 2)
               * sum(t.term) OVER (ORDER BY t.lag
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               6) AS lb_q,
         round(CAST(t.n AS DOUBLE) * (CAST(t.n AS DOUBLE) + 2)
               * sum(t.term) OVER (ORDER BY t.lag
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               6) > c.crit AS significant
  FROM acf_t t JOIN acf_crit c USING (lag)
)
"""


# ---------------------------------------------------------------------------
# PACF via unrolled Durbin-Levinson (AR-order identification)
# ---------------------------------------------------------------------------

#: PACF levels (Durbin-Levinson unrolled).
PACF_MAX_LAG = 5


def pacf_report(events: DataFrame) -> DataFrame:
    """Partial autocorrelations of daily revenue at lags 1..{L} by the
    Durbin-Levinson recursion, UNROLLED as chained column algebra on
    the one-row ACF frame — with the ACF table this completes the
    Box-Jenkins identification pair (ACF tails ↔ PACF cuts choose the
    AR order the `ar2_forecast` model assumes). Inputs are the
    6-dp-rounded rho_k (exact-BIGINT covariances around the floor
    mean, same kernel as `acf_report`), so every level's phis are
    identical IEEE scalars in both engines.

    Output per lag: lag, pacf (round 6), significant
    (|pacf| > 1.96/sqrt(n)).
    """
    daily = (
        events.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100, 0).cast("bigint"),
                ).otherwise(0)
            ).alias("rev")
        )
    )
    m = daily.agg(
        F.expr("sum(rev) DIV count(*)").alias("mu"),
        F.count("*").alias("n"),
    )
    w = Window.orderBy("day")
    lagged = daily.crossJoin(F.broadcast(m)).select(
        (F.col("rev") - F.col("mu")).alias("d"),
        "n",
        *[
            (F.lag("rev", k).over(w) - F.col("mu")).alias(f"d{k}")
            for k in range(1, PACF_MAX_LAG + 1)
        ],
    )
    agg = lagged.agg(
        F.max("n").alias("n"),
        F.sum(F.col("d") * F.col("d")).alias("c0"),
        *[
            F.sum(F.col("d") * F.col(f"d{k}")).alias(f"c{k}")
            for k in range(1, PACF_MAX_LAG + 1)
        ],
    )
    rhos = agg.select(
        "n",
        *[
            F.round(
                F.col(f"c{k}").cast("double")
                / F.col("c0").cast("double"),
                6,
            ).alias(f"r{k}")
            for k in range(1, PACF_MAX_LAG + 1)
        ],
    )
    # Durbin-Levinson, unrolled: level k keeps phi_k1..phi_kk columns.
    cur = rhos.withColumn("p1_1", F.col("r1"))
    phis = {1: ["p1_1"]}
    for k in range(2, PACF_MAX_LAG + 1):
        prev = phis[k - 1]
        num = F.col(f"r{k}")
        den = F.lit(1.0)
        for j, colname in enumerate(prev, start=1):
            num = num - F.col(colname) * F.col(f"r{k - j}")
            den = den - F.col(colname) * F.col(f"r{j}")
        cur = cur.withColumn(f"p{k}_{k}", num / den)
        new_cols = []
        for j, colname in enumerate(prev, start=1):
            mirror = prev[k - 1 - j]
            cur = cur.withColumn(
                f"p{k}_{j}",
                F.col(colname) - F.col(f"p{k}_{k}") * F.col(mirror),
            )
            new_cols.append(f"p{k}_{j}")
        phis[k] = new_cols + [f"p{k}_{k}"]
    stacked = cur.selectExpr(
        "n",
        "stack({}, {}) AS (lag, pacf_raw)".format(
            PACF_MAX_LAG,
            ", ".join(
                f"{k}, p{k}_{k}" for k in range(1, PACF_MAX_LAG + 1)
            ),
        ),
    )
    thresh = 1.96 / F.sqrt(F.col("n").cast("double"))
    return stacked.select(
        "lag",
        F.round("pacf_raw", 6).alias("pacf"),
        (F.abs(F.round("pacf_raw", 6)) > thresh).alias("significant"),
    )


pacf_report.__doc__ = pacf_report.__doc__.format(L=PACF_MAX_LAG)


def oracle_pacf(max_lag: int = PACF_MAX_LAG) -> str:
    lag_cols = ",\n         ".join(
        f"lag(rev, {k}) OVER (ORDER BY day) - mu AS d{k}"
        for k in range(1, max_lag + 1)
    )
    csums = ",\n         ".join(
        f"CAST(sum(d * d{k}) AS BIGINT) AS c{k}"
        for k in range(1, max_lag + 1)
    )
    rho_cols = ",\n         ".join(
        f"round(CAST(c{k} AS DOUBLE) / CAST(c0 AS DOUBLE), 6) AS r{k}"
        for k in range(1, max_lag + 1)
    )
    # unroll Durbin-Levinson as chained CTEs, one per level
    ctes = []
    phis = {1: ["p1_1"]}
    ctes.append("pf_l1 AS (SELECT *, r1 AS p1_1 FROM pf_rho)")
    prev_cte = "pf_l1"
    for k in range(2, max_lag + 1):
        prev = phis[k - 1]
        num = f"r{k}"
        den = "1.0"
        for j, colname in enumerate(prev, start=1):
            num += f" - {colname} * r{k - j}"
            den += f" - {colname} * r{j}"
        parts = [f"({num}) / ({den}) AS p{k}_{k}"]
        cte_a = (
            f"pf_l{k}a AS (SELECT *, {parts[0]} FROM {prev_cte})"
        )
        ctes.append(cte_a)
        upd = []
        new_cols = []
        for j, colname in enumerate(prev, start=1):
            mirror = prev[k - 1 - j]
            upd.append(
                f"{colname} - p{k}_{k} * {mirror} AS p{k}_{j}"
            )
            new_cols.append(f"p{k}_{j}")
        ctes.append(
            f"pf_l{k} AS (SELECT *, {', '.join(upd)} FROM pf_l{k}a)"
        )
        phis[k] = new_cols + [f"p{k}_{k}"]
        prev_cte = f"pf_l{k}"
    arms = "\n  UNION ALL\n".join(
        f"  SELECT {k} AS lag, p{k}_{k} AS pacf_raw, n FROM {prev_cte}"
        for k in range(1, max_lag + 1)
    )
    return f"""
pf_daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(sum(CASE WHEN event_type = 'purchase'
                       THEN CAST(round(value * 100, 0) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS rev
  FROM events GROUP BY 1
),
pf_m AS (
  SELECT CAST(sum(rev) // count(*) AS BIGINT) AS mu,
         CAST(count(*) AS BIGINT) AS n
  FROM pf_daily
),
pf_l AS MATERIALIZED (
  SELECT rev - mu AS d, n,
         {lag_cols}
  FROM pf_daily, pf_m
),
pf_a AS MATERIALIZED (
  SELECT CAST(max(n) AS BIGINT) AS n,
         CAST(sum(d * d) AS BIGINT) AS c0,
         {csums}
  FROM pf_l
),
pf_rho AS MATERIALIZED (
  SELECT n,
         {rho_cols}
  FROM pf_a
),
{",".join(ctes)},
pf_rows AS (
{arms}
),
pacf_report AS (
  SELECT lag, round(pacf_raw, 6) AS pacf,
         abs(round(pacf_raw, 6))
           > 1.96 / sqrt(CAST(n AS DOUBLE)) AS significant
  FROM pf_rows
)
"""


# ---------------------------------------------------------------------------
# cross-correlation function (clicks vs revenue, leads and lags)
# ---------------------------------------------------------------------------

#: CCF lag horizon (both directions).
CCF_MAX_LAG = 7


def ccf_report(events: DataFrame) -> DataFrame:
    """Cross-correlation between daily CLICKS and daily REVENUE at
    lags −{L}..+{L}: positive lags correlate today's revenue with
    clicks k days EARLIER — the lead/lag picture behind the Granger
    test's single F number (which side leads, and by how much).
    Deviations center on each series' floor mean, so every
    cross-covariance is an exact BIGINT product-sum; rho_k divides by
    the two exact variances once, rounded 6.

    Same one-collapse + lag-column shape as the ACF: adding lags
    adds columns. Output per lag: lag, n_pairs, rho.
    """
    daily = (
        events.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100, 0).cast("bigint"),
                ).otherwise(0)
            ).alias("rev"),
            F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            ).alias("clk"),
        )
    )
    m = daily.agg(
        F.expr("sum(rev) DIV count(*)").alias("mur"),
        F.expr("sum(clk) DIV count(*)").alias("muc"),
    )
    w = Window.orderBy("day")
    lags = list(range(-CCF_MAX_LAG, CCF_MAX_LAG + 1))

    def cname(k: int) -> str:
        return f"cm{-k}" if k < 0 else f"cp{k}"

    lagged = daily.crossJoin(F.broadcast(m)).select(
        (F.col("rev") - F.col("mur")).alias("dr"),
        (F.col("clk") - F.col("muc")).alias("dc"),
        *[
            (F.lag("clk", k).over(w) - F.col("muc")).alias(cname(k))
            for k in lags
        ],
    )
    agg = lagged.agg(
        F.sum(F.col("dr") * F.col("dr")).alias("vr"),
        F.sum(F.col("dc") * F.col("dc")).alias("vc"),
        *[
            F.sum(F.col("dr") * F.col(cname(k))).alias(f"x{cname(k)}")
            for k in lags
        ],
        *[
            F.count(F.col(cname(k))).alias(f"n{cname(k)}")
            for k in lags
        ],
    )
    stacked = agg.selectExpr(
        "vr",
        "vc",
        "stack({}, {}) AS (lag, xc, n_pairs)".format(
            len(lags),
            ", ".join(
                f"{k}, x{cname(k)}, n{cname(k)}" for k in lags
            ),
        ),
    )
    return stacked.select(
        "lag",
        "n_pairs",
        F.round(
            F.col("xc").cast("double")
            / F.sqrt(
                F.col("vr").cast("double") * F.col("vc").cast("double")
            ),
            6,
        ).alias("rho"),
    )


ccf_report.__doc__ = ccf_report.__doc__.format(L=CCF_MAX_LAG)


def oracle_ccf(max_lag: int = CCF_MAX_LAG) -> str:
    lags = list(range(-max_lag, max_lag + 1))

    def cname(k: int) -> str:
        return f"cm{-k}" if k < 0 else f"cp{k}"

    lag_cols = ",\n         ".join(
        f"lag(clk, {k}) OVER (ORDER BY day) - muc AS {cname(k)}"
        for k in lags
    )
    sums = ",\n         ".join(
        f"CAST(sum(dr * {cname(k)}) AS BIGINT) AS x{cname(k)},"
        f" CAST(count({cname(k)}) AS BIGINT) AS n{cname(k)}"
        for k in lags
    )
    arms = "\n  UNION ALL\n".join(
        f"  SELECT {k} AS lag, x{cname(k)} AS xc,"
        f" n{cname(k)} AS n_pairs, vr, vc FROM cc_a"
        for k in lags
    )
    return f"""
cc_daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(sum(CASE WHEN event_type = 'purchase'
                       THEN CAST(round(value * 100, 0) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS rev,
         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS clk
  FROM events GROUP BY 1
),
cc_m AS (
  SELECT CAST(sum(rev) // count(*) AS BIGINT) AS mur,
         CAST(sum(clk) // count(*) AS BIGINT) AS muc
  FROM cc_daily
),
cc_l AS MATERIALIZED (
  SELECT rev - mur AS dr, clk - muc AS dc,
         {lag_cols}
  FROM cc_daily, cc_m
),
cc_a AS MATERIALIZED (
  SELECT CAST(sum(dr * dr) AS BIGINT) AS vr,
         CAST(sum(dc * dc) AS BIGINT) AS vc,
         {sums}
  FROM cc_l
),
cc_rows AS (
{arms}
),
ccf_report AS (
  SELECT lag, n_pairs,
         round(CAST(xc AS DOUBLE)
               / sqrt(CAST(vr AS DOUBLE) * CAST(vc AS DOUBLE)), 6)
           AS rho
  FROM cc_rows
)
"""


# ---------------------------------------------------------------------------
# Walsh-Hadamard sequency spectrum (integer-exact spectral analysis)
# ---------------------------------------------------------------------------

#: WHT block length (2^4 days — the fixtures span ~30 days).
WHT_N = 16


def wht_spectrum(events: DataFrame) -> DataFrame:
    """Walsh-Hadamard sequency spectrum of the first {n} days of
    revenue — spectral analysis the engine can hash-verify (16-day block): WHT basis
    functions are ±1, so every butterfly stage is integer adds/subs
    and the whole transform stays EXACT BIGINT (a Fourier DFT would
    drag in cos/sin whose cross-engine rounding is not IEEE-pinned —
    the reason a periodogram was rejected). High-sequency energy =
    day-to-day churn, low = slow drift; Parseval (Σcoeff² = {n}·Σx²)
    rides along as a self-proving flag.

    The butterfly stages run as chained ARRAY transforms on ONE
    row (each stage materialized — the expression-tree-doubling trap
    from the Hilbert lesson); fact-scale work is only the day
    collapse.

    Output per sequency index: seq_idx, coeff, parseval_ok.
    """
    daily = (
        events.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100, 0).cast("bigint"),
                ).otherwise(0)
            ).alias("rev")
        )
    )
    w = Window.orderBy("day")
    first = (
        daily.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= WHT_N)
        .select("rn", "rev")
    )
    arr = first.groupBy().agg(
        F.expr(
            "transform(array_sort(collect_list(struct(rn, rev))),"
            " x -> x.rev)"
        ).alias("w0")
    )
    cur = arr
    stages = 4
    for s in range(stages):
        h = 1 << s
        cur = cur.select(
            "*",
            F.expr(
                f"transform(sequence(0, {WHT_N - 1}), i -> CASE"
                f" WHEN (i DIV {h}) % 2 = 0"
                f" THEN element_at(w{s}, i + 1)"
                f"      + element_at(w{s}, (i ^ {h}) + 1)"
                f" ELSE element_at(w{s}, (i ^ {h}) + 1)"
                f"      - element_at(w{s}, i + 1) END)"
            ).alias(f"w{s + 1}"),
        ).select(f"w{s + 1}", "w0")
    final = cur.select(
        F.col(f"w{stages}").alias("wf"),
        F.expr(
            f"aggregate(w{stages}, CAST(0 AS BIGINT),"
            " (acc, v) -> acc + v * v)"
        ).alias("energy"),
        F.expr(
            "aggregate(w0, CAST(0 AS BIGINT),"
            " (acc, v) -> acc + v * v)"
        ).alias("raw_energy"),
    )
    return final.select(
        F.posexplode("wf").alias("seq_idx", "coeff"),
        (F.col("energy") == F.lit(WHT_N) * F.col("raw_energy"))
        .cast("int")
        .alias("parseval_ok"),
    )


wht_spectrum.__doc__ = wht_spectrum.__doc__.format(n=WHT_N)


def oracle_wht(stages: int = 4) -> str:
    n = 1 << stages
    ctes = [
        f"""
wh_daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(sum(CASE WHEN event_type = 'purchase'
                       THEN CAST(round(value * 100, 0) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS rev
  FROM events GROUP BY 1
),
wh_first AS (
  SELECT rev, row_number() OVER (ORDER BY day) AS rn FROM wh_daily
  QUALIFY rn <= {n}
),
wh_a0 AS (
  SELECT list(rev ORDER BY rn) AS w0 FROM wh_first
)"""
    ]
    prev = "wh_a0"
    for s in range(stages):
        h = 1 << s
        ctes.append(
            f"""
wh_a{s + 1} AS MATERIALIZED (
  SELECT w0, list_transform(range({n}), i -> CASE
           WHEN (i // {h}) % 2 = 0
           THEN w{s}[i + 1] + w{s}[xor(i::BIGINT, {h}::BIGINT) + 1]
           ELSE w{s}[xor(i::BIGINT, {h}::BIGINT) + 1] - w{s}[i + 1]
         END) AS w{s + 1}
  FROM {prev}
)"""
        )
        prev = f"wh_a{s + 1}"
    ctes.append(
        f"""
wh_f AS (
  SELECT w{stages} AS wf,
         list_sum(list_transform(w{stages}, v -> v * v)) AS energy,
         list_sum(list_transform(w0, v -> v * v)) AS raw_energy
  FROM {prev}
),
wht_spectrum AS (
  SELECT CAST(t.i AS INT) AS seq_idx,
         CAST(wf[t.i + 1] AS BIGINT) AS coeff,
         CAST(energy = {n} * raw_energy AS INT) AS parseval_ok
  FROM wh_f, range({n}) t(i)
)"""
    )
    return ",".join(ctes)


# ---------------------------------------------------------------------------
# economic order quantity (EOQ) per product
# ---------------------------------------------------------------------------

#: fixed ordering cost (cents) and holding cost (cents/unit/window).
EOQ_ORDER_COST = 5000
EOQ_HOLD_COST = 20


def eoq_report(lineitem: DataFrame) -> DataFrame:
    """Economic order quantity per product: EOQ = √(2·D·K/h) on the
    window's total demand D with literal ordering/holding costs — the
    continuous-review companion of the single-period newsvendor
    fractile. One hash-agg to product demand, then scalar algebra;
    order frequency D/EOQ rides along.

    Output per product: product, d_units, eoq_units, orders_per_window.
    """
    d = lineitem.groupBy(F.col("l_partkey").alias("product")).agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("d_units")
    )
    eoq = F.sqrt(
        2.0
        * F.col("d_units").cast("double")
        * EOQ_ORDER_COST
        / EOQ_HOLD_COST
    )
    return d.select(
        "product",
        "d_units",
        F.round(eoq, 4).alias("eoq_units"),
        F.round(F.col("d_units").cast("double") / eoq, 4).alias(
            "orders_per_window"
        ),
    )


ORACLE_EOQ = f"""
eoq_report AS (
  SELECT l_partkey AS product,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS d_units,
         round(sqrt(2.0 * CAST(sum(CAST(l_quantity AS BIGINT))
                               AS DOUBLE)
                    * {EOQ_ORDER_COST} / {EOQ_HOLD_COST}), 4)
           AS eoq_units,
         round(CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE)
               / sqrt(2.0 * CAST(sum(CAST(l_quantity AS BIGINT))
                                 AS DOUBLE)
                      * {EOQ_ORDER_COST} / {EOQ_HOLD_COST}), 4)
           AS orders_per_window
  FROM lineitem GROUP BY 1
)
"""


# ---------------------------------------------------------------------------
# Haar multi-resolution energy decomposition (integer wavelets)
# ---------------------------------------------------------------------------

#: Haar block (2^4 days) and level count.
HAAR_N = 16
HAAR_LEVELS = 4


def haar_energy(events: DataFrame) -> DataFrame:
    """Unnormalized Haar wavelet energy by resolution level over the
    first {n}-day revenue block: level 1 details are day-pair
    differences (fastest variation), level 4 the coarsest — the
    multi-resolution variance decomposition that says WHICH timescale
    carries the volatility (the hierarchical reading the flat WHT
    sequency spectrum doesn't give). Unnormalized Haar keeps every
    approximation/detail coefficient an exact BIGINT (a+b / a−b per
    pair), so per-level energies hash-match.

    Each level halves the array (one checkpointed 1-row transform —
    the element_at inlining discipline from the WHT); fact-scale work
    is only the day collapse.

    Output per level: level, n_coeffs, detail_energy.
    """
    daily = (
        events.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100, 0).cast("bigint"),
                ).otherwise(0)
            ).alias("rev")
        )
    )
    w = Window.orderBy("day")
    first = (
        daily.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= HAAR_N)
        .select("rn", "rev")
    )
    cur = first.groupBy().agg(
        F.expr(
            "transform(array_sort(collect_list(struct(rn, rev))),"
            " x -> x.rev)"
        ).alias("a0")
    ).localCheckpoint(eager=True)
    for lv in range(1, HAAR_LEVELS + 1):
        m = HAAR_N >> lv
        cur = cur.select(
            "*",
            F.expr(
                f"transform(sequence(0, {m - 1}), i ->"
                f" element_at(a{lv - 1}, 2 * i + 1)"
                f" + element_at(a{lv - 1}, 2 * i + 2))"
            ).alias(f"a{lv}"),
            F.expr(
                f"aggregate(transform(sequence(0, {m - 1}), i ->"
                f" element_at(a{lv - 1}, 2 * i + 1)"
                f" - element_at(a{lv - 1}, 2 * i + 2)),"
                " CAST(0 AS BIGINT), (acc, v) -> acc + v * v)"
            ).alias(f"e{lv}"),
        ).select(
            f"a{lv}", *[f"e{j}" for j in range(1, lv + 1)]
        ).localCheckpoint(eager=True)
    return cur.selectExpr(
        "stack({}, {}) AS (level, n_coeffs, detail_energy)".format(
            HAAR_LEVELS,
            ", ".join(
                f"{lv}, CAST({HAAR_N >> lv} AS BIGINT), e{lv}"
                for lv in range(1, HAAR_LEVELS + 1)
            ),
        )
    )


haar_energy.__doc__ = haar_energy.__doc__.format(n=HAAR_N)


def oracle_haar(levels: int = HAAR_LEVELS) -> str:
    n = HAAR_N
    ctes = [
        f"""
ha_daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(sum(CASE WHEN event_type = 'purchase'
                       THEN CAST(round(value * 100, 0) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS rev
  FROM events GROUP BY 1
),
ha_first AS (
  SELECT rev, row_number() OVER (ORDER BY day) AS rn FROM ha_daily
  QUALIFY rn <= {n}
),
ha_l0 AS (SELECT list(rev ORDER BY rn) AS a0 FROM ha_first)"""
    ]
    prev = "ha_l0"
    for lv in range(1, levels + 1):
        m = n >> lv
        ctes.append(
            f"""
ha_l{lv} AS MATERIALIZED (
  SELECT *,
         list_transform(range({m}), i ->
           a{lv - 1}[2 * i + 1] + a{lv - 1}[2 * i + 2]) AS a{lv},
         list_sum(list_transform(range({m}), i ->
           (a{lv - 1}[2 * i + 1] - a{lv - 1}[2 * i + 2])
           * (a{lv - 1}[2 * i + 1] - a{lv - 1}[2 * i + 2])))
           AS e{lv}
  FROM {prev}
)"""
        )
        prev = f"ha_l{lv}"
    arms = "\n  UNION ALL\n".join(
        f"  SELECT {lv} AS level, CAST({n >> lv} AS BIGINT) AS n_coeffs,"
        f" CAST(e{lv} AS BIGINT) AS detail_energy FROM {prev}"
        for lv in range(1, levels + 1)
    )
    ctes.append(f"""
haar_energy AS (
{arms}
)""")
    return ",".join(ctes)


# ---------------------------------------------------------------------------
# least-squares changepoint (binary segmentation, exact integer argmax)
# ---------------------------------------------------------------------------

def _cp_base():
    """Word base for the changepoint dominance comparison: p is
    split as p = hi*BASE + lo so cross-multiplied comparisons never
    divide a decimal by a column (Spark decimal division keeps only
    32 integer digits — the round-6 q = p div nn NULLed past
    q ~ 1e32). A function, not a module constant: building a Column
    needs an active session."""
    return F.lit(10**18).cast("decimal(19,0)")


def changepoint_split(events: DataFrame) -> DataFrame:
    """Offline least-squares changepoint over the daily purchase-
    revenue series (binary segmentation, first split): the day s that
    maximizes the between-segment sum of squares — the "when did the
    level shift" complement to ``cusum_changepoints``' sequential
    alarm. Minimizing SSE(s) is equivalent to maximizing
    f(s) = L(s)^2/n_l + R(s)^2/n_r (L/R = segment cent sums), and the
    argmax is decided EXACTLY: with P = L^2*n_r + R^2*n_l and
    N = n_l*n_r, f(s2) > f(s1) iff P2*N1 > P1*N2 — evaluated on the
    Spark side in two 10^18-base WORDS per side (P = hi*10^18 + lo;
    the cross product's words are hi*N + carry and (lo*N) mod 10^18,
    every term <= 1e34, compared lexicographically) and on the
    DuckDB side in native 128-bit HUGEINT. No float ever touches the
    decision, so the chosen day hash-matches by construction.

    Overflow envelope (r5 advice, re-derived r7): the single-tier
    cross-multiply P2*N1 in ONE word needed P*N < 1e38; the round-6
    two-tier q = P div N quotient was exact only up to q < 1e32
    (Spark decimal division keeps 32 integral digits — caught by the
    r7 boundary test, which this word-split form fixes). The word
    form's largest intermediate is hi*N <= (P/1e18)*N ~ 1e34 at a
    century calendar, so only P's own DECIMAL(38) width constrains
    scale: exact while S^2*n < 1e38, i.e. total cents
    S < sqrt(1e38/n) (~1.5e17 cents at n = 4096 days — see SCALE.md
    round-7 section for the rescaling rule beyond that).

    Scale: the only corpus-sized stage is the per-day cent-sum agg;
    prefix sums and the dominance test are O(days^2) self-joins on
    the calendar-bounded daily table (no window, no sort), the same
    stance as the diameter histogram. Output (1 row): split_day
    (last day of the left segment), n_left, n_right, sum_left_cents,
    sum_right_cents, mean_left, mean_right, delta_mean (round 6).
    """
    daily = events.filter(F.col("event_type") == "purchase").groupBy(
        F.to_date("ts").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias(
            "x"
        )
    ).localCheckpoint(eager=True)  # day-grain; consumed by 4 branches
    tot = daily.agg(
        F.count("*").alias("n"), F.sum("x").alias("s")
    )
    pre = (
        daily.alias("a")
        .join(daily.alias("b"), F.col("b.day") <= F.col("a.day"))
        .groupBy(F.col("a.day").alias("day"))
        .agg(
            F.count("*").alias("n_l"),
            F.sum("b.x").alias("sum_l"),
        )
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    cand = (
        pre.crossJoin(F.broadcast(tot))
        .filter(F.col("n_l") < F.col("n"))
        .select(
            "day",
            "n_l",
            "sum_l",
            (F.col("n") - F.col("n_l")).alias("n_r"),
            (F.col("s") - F.col("sum_l")).alias("sum_r"),
        )
        .select(
            "day",
            "n_l",
            "n_r",
            "sum_l",
            "sum_r",
            (
                dec(F.col("sum_l")) * dec(F.col("sum_l"))
                * dec(F.col("n_r"))
                + dec(F.col("sum_r")) * dec(F.col("sum_r"))
                * dec(F.col("n_l"))
            ).alias("p"),
            (F.col("n_l") * F.col("n_r")).cast("decimal(14,0)").alias(
                "nn"
            ),
        )
        # exact hi/lo word split of p by the LITERAL base 10^18
        # (decimal %, then a division that is integral by
        # construction and <= 1e20 — inside Spark's decimal(38,6)
        # division cap). The round-6 q = p div nn quotient NULLed
        # for q >= 1e32 (Spark division keeps only 32 integer
        # digits), so the dominance test now cross-multiplies in
        # two exact words instead of dividing by nn at all.
        .withColumn("lo", F.col("p") % _cp_base())
        .withColumn(
            "hi",
            ((F.col("p") - F.col("lo")) / _cp_base()).cast(
                "decimal(38,0)"
            ),
        )
    )

    def _words(p_hi, p_lo, nn):
        """(hi, lo) words of (p_hi*BASE + p_lo) * nn — every term
        bounded: raw <= 1e32, carry <= 1e14, hi*nn <= 1e34."""
        raw = p_lo * nn
        rlo = raw % _cp_base()
        carry = ((raw - rlo) / _cp_base()).cast("decimal(38,0)")
        return p_hi * nn + carry, rlo

    xh, xl = _words(F.col("c2.hi"), F.col("c2.lo"), F.col("c1.nn"))
    yh, yl = _words(F.col("c1.hi"), F.col("c1.lo"), F.col("c2.nn"))
    dominated = (
        cand.alias("c1")
        .join(
            cand.alias("c2"),
            (xh > yh) | ((xh == yh) & (xl > yl)),
            "leftsemi",
        )
        .select("c1.day")
    )
    best = (
        cand.join(dominated, "day", "leftanti")
        .agg(F.min("day").alias("split_day"))
    )
    return (
        cand.join(best, F.col("day") == F.col("split_day"))
        .select(
            "split_day",
            F.col("n_l").alias("n_left"),
            F.col("n_r").alias("n_right"),
            F.col("sum_l").alias("sum_left_cents"),
            F.col("sum_r").alias("sum_right_cents"),
            F.round(
                F.col("sum_l").cast("double") / F.col("n_l"), 6
            ).alias("mean_left"),
            F.round(
                F.col("sum_r").cast("double") / F.col("n_r"), 6
            ).alias("mean_right"),
            F.round(
                F.col("sum_r").cast("double") / F.col("n_r")
                - F.col("sum_l").cast("double") / F.col("n_l"),
                6,
            ).alias("delta_mean"),
        )
    )


ORACLE_CHANGEPOINT = """
cp_d AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS x
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
cp_tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s
  FROM cp_d
),
cp_pre AS (
  SELECT a.day, CAST(count(*) AS BIGINT) AS n_l,
         CAST(sum(b.x) AS BIGINT) AS sum_l
  FROM cp_d a JOIN cp_d b ON b.day <= a.day
  GROUP BY 1
),
cp_cand AS MATERIALIZED (
  SELECT day, n_l, n_r, sum_l, sum_r, p, nn,
         p // nn AS q, p % nn AS r
  FROM (
    SELECT day, n_l, t.n - n_l AS n_r, sum_l, t.s - sum_l AS sum_r,
           CAST(sum_l AS HUGEINT) * sum_l * (t.n - n_l)
             + CAST(t.s - sum_l AS HUGEINT) * (t.s - sum_l) * n_l
             AS p,
           CAST(n_l AS HUGEINT) * (t.n - n_l) AS nn
    FROM cp_pre, cp_tot t
    WHERE n_l < t.n
  )
),
cp_best AS (
  SELECT min(day) AS split_day
  FROM cp_cand c1
  WHERE NOT EXISTS (
    SELECT 1 FROM cp_cand c2
    WHERE c2.q > c1.q
       OR (c2.q = c1.q AND c2.r * c1.nn > c1.r * c2.nn))
),
events_changepoint AS (
  SELECT b.split_day,
         c.n_l AS n_left, c.n_r AS n_right,
         c.sum_l AS sum_left_cents, c.sum_r AS sum_right_cents,
         round(CAST(c.sum_l AS DOUBLE) / c.n_l, 6) AS mean_left,
         round(CAST(c.sum_r AS DOUBLE) / c.n_r, 6) AS mean_right,
         round(CAST(c.sum_r AS DOUBLE) / c.n_r
               - CAST(c.sum_l AS DOUBLE) / c.n_l, 6) AS delta_mean
  FROM cp_best b JOIN cp_cand c ON c.day = b.split_day
)
"""


# ---------------------------------------------------------------------------
# finite-window adstock (marketing carry-over) — exact dyadic arithmetic
# ---------------------------------------------------------------------------

#: adstock decay 1/2 per day with a 14-day memory: every carry-over
#: term is clicks / 2^age — an EXACT dyadic double (computed as
#: division by a shifted integer, never pow()), so the per-day sums
#: are bit-identical across engines regardless of fold order.
ADSTOCK_WINDOW_DAYS = 14


def adstock_daily(events: DataFrame) -> DataFrame:
    """Finite-window adstock: the marketing carry-over transform
    A_t = sum_{age<WINDOW} clicks_{t-age} / 2^age, plus the
    diminishing-returns saturation S_t = A_t / (A_t + K) with K the
    series' mean adstock — the two standard preprocessing steps of a
    media-mix model, computed exactly. Decay 1/2 with integer click
    counts makes every term an exact dyadic (clicks divided by a
    shifted-integer power of two, no pow()), so A_t is bit-identical
    in both engines with NO sequential fold at all — unlike the
    EWMA/Holt ladder, this is a plain day-grain range self-join,
    which is also what makes it embarrassingly parallel at 100 TB
    (the infinite-memory form needs the stateful fold; 14 days of
    memory is the standard adstock posture).

    Scale: the only corpus-sized stage is the per-day agg; the decay
    join is days x WINDOW rows, calendar-bounded. Output per day:
    day, clicks, rev_cents, adstock (round 6), saturated (round 6).
    """
    daily = (
        events.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            ).alias("clicks"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100, 0).cast("bigint"),
                ).otherwise(0)
            ).alias("rev_cents"),
        )
        .localCheckpoint(eager=True)  # day-grain; 3 consumers
    )
    contrib = (
        daily.alias("t")
        .join(
            daily.alias("s"),
            (F.col("s.day") <= F.col("t.day"))
            & (
                F.datediff(F.col("t.day"), F.col("s.day"))
                < ADSTOCK_WINDOW_DAYS
            ),
        )
        .select(
            F.col("t.day").alias("day"),
            # pyspark's shiftleft() wants a literal bit count, so the
            # column-exponent shift goes through F.expr
            F.expr(
                "CAST(s.clicks AS DOUBLE)"
                " / CAST(shiftleft(CAST(1 AS BIGINT),"
                "        datediff(t.day, s.day)) AS DOUBLE)"
            ).alias("term"),
        )
        .groupBy("day")
        .agg(F.sum("term").alias("adstock"))
    )
    base = daily.join(contrib, "day")
    k = base.agg(
        (F.sum("adstock") / F.count("*")).alias("k")
    )
    return (
        base.crossJoin(F.broadcast(k))
        .select(
            "day",
            "clicks",
            "rev_cents",
            F.round(F.col("adstock"), 6).alias("adstock"),
            F.round(
                F.col("adstock") / (F.col("adstock") + F.col("k")), 6
            ).alias("saturated"),
        )
    )


ORACLE_ADSTOCK = f"""
ad_d AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS clicks,
         CAST(sum(CASE WHEN event_type = 'purchase'
                  THEN CAST(round(value * 100, 0) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS rev_cents
  FROM events GROUP BY 1
),
ad_a AS (
  SELECT t.day,
         sum(CAST(s.clicks AS DOUBLE)
             / CAST((CAST(1 AS BIGINT) << datediff('day', s.day, t.day))
                    AS DOUBLE)) AS adstock
  FROM ad_d t JOIN ad_d s
    ON s.day <= t.day
   AND datediff('day', s.day, t.day) < {ADSTOCK_WINDOW_DAYS}
  GROUP BY 1
),
ad_k AS (SELECT sum(adstock) / count(*) AS k FROM ad_a),
events_adstock AS (
  SELECT d.day, d.clicks, d.rev_cents,
         round(a.adstock, 6) AS adstock,
         round(a.adstock / (a.adstock + k.k), 6) AS saturated
  FROM ad_d d JOIN ad_a a USING (day), ad_k k
)
"""


def atkinson_index(orders: DataFrame) -> DataFrame:
    """Atkinson inequality index (aversion eps = 1/2) of customer
    revenue — the welfare-grounded member of the inequality family
    beside Gini (ordinal) and Theil (entropy): A = 1 - EDE/mean with
    EDE = (sum sqrt(x)/n)^2, the equally-distributed-equivalent
    income — "society would accept A% less total revenue if it were
    spread evenly". eps=1/2 keeps the generalized mean inside IEEE-
    exact sqrt (no pow), the same exactness posture as the Theil
    x*ln x sums: one customer-grain BIGINT cent agg, one corpus agg
    of sqrt terms, ratios at the rounded edge.

    Output (1 row): n_cust, mean_cents, ede_cents, atkinson (round 6).
    """
    cust = orders.groupBy("o_custkey").agg(
        F.sum(
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
        ).alias("x")
    )
    agg = cust.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.sqrt(F.col("x").cast("double"))).alias("rs"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    ede = (F.col("rs") / F.col("n")) * (F.col("rs") / F.col("n"))
    return agg.select(
        F.col("n").alias("n_cust"),
        F.round(mean, 6).alias("mean_cents"),
        F.round(ede, 6).alias("ede_cents"),
        F.round(F.lit(1.0) - ede / mean, 6).alias("atkinson"),
    )


ORACLE_ATKINSON = """
atk_c AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS x
  FROM orders GROUP BY 1
),
atk_a AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s,
         sum(sqrt(CAST(x AS DOUBLE))) AS rs
  FROM atk_c
),
orders_atkinson AS (
  SELECT n AS n_cust,
         round(CAST(s AS DOUBLE) / n, 6) AS mean_cents,
         round((rs / n) * (rs / n), 6) AS ede_cents,
         round(CAST(1.0 AS DOUBLE)
               - ((rs / n) * (rs / n)) / (CAST(s AS DOUBLE) / n), 6)
           AS atkinson
  FROM atk_a
)
"""


# ---------------------------------------------------------------------------
# (s, S) reorder-policy simulation — integer day-grain fold
# ---------------------------------------------------------------------------

#: replenishment lead time in days (two fixed pipeline slots).
INV_LEAD_DAYS = 2


def reorder_policy_sim(events: DataFrame) -> DataFrame:
    """(s, S) periodic-review inventory simulation replayed over the
    daily purchase-demand series — the dynamic companion to the
    static EOQ / newsvendor / service-level rules: each day arrivals
    land (lead = 2 days), demand ships from stock (lost-sales model),
    and when the inventory POSITION (on hand + on order) falls to the
    reorder point s, an order tops it back up to S. s and S derive
    from the series itself (s = mean daily demand x (lead+1) + 1,
    S = 2s, integer DIV) so the operator is scale-free.

    Every quantity is an INTEGER (units), so the left fold (Spark
    ``aggregate`` over the day-sorted array; DuckDB row-per-step
    recursive CTE with the identical op order) is exact — no float
    enters at any step, the strongest form of the EWMA/Holt/CUSUM
    recursion pattern. The daily series is calendar-bounded; the
    only corpus-sized stage is the per-day demand count.

    Output per day: day, demand, arrived, shipped, short,
    on_hand_end, on_order, ordered_qty.
    """
    lead = INV_LEAD_DAYS
    daily = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("d"))
    )
    stats = daily.agg(
        F.sum("d").alias("tot"), F.count("*").alias("nd")
    )
    base = daily.crossJoin(F.broadcast(stats)).select(
        "day",
        "d",
        F.expr(f"(tot div nd) * {lead + 1} + 1").alias("spt"),
        (F.expr(f"(tot div nd) * {lead + 1} + 1") * 2).alias("sup"),
    )
    arr = base.groupBy("spt", "sup").agg(
        F.expr("array_sort(collect_list(struct(day, d)))").alias("xs")
    )
    oh1 = "(acc.oh + acc.p1)"
    ship = f"least({oh1}, x.d)"
    oh2 = f"({oh1} - {ship})"
    pos = f"({oh2} + acc.p2)"
    q = f"IF({pos} <= spt, sup - {pos}, CAST(0 AS BIGINT))"
    row = (
        f"struct(x.day AS day, x.d AS demand,"
        f" acc.p1 AS arrived, {ship} AS shipped,"
        f" (x.d - {ship}) AS short, {oh2} AS on_hand_end,"
        f" (acc.p2 + {q}) AS on_order, {q} AS ordered_qty)"
    )
    fold = (
        "aggregate(xs,"
        " struct(CAST(sup AS BIGINT) AS oh, CAST(0 AS BIGINT) AS p1,"
        "        CAST(0 AS BIGINT) AS p2,"
        "        CAST(array() AS"
        "          ARRAY<STRUCT<day: DATE, demand: BIGINT,"
        "            arrived: BIGINT, shipped: BIGINT, short: BIGINT,"
        "            on_hand_end: BIGINT, on_order: BIGINT,"
        "            ordered_qty: BIGINT>>) AS rows),"
        f" (acc, x) -> struct({oh2} AS oh, acc.p2 AS p1, {q} AS p2,"
        f"   concat(acc.rows, array({row})) AS rows))"
    )
    return (
        arr.select(F.explode(F.expr(f"{fold}.rows")).alias("r"))
        .select("r.*")
    )


def oracle_reorder_policy(lead: int = INV_LEAD_DAYS) -> str:
    return f"""
iv_daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS d
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
iv_pol AS (
  SELECT CAST((sum(d) // count(*)) * {lead + 1} + 1 AS BIGINT) AS spt,
         CAST(((sum(d) // count(*)) * {lead + 1} + 1) * 2 AS BIGINT)
           AS sup
  FROM iv_daily
),
iv_seq AS (
  SELECT day, d, row_number() OVER (ORDER BY day) AS pos, spt, sup
  FROM iv_daily, iv_pol
),
iv_rec AS (
  SELECT day, d, pos, spt, sup,
         CAST(0 AS BIGINT) AS arrived,
         least(sup, d) AS shipped,
         d - least(sup, d) AS short,
         sup - least(sup, d) AS oh,
         CAST(0 AS BIGINT) AS p1,
         CASE WHEN sup - least(sup, d) <= spt
              THEN sup - (sup - least(sup, d))
              ELSE CAST(0 AS BIGINT) END AS p2
  FROM iv_seq WHERE pos = 1
  UNION ALL
  SELECT s.day, s.d, s.pos, s.spt, s.sup,
         r.p1 AS arrived,
         least(r.oh + r.p1, s.d) AS shipped,
         s.d - least(r.oh + r.p1, s.d) AS short,
         (r.oh + r.p1) - least(r.oh + r.p1, s.d) AS oh,
         r.p2 AS p1,
         CASE WHEN ((r.oh + r.p1) - least(r.oh + r.p1, s.d)) + r.p2
                   <= s.spt
              THEN s.sup
                   - (((r.oh + r.p1) - least(r.oh + r.p1, s.d))
                      + r.p2)
              ELSE CAST(0 AS BIGINT) END AS p2
  FROM iv_rec r JOIN iv_seq s ON s.pos = r.pos + 1
),
orders_reorder_policy AS (
  SELECT day, d AS demand, arrived, shipped, short,
         oh AS on_hand_end, p1 + p2 AS on_order, p2 AS ordered_qty
  FROM iv_rec
)
"""


# ---------------------------------------------------------------------------
# Cox proportional hazards (verified, Breslow ties, Newton on the grid)
# ---------------------------------------------------------------------------

#: Cox covariate bins (engagement views capped at BINS-1) and Newton
#: rounds. The covariate enters as s = x/BINS — exact dyadic, bounded
#: in [0,1), so exp(beta*s) stays O(1) and the 12-dp rounding absorbs
#: cross-engine libm ulp (the logreg sigmoid convention).
COX_BINS = 8
COX_ROUNDS = 4


def cox_ph_train(events: DataFrame) -> DataFrame:
    """Verified Cox proportional-hazards regression of time-to-first-
    purchase on engagement (view count) — the covariate-adjusted
    member that completes the survival family (KM/Nelson-Aalen
    estimate curves, log-rank compares two groups; Cox quantifies a
    continuous covariate's hazard ratio). Subject = user; duration =
    days from first activity to first purchase; users who never
    purchase are right-censored at their last activity day. The
    covariate is the user's total view count (capped bin; includes
    post-purchase views — documented simplification, it is a demo
    covariate, and the oracle mirrors it exactly).

    Breslow tie handling; full Newton-Raphson, COX_ROUNDS unrolled
    iterations identically in the oracle. The corpus collapses ONCE
    to the (t x covariate-bin) exit grid (<= day-span * COX_BINS
    rows, calendar-bounded). Risk sets at each event day te are an
    explicit bounded theta-join ev_days x grid on t >= te (never a
    window, and no bin can go missing from a risk set — every user
    with t >= te is counted whatever day they exit). Each iteration:
    broadcast the 1-row beta, weight by w = round(exp(beta*s), 12)
    with s = x/COX_BINS exact dyadic in [0,1) (so exp stays O(1) and
    the rounding absorbs cross-engine libm ulp), reduce to per-day
    S0/S1/S2, fold the score U = sum_t [s_sum_t - d_t*S1/S0] and
    information I = sum_t d_t*(S2/S0 - (S1/S0)^2); update
    beta' = round(beta + U/I, 9) — cross-round state exactly equal
    in both engines (the logreg_train discipline).

    Scale: iteration cost is independent of corpus size (constant
    grid); the only corpus-sized stages are the two user-grain aggs.
    Output per round: round, beta, score_u, fisher_i, hazard_ratio
    (exp(beta) for the full s=1 engagement span, round 6).
    """
    purchases = events.filter(
        F.col("event_type") == "purchase"
    ).groupBy("user_id").agg(F.min(F.to_date("ts")).alias("dp"))
    spans = events.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("d0"),
        F.max(F.to_date("ts")).alias("d1"),
        F.sum(
            F.when(F.col("event_type") == "view", 1).otherwise(0)
        ).alias("views"),
    )
    users = spans.join(purchases, "user_id", "left").select(
        F.when(
            F.col("dp").isNotNull(), F.datediff("dp", "d0")
        ).otherwise(F.datediff("d1", "d0")).alias("t"),
        F.least(F.col("views"), F.lit(COX_BINS - 1))
        .cast("int")
        .alias("x"),
        F.col("dp").isNotNull().cast("int").alias("event"),
    )
    cell = (
        users.groupBy("t", "x")
        .agg(
            F.count("*").alias("n_exit"),
            F.sum("event").alias("n_event"),
        )
        .localCheckpoint(eager=True)  # calendar x bins grid
    )
    s = F.col("x").cast("double") / F.lit(float(COX_BINS))
    ev = (
        cell.groupBy("t")
        .agg(
            F.sum("n_event").alias("d"),
            F.sum(F.col("n_event") * s).alias("s_sum"),
        )
        .filter(F.col("d") > 0)
        .select(F.col("t").alias("te"), "d", "s_sum")
        .localCheckpoint(eager=True)
    )
    # bounded risk-set expansion: every grid cell joins every event
    # day it is at risk for (|ev_days| x |grid| rows, both
    # calendar/bin-bounded)
    risk = (
        ev.select("te")
        .join(
            cell.select("t", "x", "n_exit"),
            F.col("t") >= F.col("te"),
        )
        .groupBy("te", "x")
        .agg(F.sum("n_exit").alias("r"))
        .localCheckpoint(eager=True)
    )
    beta = None  # 1-row (beta)
    out = None
    for rnd in range(1, COX_ROUNDS + 1):
        src_df = (
            risk.select("*", F.lit(0.0).alias("beta"))
            if beta is None
            else risk.crossJoin(F.broadcast(beta.select("beta")))
        )
        w = F.round(F.exp(F.col("beta") * s), 12)
        day = src_df.groupBy("te").agg(
            F.sum(F.col("r") * w).alias("s0"),
            F.sum(F.col("r") * s * w).alias("s1"),
            F.sum(F.col("r") * s * s * w).alias("s2"),
            F.first("beta").alias("beta"),
        )
        terms = day.join(ev, "te").select(
            "beta",
            (
                F.col("s_sum") - F.col("d") * F.col("s1") / F.col("s0")
            ).alias("u_t"),
            (
                F.col("d")
                * (
                    F.col("s2") / F.col("s0")
                    - (F.col("s1") / F.col("s0"))
                    * (F.col("s1") / F.col("s0"))
                )
            ).alias("i_t"),
        )
        stat = terms.agg(
            F.first("beta").alias("beta_prev"),
            F.sum("u_t").alias("u"),
            F.sum("i_t").alias("i"),
        )
        beta = stat.select(
            F.round(
                F.col("beta_prev") + F.col("u") / F.col("i"), 9
            ).alias("beta"),
            F.col("u").alias("u"),
            F.col("i").alias("i"),
        ).localCheckpoint(eager=True)
        row = beta.select(
            F.lit(rnd).alias("round"),
            "beta",
            F.round(F.col("u"), 6).alias("score_u"),
            F.round(F.col("i"), 6).alias("fisher_i"),
            F.round(F.exp("beta"), 6).alias("hazard_ratio"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def oracle_cox_ph(
    bins: int = COX_BINS, rounds: int = COX_ROUNDS
) -> str:
    sx = f"(CAST(x AS DOUBLE) / {bins})"
    ctes = [
        f"""
cox_u AS (
  SELECT CASE WHEN p.dp IS NOT NULL
              THEN date_diff('day', s.d0, p.dp)
              ELSE date_diff('day', s.d0, s.d1) END AS t,
         CAST(least(s.views, {bins - 1}) AS INT) AS x,
         CAST(p.dp IS NOT NULL AS INT) AS event
  FROM (SELECT user_id, min(CAST(ts AS DATE)) AS d0,
               max(CAST(ts AS DATE)) AS d1,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0
                        END) AS BIGINT) AS views
        FROM events GROUP BY 1) s
  LEFT JOIN (SELECT user_id, min(CAST(ts AS DATE)) AS dp
             FROM events WHERE event_type = 'purchase'
             GROUP BY 1) p USING (user_id)
)""",
        """
cox_cell AS MATERIALIZED (
  SELECT t, x, CAST(count(*) AS BIGINT) AS n_exit,
         CAST(sum(event) AS BIGINT) AS n_event
  FROM cox_u GROUP BY 1, 2
)""",
        f"""
cox_ev AS MATERIALIZED (
  SELECT t AS te, CAST(sum(n_event) AS BIGINT) AS d,
         sum(n_event * {sx}) AS s_sum
  FROM cox_cell GROUP BY 1
  HAVING sum(n_event) > 0
)""",
        """
cox_risk AS MATERIALIZED (
  SELECT e.te, c.x, CAST(sum(c.n_exit) AS BIGINT) AS r
  FROM cox_ev e JOIN cox_cell c ON c.t >= e.te
  GROUP BY 1, 2
)""",
        """
cox_b0 AS (SELECT CAST(0.0 AS DOUBLE) AS beta)""",
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"""
cox_day{r} AS (
  SELECT te,
         sum(r * round(exp(b.beta * {sx}), 12)) AS s0,
         sum(r * {sx} * round(exp(b.beta * {sx}), 12)) AS s1,
         sum(r * {sx} * {sx} * round(exp(b.beta * {sx}), 12)) AS s2,
         any_value(b.beta) AS beta
  FROM cox_risk, cox_b{r - 1} b
  GROUP BY te
)""",
        )
        ctes.append(
            f"""
cox_b{r} AS MATERIALIZED (
  SELECT round(any_value(beta)
               + sum(s_sum - d * s1 / s0)
               / sum(d * (s2 / s0 - (s1 / s0) * (s1 / s0))), 9)
           AS beta,
         sum(s_sum - d * s1 / s0) AS u,
         sum(d * (s2 / s0 - (s1 / s0) * (s1 / s0))) AS i
  FROM cox_day{r} JOIN cox_ev USING (te)
)"""
        )
    arms = "\n  UNION ALL\n".join(
        f"  SELECT CAST({r} AS INT) AS round, beta,"
        f" round(u, 6) AS score_u, round(i, 6) AS fisher_i,"
        f" round(exp(beta), 6) AS hazard_ratio FROM cox_b{r}"
        for r in range(1, rounds + 1)
    )
    ctes.append(f"""
cox_ph_train AS (
{arms}
)""")
    return ",".join(ctes)


# ---------------------------------------------------------------------------
# SPRT sequential conversion monitor (Wald boundaries)
# ---------------------------------------------------------------------------

#: SPRT hypotheses and error rates: is the purchase share among
#: click/purchase events p0 (null) or p1 (alternative)? The four
#: log-constants are computed ONCE in Python and injected as
#: identical double literals into both engines, so the per-day LLR
#: is bitwise-identical IEEE arithmetic on exact integer counts — no
#: cross-engine ln() ever runs.
SPRT_P0 = 0.25
SPRT_P1 = 0.30
SPRT_ALPHA = 0.05
SPRT_BETA = 0.20
SPRT_L1 = math.log(SPRT_P1 / SPRT_P0)
SPRT_L0 = math.log((1 - SPRT_P1) / (1 - SPRT_P0))
SPRT_UPPER = math.log((1 - SPRT_BETA) / SPRT_ALPHA)
SPRT_LOWER = math.log(SPRT_BETA / (1 - SPRT_ALPHA))


def sprt_monitor(events: DataFrame) -> DataFrame:
    """Wald's sequential probability ratio test as a daily monitor:
    each click/purchase event is a Bernoulli trial (success =
    purchase), and the cumulative log-likelihood ratio
    llr = S*ln(p1/p0) + (N-S)*ln(q1/q0) is checked daily against the
    Wald boundaries ln((1-beta)/alpha) / ln(beta/(1-alpha)) — the
    always-valid sequential sibling of the fixed-horizon
    `conversion_ztest` and the group-sequential OBF plan (SPRT stops
    the moment the evidence suffices, with both error rates
    controlled by construction).

    Exactness: daily (n, s) are integers; the ln constants are
    Python-computed double literals injected identically into both
    engines, so llr is the same two IEEE multiplies and one add
    everywhere — no engine libm in the plan. Cumulative counts come
    from a bounded day x day prefix self-join (calendar grain, the
    changepoint convention — no window).

    Output per day: day, n_cum, s_cum, llr (round 6), decision
    ('accept_h1' / 'accept_h0' / 'continue').
    """
    daily = events.filter(
        F.col("event_type").isin("click", "purchase")
    ).groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").alias("n"),
        F.sum(
            (F.col("event_type") == "purchase").cast("int")
        ).alias("s"),
    ).localCheckpoint(eager=True)
    cum = (
        daily.alias("a")
        .join(daily.alias("b"), F.col("b.day") <= F.col("a.day"))
        .groupBy(F.col("a.day").alias("day"))
        .agg(
            F.sum("b.n").alias("n_cum"),
            F.sum("b.s").alias("s_cum"),
        )
    )
    llr = F.col("s_cum") * F.lit(SPRT_L1) + (
        F.col("n_cum") - F.col("s_cum")
    ) * F.lit(SPRT_L0)
    return cum.select(
        "day",
        "n_cum",
        "s_cum",
        F.round(llr, 6).alias("llr"),
        F.when(llr >= F.lit(SPRT_UPPER), F.lit("accept_h1"))
        .when(llr <= F.lit(SPRT_LOWER), F.lit("accept_h0"))
        .otherwise(F.lit("continue"))
        .alias("decision"),
    )


ORACLE_SPRT = f"""
sprt_d AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                  END) AS BIGINT) AS s
  FROM events WHERE event_type IN ('click', 'purchase')
  GROUP BY 1
),
sprt_c AS (
  SELECT a.day, CAST(sum(b.n) AS BIGINT) AS n_cum,
         CAST(sum(b.s) AS BIGINT) AS s_cum
  FROM sprt_d a JOIN sprt_d b ON b.day <= a.day
  GROUP BY 1
),
sprt_monitor AS (
  SELECT day, n_cum, s_cum,
         round(s_cum * CAST({SPRT_L1!r} AS DOUBLE)
               + (n_cum - s_cum) * CAST({SPRT_L0!r} AS DOUBLE), 6)
           AS llr,
         CASE WHEN s_cum * CAST({SPRT_L1!r} AS DOUBLE)
                   + (n_cum - s_cum) * CAST({SPRT_L0!r} AS DOUBLE)
                   >= CAST({SPRT_UPPER!r} AS DOUBLE)
              THEN 'accept_h1'
              WHEN s_cum * CAST({SPRT_L1!r} AS DOUBLE)
                   + (n_cum - s_cum) * CAST({SPRT_L0!r} AS DOUBLE)
                   <= CAST({SPRT_LOWER!r} AS DOUBLE)
              THEN 'accept_h0'
              ELSE 'continue' END AS decision
  FROM sprt_c
)
"""


# ---------------------------------------------------------------------------
# Poisson overdispersion test (dispersion index on per-user counts)
# ---------------------------------------------------------------------------


def overdispersion_test(events: DataFrame) -> DataFrame:
    """Poisson overdispersion check on per-user purchase counts — the
    gate before trusting the verified Poisson GLM's standard errors
    (count data whose variance exceeds its mean needs a negative-
    binomial or quasi-Poisson treatment; this measures the excess
    instead of assuming it away). Dispersion index D = s^2/mean with
    the chi-square/normal approximation z = (D-1)*sqrt((n-1)/2).

    Exactness: the corpus reduces to three exact integers (n, sum c,
    sum c^2); mean and variance are single divisions of exact
    integer expressions (var numerator n*S2 - S1^2 is pure BIGINT-in-
    DECIMAL), so both engines divide the same two integers once and
    round 6.

    Output (1 row): n_users, mean_count, var_count, dispersion_index,
    z_score, overdispersed (z > 1.645, one-sided 5%).
    """
    per_user = events.groupBy("user_id").agg(
        F.sum(
            (F.col("event_type") == "purchase").cast("int")
        ).alias("c")
    )
    agg = per_user.agg(
        F.count("*").alias("n"),
        F.sum("c").alias("s1"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
    )
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    var_num = dec(F.col("n")) * dec(F.col("s2")) - dec(
        F.col("s1")
    ) * dec(F.col("s1"))
    var_den = dec(F.col("n")) * dec(F.col("n") - 1)
    mean = F.col("s1").cast("double") / F.col("n").cast("double")
    var = var_num.cast("double") / var_den.cast("double")
    d_idx = var / mean
    z = (d_idx - F.lit(1.0)) * F.sqrt(
        (F.col("n") - 1).cast("double") / F.lit(2.0)
    )
    return agg.select(
        F.col("n").alias("n_users"),
        F.round(mean, 6).alias("mean_count"),
        F.round(var, 6).alias("var_count"),
        F.round(d_idx, 6).alias("dispersion_index"),
        F.round(z, 6).alias("z_score"),
        (F.round(z, 6) > 1.645).alias("overdispersed"),
    )


ORACLE_OVERDISPERSION = """
od_u AS (
  SELECT CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                  END) AS BIGINT) AS c
  FROM events GROUP BY user_id
),
od_a AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(c) AS BIGINT) AS s1,
         CAST(sum(c * c) AS BIGINT) AS s2
  FROM od_u
),
overdispersion_test AS (
  SELECT n AS n_users,
         round(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 6)
           AS mean_count,
         round(CAST(CAST(n AS HUGEINT) * s2
                    - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
               / CAST(CAST(n AS HUGEINT) * (n - 1) AS DOUBLE), 6)
           AS var_count,
         round((CAST(CAST(n AS HUGEINT) * s2
                     - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
                / CAST(CAST(n AS HUGEINT) * (n - 1) AS DOUBLE))
               / (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)), 6)
           AS dispersion_index,
         round(((CAST(CAST(n AS HUGEINT) * s2
                      - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
                 / CAST(CAST(n AS HUGEINT) * (n - 1) AS DOUBLE))
                / (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) - 1.0)
               * sqrt(CAST(n - 1 AS DOUBLE) / 2.0), 6) AS z_score,
         round(((CAST(CAST(n AS HUGEINT) * s2
                      - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
                 / CAST(CAST(n AS HUGEINT) * (n - 1) AS DOUBLE))
                / (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) - 1.0)
               * sqrt(CAST(n - 1 AS DOUBLE) / 2.0), 6) > 1.645
           AS overdispersed
  FROM od_a
)
"""


# ---------------------------------------------------------------------------
# distribution-free median confidence interval (order-statistic ranks)
# ---------------------------------------------------------------------------


def median_ci(events: DataFrame) -> DataFrame:
    """Distribution-free 95% confidence interval for the median
    purchase value via order-statistic ranks — the nonparametric
    answer the idea ledger's exact-binomial version (rejected:
    astronomic binomials) approximates: ranks l = floor(n/2 -
    0.98*sqrt(n)) and u = ceil(n/2 + 1 + 0.98*sqrt(n)) bracket the
    median with ~95% coverage (normal approximation to Binomial(n,
    1/2); 0.98 = z/2), clamped to [1, n].

    Cross-engine exactness: ranks are floor/ceil of the same IEEE
    expression on the exact integer n (identical in both engines);
    each order statistic is then "min value whose cumulative count
    reaches the rank" on the cent grain — the KS bucketed-prefix-sum
    shape, integers all the way.

    Output (1 row): n, median_cents, ci_lo_cents, ci_hi_cents.
    """
    ev = events.filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    ).select(
        F.round(F.col("value") * 100, 0).cast("bigint").alias("v")
    )
    per_value = ev.groupBy("v").agg(F.count("*").alias("c")).withColumn(
        "bucket", F.floor(F.col("v") / 100)
    )
    btot = per_value.groupBy("bucket").agg(F.sum("c").alias("bc"))
    offsets = _rank.bucket_prefix_offsets(
        btot, "bucket", ["bc"]
    ).select("bucket", F.col("_off_bc").alias("off"))
    win = Window.partitionBy("bucket").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = per_value.join(F.broadcast(offsets), "bucket").select(
        "v", (F.col("off") + F.sum("c").over(win)).alias("cum")
    )
    tot = ev.agg(F.count("*").alias("n"))
    nd = F.col("n").cast("double")
    ranks = tot.select(
        "n",
        F.greatest(
            F.floor(nd / 2 - F.lit(0.98) * F.sqrt(nd)), F.lit(1)
        ).cast("bigint").alias("r_lo"),
        F.least(
            F.ceil(nd / 2 + 1 + F.lit(0.98) * F.sqrt(nd)),
            F.col("n"),
        ).cast("bigint").alias("r_hi"),
        ((F.col("n") + 1) / 2).cast("bigint").alias("r_med"),
    )
    j = cum.crossJoin(F.broadcast(ranks))
    pick = lambda r: F.min(  # noqa: E731
        F.when(F.col("cum") >= F.col(r), F.col("v"))
    )
    return j.groupBy("n").agg(
        pick("r_med").alias("median_cents"),
        pick("r_lo").alias("ci_lo_cents"),
        pick("r_hi").alias("ci_hi_cents"),
    )


ORACLE_MEDIAN_CI = """
mci_v AS (
  SELECT CAST(round(value * 100, 0) AS BIGINT) AS v,
         CAST(count(*) AS BIGINT) AS c
  FROM events
  WHERE event_type = 'purchase' AND value IS NOT NULL
  GROUP BY 1
),
mci_c AS (
  SELECT v, CAST(sum(c) OVER (ORDER BY v
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM mci_v
),
mci_t AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM mci_v),
mci_r AS (
  SELECT n,
         greatest(CAST(floor(CAST(n AS DOUBLE) / 2
                  - 0.98 * sqrt(CAST(n AS DOUBLE))) AS BIGINT), 1)
           AS r_lo,
         least(CAST(ceil(CAST(n AS DOUBLE) / 2 + 1
                  + 0.98 * sqrt(CAST(n AS DOUBLE))) AS BIGINT), n)
           AS r_hi,
         (n + 1) // 2 AS r_med
  FROM mci_t
),
median_ci AS (
  SELECT r.n,
         min(CASE WHEN c.cum >= r.r_med THEN c.v END) AS median_cents,
         min(CASE WHEN c.cum >= r.r_lo THEN c.v END) AS ci_lo_cents,
         min(CASE WHEN c.cum >= r.r_hi THEN c.v END) AS ci_hi_cents
  FROM mci_c c, mci_r r
  GROUP BY r.n
)
"""


# ---------------------------------------------------------------------------
# Cochran-Armitage trend test (conversion vs ordered engagement)
# ---------------------------------------------------------------------------


def trend_test(events: DataFrame) -> DataFrame:
    """Cochran-Armitage test for TREND in conversion across ordered
    engagement bins — the dose-response question the plain chi-square
    independence test wastes power on (chi2 sees any deviation; CA
    targets the monotone alternative a funnel owner actually cares
    about). Exposure score = capped view-count bin 0..7, outcome =
    converted (any purchase).

    Numerator A = sum_i x_i*(y_i*N - n_i*R) is pure integer
    (DECIMAL(38,0)/HUGEINT); Var(A/N) = R*(N-R)*C/N^3 with
    C = N*sum(n*x^2) - (sum n*x)^2 also integer-exact, evaluated as
    the same IEEE double product chain in both engines; z =
    (A/N)/sqrt(Var) is one rounded division (round 6). One
    user-grain pass + one 8-row bin agg.

    Output (1 row): n_users, n_converted, z_trend, increasing
    (z > 1.645 one-sided).
    """
    per_user = events.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "view", 1).otherwise(0)
        ).alias("views"),
        F.max(
            (F.col("event_type") == "purchase").cast("int")
        ).alias("y"),
    )
    bins = per_user.select(
        F.least(F.col("views"), F.lit(7)).cast("int").alias("x"), "y"
    ).groupBy("x").agg(
        F.count("*").alias("n"), F.sum("y").alias("yy")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = bins.agg(
        F.sum("n").alias("nn"),
        F.sum("yy").alias("rr"),
        F.sum(dec(F.col("x")) * dec(F.col("yy"))).alias("sxy"),
        F.sum(dec(F.col("x")) * dec(F.col("n"))).alias("sxn"),
        F.sum(
            dec(F.col("x")) * dec(F.col("x")) * dec(F.col("n"))
        ).alias("sxxn"),
    )
    a_num = dec(F.col("sxy")) * dec(F.col("nn")) - dec(
        F.col("sxn")
    ) * dec(F.col("rr"))
    c_term = (
        dec(F.col("nn")) * dec(F.col("sxxn"))
        - dec(F.col("sxn")) * dec(F.col("sxn"))
    ).cast("double")
    var = (
        F.col("rr").cast("double")
        * (F.col("nn") - F.col("rr")).cast("double")
        / F.col("nn").cast("double")
        * c_term
        / F.col("nn").cast("double")
        / F.col("nn").cast("double")
    )
    z = a_num.cast("double") / F.col("nn").cast("double") / F.sqrt(var)
    return agg.select(
        F.col("nn").alias("n_users"),
        F.col("rr").alias("n_converted"),
        F.round(z, 6).alias("z_trend"),
        (F.round(z, 6) > 1.645).alias("increasing"),
    )


ORACLE_TREND_TEST = """
tt_u AS (
  SELECT CAST(least(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0
                        END), 7) AS INT) AS x,
         CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                  END) AS BIGINT) AS y
  FROM events GROUP BY user_id
),
tt_b AS (
  SELECT x, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT)
           AS yy
  FROM tt_u GROUP BY 1
),
tt_a AS (
  SELECT CAST(sum(n) AS BIGINT) AS nn,
         CAST(sum(yy) AS BIGINT) AS rr,
         CAST(sum(CAST(x AS HUGEINT) * yy) AS HUGEINT) AS sxy,
         CAST(sum(CAST(x AS HUGEINT) * n) AS HUGEINT) AS sxn,
         CAST(sum(CAST(x AS HUGEINT) * x * n) AS HUGEINT) AS sxxn
  FROM tt_b
),
trend_test AS (
  SELECT nn AS n_users, rr AS n_converted,
         round((CAST(sxy * nn - sxn * rr AS DOUBLE)
                / CAST(nn AS DOUBLE))
               / sqrt(CAST(rr AS DOUBLE)
                      * CAST(nn - rr AS DOUBLE) / CAST(nn AS DOUBLE)
                      * CAST(nn * sxxn - sxn * sxn AS DOUBLE)
                      / CAST(nn AS DOUBLE) / CAST(nn AS DOUBLE)),
               6) AS z_trend,
         round((CAST(sxy * nn - sxn * rr AS DOUBLE)
                / CAST(nn AS DOUBLE))
               / sqrt(CAST(rr AS DOUBLE)
                      * CAST(nn - rr AS DOUBLE) / CAST(nn AS DOUBLE)
                      * CAST(nn * sxxn - sxn * sxn AS DOUBLE)
                      / CAST(nn AS DOUBLE) / CAST(nn AS DOUBLE)),
               6) > 1.645 AS increasing
  FROM tt_a
)
"""


# ---------------------------------------------------------------------------
# Kendall tau-b trend on the daily revenue series
# ---------------------------------------------------------------------------


def kendall_tau_daily(events: DataFrame) -> DataFrame:
    """Kendall tau-b rank correlation between calendar day and daily
    purchase revenue — the pair-counting twin of ``events_spearman``
    (which ranks): the normalized -1..1 CORRELATION COEFFICIENT with
    exact tie handling that the sibling ``events_robust_trend``
    (Mann-Kendall S + tie-corrected z + Theil-Sen slope) does not
    emit; its z_mk here is the textbook no-tie-correction form, kept
    beside tau_b because the two share the same three integers.

    EXACT INTEGER pair counting: the day-grain series (calendar-
    bounded, ~365 rows/year at ANY data scale) self-joins on
    d1 < d2 and every pair is classified concordant / discordant /
    revenue-tied by integer cent comparison — C, D, T are exact
    BIGINTs in both engines. Days are distinct so the x-tie term
    vanishes and tau_b = (C-D)/sqrt(n0*(n0-T)) with n0 = C+D+T; the
    Mann-Kendall normal z = (C-D)/sqrt(n(n-1)(2n+5)/18) shares the
    same integers. Both are one rounded division (round 6).

    Scale shape: ONE map-side-combinable day agg over the fact table
    is the only corpus-sized stage; the pair join is calendar² —
    bounded work forever. Output (1 row): n_days, concordant,
    discordant, tied_pairs, tau_b, z_mk, trending.
    """
    daily = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
            .alias("rev")
        )
    )
    a = daily.select(F.col("d").alias("d1"), F.col("rev").alias("r1"))
    b = daily.select(F.col("d").alias("d2"), F.col("rev").alias("r2"))
    pairs = a.join(b, F.col("d1") < F.col("d2"))
    m = pairs.agg(
        F.sum((F.col("r2") > F.col("r1")).cast("bigint")).alias("c"),
        F.sum((F.col("r2") < F.col("r1")).cast("bigint")).alias("dd"),
        F.sum((F.col("r2") == F.col("r1")).cast("bigint")).alias("t"),
    ).crossJoin(daily.agg(F.count("*").alias("nd")))
    n0 = F.col("c") + F.col("dd") + F.col("t")
    num = (F.col("c") - F.col("dd")).cast("double")
    tau = num / F.sqrt(
        n0.cast("double") * (n0 - F.col("t")).cast("double")
    )
    ndd = F.col("nd").cast("double")
    z = num / F.sqrt(
        ndd * (ndd - 1) * (2 * ndd + 5) / 18
    )
    return m.select(
        F.col("nd").alias("n_days"),
        F.col("c").alias("concordant"),
        F.col("dd").alias("discordant"),
        F.col("t").alias("tied_pairs"),
        F.round(tau, 6).alias("tau_b"),
        F.round(z, 6).alias("z_mk"),
        (F.abs(F.round(z, 6)) > 1.96).alias("trending"),
    )


ORACLE_KENDALL = """
kt_d AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS rev
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
kt_m AS (
  SELECT CAST(sum(CASE WHEN b.rev > a.rev THEN 1 ELSE 0 END)
              AS BIGINT) AS c,
         CAST(sum(CASE WHEN b.rev < a.rev THEN 1 ELSE 0 END)
              AS BIGINT) AS dd,
         CAST(sum(CASE WHEN b.rev = a.rev THEN 1 ELSE 0 END)
              AS BIGINT) AS t,
         (SELECT CAST(count(*) AS BIGINT) FROM kt_d) AS nd
  FROM kt_d a JOIN kt_d b ON a.d < b.d
),
kendall_tau_daily AS (
  SELECT nd AS n_days, c AS concordant, dd AS discordant,
         t AS tied_pairs,
         round(CAST(c - dd AS DOUBLE)
               / sqrt(CAST(c + dd + t AS DOUBLE)
                      * CAST(c + dd + t - t AS DOUBLE)), 6) AS tau_b,
         round(CAST(c - dd AS DOUBLE)
               / sqrt(CAST(nd AS DOUBLE) * (CAST(nd AS DOUBLE) - 1)
                      * (2 * CAST(nd AS DOUBLE) + 5) / 18), 6)
           AS z_mk,
         abs(round(CAST(c - dd AS DOUBLE)
               / sqrt(CAST(nd AS DOUBLE) * (CAST(nd AS DOUBLE) - 1)
                      * (2 * CAST(nd AS DOUBLE) + 5) / 18), 6)) > 1.96
           AS trending
  FROM kt_m
)
"""


# ---------------------------------------------------------------------------
# shared octave-bucket prefix kernel for the cent-grain rank family
# ---------------------------------------------------------------------------


def _cent_prefix(
    vg: DataFrame,
    sum_cols: list,
    value_col: str = "c",
    inclusive: bool = False,
    group_cols: tuple = (),
) -> DataFrame:
    """Octave-bucket prefix sums over a value-grain table with ZERO
    global windows — the one home for the kernel the rank-test
    family (Kruskal-Wallis, Mood, Ansari-Bradley, quartiles, energy
    distance) previously repeated inline (round-6 review
    consolidation). Sign-safe floor(log2) buckets (data-independent
    <= ~48 octaves at any value range) get exclusive offsets via
    ``ranking.bucket_prefix_offsets``; within-octave prefixes ride a
    PARTITIONED window. Returns the input columns plus ``_pre_{col}``
    = sum of col over values strictly BELOW (or up to, when
    ``inclusive``) this row's value.

    With ``group_cols`` the prefixes run INDEPENDENTLY per group
    (Brown-Forsythe's per-type medians): bucket totals and offsets
    are keyed by (group, bucket) — offsets ride a bucket-grain
    window partitioned by group (<= ~48 rows per group), the
    within-octave window partitions by (group, bucket). The
    ungrouped path is byte-identical to before (round-7 review:
    don't fork the kernel).

    Callers must drop NULL values upstream: a NULL value key would
    fall out of the bucket equi-join and silently vanish from every
    prefix while the DuckDB oracles' plain windows still count it
    (review finding) — the query-level IS NOT NULL filters keep both
    engines counting the same rows.
    """
    v = F.col(value_col)
    bkt = (
        F.when(v >= 0, F.floor(F.log2(v + 1)))
        .otherwise(-1 - F.floor(F.log2(-v)))
        .cast("bigint")
    )
    vgb = vg.select("*", bkt.alias("bucket"))
    gcols = list(group_cols)
    btot = vgb.groupBy(*gcols, "bucket").agg(
        *[F.sum(c).alias(c) for c in sum_cols]
    )
    if gcols:
        woff = (
            Window.partitionBy(*gcols)
            .orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        offs = btot.select(
            *gcols,
            "bucket",
            *[
                F.coalesce(F.sum(c).over(woff), F.lit(0)).alias(
                    f"_off_{c}"
                )
                for c in sum_cols
            ],
        )
    else:
        offs = _rank.bucket_prefix_offsets(btot, "bucket", sum_cols)
    w_in = (
        Window.partitionBy(*gcols, "bucket")
        .orderBy(value_col)
        .rowsBetween(
            Window.unboundedPreceding, 0 if inclusive else -1
        )
    )
    out = [
        (
            F.col(f"_off_{c}")
            + F.coalesce(F.sum(c).over(w_in), F.lit(0))
        ).alias(f"_pre_{c}")
        for c in sum_cols
    ]
    return vgb.join(F.broadcast(offs), gcols + ["bucket"]).select(
        *vg.columns, *out
    )


# ---------------------------------------------------------------------------
# Kruskal-Wallis H test (k-group rank test with exact tie handling)
# ---------------------------------------------------------------------------

#: chi-square critical value at alpha=.05 for df = k-1 = 4 groups.
KRUSKAL_CHI2_CRIT_05 = 9.487729


def kruskal_wallis(events: DataFrame) -> DataFrame:
    """Kruskal-Wallis H test of event value across the five event
    types — the k-group generalization of ``events_mannwhitney``
    (rank-based, outlier-immune) beside the parametric
    ``events_anova``. Ranks use the exact mid-rank tie convention.

    EXACT INTEGER ranks with zero global windows: values collapse to
    cent-grain (value, count) rows; the exclusive prefix count below
    each distinct value comes from the octave-bucket rank kernel —
    floor(log2) buckets (data-independent <= ~48 octaves at any
    scale) get exclusive offsets via ``ranking.bucket_prefix_offsets``
    (packed-array prefix sums, no WindowExec) and within-octave
    prefixes via a PARTITIONED window over the cent-grain rows, the
    same shape the verdict blessed for ``nb_pr_curve``. The doubled
    mid-rank 2r(v) = 2*pre(v) + cnt(v) + 1 is integer, so each
    group's doubled rank-sum R2_g = sum n_gv * 2r(v) is an exact
    DECIMAL(38,0) (HUGEINT in the oracle), as are the tie term
    T = sum(t^3 - t) and N. H and its tie correction assemble from
    the k=5 group rows in doubles (fold noise ~5 ulp, far below the
    6-dp edge), mirroring the ANOVA convention.

    Scale shape: one cent-grain hash-agg over the fact table is the
    only corpus-sized stage; everything after runs on cent-grain and
    5-row frames. Output (1 row): k, n, h_stat, h_tie_adj,
    significant.
    """
    cg = events.filter(F.col("value").isNotNull()).select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("c"),
    )
    tg = cg.groupBy("event_type", "c").agg(
        F.count("*").alias("ntc")
    )
    vg = tg.groupBy("c").agg(F.sum("ntc").alias("cnt"))
    pre = _cent_prefix(vg, ["cnt"]).select(
        "c", "cnt", F.col("_pre_cnt").alias("pre")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    r = (
        tg.join(pre, "c")
        .groupBy("event_type")
        .agg(
            F.sum("ntc").alias("ng"),
            F.sum(
                dec(F.col("ntc"))
                * dec(2 * F.col("pre") + F.col("cnt") + 1)
            ).alias("r2"),
        )
    )
    t = vg.agg(
        F.sum(
            dec(F.col("cnt")) * dec(F.col("cnt")) * dec(F.col("cnt"))
            - dec(F.col("cnt"))
        ).alias("tt"),
        F.sum("cnt").alias("nn"),
    )
    m = r.agg(
        F.count("*").alias("k"),
        F.sum(
            F.col("r2").cast("double")
            * F.col("r2").cast("double")
            / (4 * F.col("ng").cast("double"))
        ).alias("t1"),
    ).crossJoin(t)
    nd = F.col("nn").cast("double")
    h = 12 * F.col("t1") / (nd * (nd + 1)) - 3 * (nd + 1)
    corr = 1 - F.col("tt").cast("double") / (nd * nd * nd - nd)
    hadj = h / corr
    return m.select(
        "k",
        F.col("nn").alias("n"),
        F.round(h, 6).alias("h_stat"),
        F.round(hadj, 6).alias("h_tie_adj"),
        (F.round(hadj, 6) > KRUSKAL_CHI2_CRIT_05).alias(
            "significant"
        ),
    )


ORACLE_KRUSKAL = f"""
kw_c AS (
  SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL
),
kw_tg AS (
  SELECT event_type, c, CAST(count(*) AS BIGINT) AS ntc
  FROM kw_c GROUP BY 1, 2
),
kw_vg AS (
  SELECT c, CAST(sum(ntc) AS BIGINT) AS cnt FROM kw_tg GROUP BY 1
),
kw_pre AS (
  SELECT c, cnt,
         CAST(coalesce(sum(cnt) OVER (ORDER BY c
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS pre
  FROM kw_vg
),
kw_r AS (
  SELECT t.event_type, CAST(sum(t.ntc) AS BIGINT) AS ng,
         CAST(sum(CAST(t.ntc AS HUGEINT)
                  * (2 * p.pre + p.cnt + 1)) AS HUGEINT) AS r2
  FROM kw_tg t JOIN kw_pre p ON t.c = p.c GROUP BY 1
),
kw_t AS (
  SELECT CAST(sum(CAST(cnt AS HUGEINT) * cnt * cnt - cnt)
              AS HUGEINT) AS tt,
         CAST(sum(cnt) AS BIGINT) AS nn
  FROM kw_vg
),
kw_m AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM kw_r) AS k,
         (SELECT sum(CAST(r2 AS DOUBLE) * CAST(r2 AS DOUBLE)
                     / (4 * CAST(ng AS DOUBLE))) FROM kw_r) AS t1,
         tt, nn
  FROM kw_t
),
kruskal_wallis AS (
  SELECT k, nn AS n,
         round(12 * t1 / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE)
               + 1)) - 3 * (CAST(nn AS DOUBLE) + 1), 6) AS h_stat,
         round((12 * t1 / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE)
               + 1)) - 3 * (CAST(nn AS DOUBLE) + 1))
               / (1 - CAST(tt AS DOUBLE)
                  / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)
                     * CAST(nn AS DOUBLE) - CAST(nn AS DOUBLE))), 6)
           AS h_tie_adj,
         round((12 * t1 / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE)
               + 1)) - 3 * (CAST(nn AS DOUBLE) + 1))
               / (1 - CAST(tt AS DOUBLE)
                  / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)
                     * CAST(nn AS DOUBLE) - CAST(nn AS DOUBLE))), 6)
           > {KRUSKAL_CHI2_CRIT_05} AS significant
  FROM kw_m
)
"""


# ---------------------------------------------------------------------------
# Levene's test (variance homogeneity across the k groups)
# ---------------------------------------------------------------------------


def levene_test(events: DataFrame) -> DataFrame:
    """Levene's test for homogeneity of variance of event value
    across the five event types — the formal inferential test beside
    the Hartley Fmax screen (``events_variance_ratio``): where Fmax
    just ratios the extreme variances, Levene runs a one-way ANOVA F
    on the absolute deviations z_i = |x_i - mean(group)|, giving an
    actual F-distributed statistic that tolerates non-normal tails.

    EXACT INTEGER deviations with no rational rounding: the group
    mean s_g/n_g never materializes — each deviation is carried as
    the integer numerator |c_i * n_g - s_g| over the implicit
    denominator n_g, so the per-group moments Z_g = sum|.| and
    Q_g = sum(.)^2 are exact DECIMAL(38,0)/HUGEINT. The F statistic
    then assembles from the k=5 group rows in doubles
    (SSB = sum Z_g^2/n_g^3 - (sum Z_g/n_g)^2/N,
    SSW = sum Q_g/n_g^2 - Z_g^2/n_g^3 — the n_g powers restore each
    group's denominator), the same bounded 5-row fold as ANOVA.

    Scale shape: two map-side-combinable passes over the fact table
    (moments, then deviations against the broadcast 5-row group
    frame) — no window, no shuffle beyond the two hash-aggs.
    Overflow envelope: Q_g <= n_g * (c_max * n_g)^2 ~ 1e38 at
    n_g ~ 3e9 rows/group with 5-digit cent values; beyond that,
    pre-scale cents to dollars (document, don't silently saturate).
    Output (1 row): k, n, ssb, ssw, w_stat, homogeneous.
    """
    cg = events.filter(F.col("value").isNotNull()).select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("c"),
    )
    g = cg.groupBy("event_type").agg(
        F.count("*").alias("ng"), F.sum("c").alias("sg")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    dev = cg.join(F.broadcast(g), "event_type").select(
        "event_type",
        "ng",
        F.abs(
            dec(F.col("c")) * dec(F.col("ng")) - dec(F.col("sg"))
        ).alias("d"),
    )
    gm = dev.groupBy("event_type").agg(
        F.max("ng").alias("ng"),
        F.sum("d").alias("z1"),
        F.sum(F.col("d") * F.col("d")).alias("q"),
    )
    ngd = F.col("ng").cast("double")
    m = gm.agg(
        F.count("*").alias("k"),
        F.sum("ng").alias("n"),
        F.sum(
            F.col("z1").cast("double")
            * F.col("z1").cast("double")
            / (ngd * ngd * ngd)
        ).alias("t1"),
        F.sum(F.col("z1").cast("double") / ngd).alias("zb"),
        F.sum(
            F.col("q").cast("double") / (ngd * ngd)
        ).alias("t2"),
    )
    nd = F.col("n").cast("double")
    kd = F.col("k").cast("double")
    ssb = F.col("t1") - F.col("zb") * F.col("zb") / nd
    ssw = F.col("t2") - F.col("t1")
    w = (ssb / (kd - 1)) / (ssw / (nd - kd))
    return m.select(
        "k",
        "n",
        F.round(ssb, 4).alias("ssb"),
        F.round(ssw, 4).alias("ssw"),
        F.round(w, 6).alias("w_stat"),
        (F.round(w, 6) <= ANOVA_F_CRIT_05).alias("homogeneous"),
    )


ORACLE_LEVENE = f"""
lv_c AS (
  SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL
),
lv_g AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS ng,
         CAST(sum(c) AS BIGINT) AS sg
  FROM lv_c GROUP BY 1
),
lv_d AS (
  SELECT c.event_type, g.ng,
         abs(CAST(c.c AS HUGEINT) * g.ng - g.sg) AS d
  FROM lv_c c JOIN lv_g g ON c.event_type = g.event_type
),
lv_gm AS (
  SELECT event_type, CAST(max(ng) AS BIGINT) AS ng,
         CAST(sum(d) AS HUGEINT) AS z1,
         CAST(sum(d * d) AS HUGEINT) AS q
  FROM lv_d GROUP BY 1
),
lv_m AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
         CAST(sum(ng) AS BIGINT) AS n,
         sum(CAST(z1 AS DOUBLE) * CAST(z1 AS DOUBLE)
             / (CAST(ng AS DOUBLE) * CAST(ng AS DOUBLE)
                * CAST(ng AS DOUBLE))) AS t1,
         sum(CAST(z1 AS DOUBLE) / CAST(ng AS DOUBLE)) AS zb,
         sum(CAST(q AS DOUBLE)
             / (CAST(ng AS DOUBLE) * CAST(ng AS DOUBLE))) AS t2
  FROM lv_gm
),
levene_test AS (
  SELECT k, n,
         round(t1 - zb * zb / CAST(n AS DOUBLE), 4) AS ssb,
         round(t2 - t1, 4) AS ssw,
         round(((t1 - zb * zb / CAST(n AS DOUBLE))
                / (CAST(k AS DOUBLE) - 1))
               / ((t2 - t1) / (CAST(n AS DOUBLE)
                               - CAST(k AS DOUBLE))), 6) AS w_stat,
         round(((t1 - zb * zb / CAST(n AS DOUBLE))
                / (CAST(k AS DOUBLE) - 1))
               / ((t2 - t1) / (CAST(n AS DOUBLE)
                               - CAST(k AS DOUBLE))), 6)
           <= {ANOVA_F_CRIT_05} AS homogeneous
  FROM lv_m
)
"""


# ---------------------------------------------------------------------------
# Erlang-C wait-probability curve (M/M/s queue with waiting room)
# ---------------------------------------------------------------------------

#: offered-load cap for the WAIT curve. Unlike Erlang-B (loss model,
#: meaningful at any a), Erlang-C is only finite for s > a, and the
#: curve tops out at ERLANG_MAX_SERVERS servers — so the staffable
#: load is capped lower and flagged. Bonus: in the stable branch
#: a <= s-1 <= 11, so every integer term stays ~1e13 and the 1e6
#: ppm scaling can never approach the DECIMAL(38,0)/HUGEINT ceiling.
ERLANG_C_A_CAP = 8


def erlang_wait_curve(orders: DataFrame) -> DataFrame:
    """Erlang-C staffing curve: probability an arriving order WAITS
    (all s agents busy, M/M/s with infinite queue) plus the mean
    queue wait, for s = 1..{S} at the data-derived offered load —
    the companion of ``orders_erlang_blocking`` for systems that
    queue instead of turning work away.

    Same EXACT INTEGER recursion J(s) = a^s + s*J(s-1) as Erlang-B
    (J(s) = sum_k a^k * s!/k!), then the waiting probability in pure
    integers: with q = a^s * s and D = (s-a)*(J(s) - a^s) + a^s * s,
        P_wait = q / D            (s > a; else 1 — unstable queue)
        W_q    = P_wait / (s - a) (mean wait, 1-hour handle time)
    both emitted as exact integer divisions (ppm / micro-hours) via
    the divmod split, so the whole curve hash-matches by
    construction. Load is capped at {CAP} erlangs (flagged): the
    stable branch needs a < s <= {S} anyway, and the cap keeps every
    term within ~1e13 * 1e6 — five orders below the DECIMAL(38,0)
    ceiling at ANY data scale.

    Scale: ONE global count-agg over orders; the recursion is
    driver-free column algebra on a broadcast 1-row frame. Output
    per s: servers, offered_load, capped, wait_ppm, wq_micro_hours
    (NULL when the queue is unstable).
    """
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    tot = orders.agg(
        F.count("*").alias("n"),
        F.countDistinct(F.to_date("o_orderdate")).alias("days"),
    )
    base = tot.select(
        F.expr(
            f"least((n + days * 24 - 1) div (days * 24),"
            f" cast({ERLANG_C_A_CAP} as bigint))"
        ).alias("a_int"),
        F.expr(
            f"cast((n + days * 24 - 1) div (days * 24)"
            f" > {ERLANG_C_A_CAP} as int)"
        ).alias("capped"),
    ).select(
        "a_int",
        "capped",
        dec(F.col("a_int")).alias("a"),
        dec(F.lit(1)).alias("ap"),
        dec(F.lit(1)).alias("j"),
    )
    levels = []
    cur = base
    for s in range(1, ERLANG_MAX_SERVERS + 1):
        cur = cur.select(
            "a_int",
            "capped",
            "a",
            (F.col("ap") * F.col("a")).alias("ap"),
            (
                F.col("ap") * F.col("a") + F.lit(s) * F.col("j")
            ).alias("j"),
        )
        levels.append(
            cur.select(
                F.lit(s).alias("servers"),
                F.col("a_int").alias("offered_load"),
                "capped",
                "a",
                "ap",
                "j",
            )
        )
    allv = levels[0]
    for fr in levels[1:]:
        allv = allv.unionByName(fr)
    sd = F.col("servers").cast("decimal(38,0)")
    q = F.col("ap") * sd
    den = (sd - F.col("a")) * (F.col("j") - F.col("ap")) + q
    scale = F.lit(ERLANG_SCALE).cast("decimal(38,0)")
    num_p = q * scale
    den_w = den * (sd - F.col("a"))
    stable = F.col("servers") > F.col("offered_load")
    return allv.select(
        "servers",
        "offered_load",
        "capped",
        F.when(
            stable,
            ((num_p - num_p % den) / den).cast("bigint"),
        )
        .otherwise(F.lit(ERLANG_SCALE).cast("bigint"))
        .alias("wait_ppm"),
        F.when(
            stable,
            ((num_p - num_p % den_w) / den_w).cast("bigint"),
        ).alias("wq_micro_hours"),
    )


erlang_wait_curve.__doc__ = erlang_wait_curve.__doc__.format(
    S=ERLANG_MAX_SERVERS, CAP=ERLANG_C_A_CAP
)


def oracle_erlang_wait(
    max_servers: int = ERLANG_MAX_SERVERS,
    cap: int = ERLANG_C_A_CAP,
    scale: int = ERLANG_SCALE,
) -> str:
    ctes = [
        """
ec_tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(count(DISTINCT CAST(o_orderdate AS DATE)) AS BIGINT)
           AS days
  FROM orders
)""",
        f"""
ec_0 AS (
  SELECT least((n + days * 24 - 1) // (days * 24),
               CAST({cap} AS BIGINT)) AS a_int,
         CAST((n + days * 24 - 1) // (days * 24) > {cap} AS INT)
           AS capped,
         CAST(least((n + days * 24 - 1) // (days * 24),
                    CAST({cap} AS BIGINT)) AS HUGEINT) AS a,
         CAST(1 AS HUGEINT) AS ap,
         CAST(1 AS HUGEINT) AS j
  FROM ec_tot
)""",
    ]
    for s in range(1, max_servers + 1):
        ctes.append(
            f"""
ec_{s} AS (
  SELECT a_int, capped, a, ap * a AS ap, ap * a + {s} * j AS j
  FROM ec_{s - 1}
)"""
        )
    arms = "\n  UNION ALL\n".join(
        f"  SELECT CAST({s} AS INT) AS servers,"
        f" a_int AS offered_load, capped,"
        f" CASE WHEN {s} > a_int THEN CAST((ap * {s} * {scale})"
        f" // (({s} - a) * (j - ap) + ap * {s}) AS BIGINT)"
        f" ELSE CAST({scale} AS BIGINT) END AS wait_ppm,"
        f" CASE WHEN {s} > a_int THEN CAST((ap * {s} * {scale})"
        f" // ((({s} - a) * (j - ap) + ap * {s}) * ({s} - a))"
        f" AS BIGINT) ELSE CAST(NULL AS BIGINT) END"
        f" AS wq_micro_hours"
        f" FROM ec_{s}"
        for s in range(1, max_servers + 1)
    )
    ctes.append(f"""
erlang_wait AS (
{arms}
)""")
    return ",".join(ctes)


# ---------------------------------------------------------------------------
# Friedman test (blocked rank test: event types ranked within each day)
# ---------------------------------------------------------------------------


def friedman_test(events: DataFrame) -> DataFrame:
    """Friedman test of whether the five event types keep the same
    activity ordering day after day — the BLOCKED rank test (each
    calendar day is a block, types are ranked within the day by
    event count), immune to day-level volume swings that would
    swamp the unblocked Kruskal-Wallis.

    ALL-INTEGER Conover form: within-block mid-ranks come from the
    day-grain grid self-joined against itself (k^2 rows per day,
    calendar-bounded) as doubled ranks 2r = 2*#smaller + #tied + 1;
    with A4 = sum (2r)^2 and R2_j = sum_d 2r the tie-robust statistic
        T = (k-1) * sum_j (R2_j - b(k+1))^2 / (A4 - b*k*(k+1)^2)
    is a ratio of two exact BIGINTs — the doubling cancels, so the
    ONLY float is the final rounded division (NULL when every day
    ranks every type identically — zero rank variance). Missing
    (day, type) cells enter as 0 via the dense day x type grid.

    Scale: one (day, type) hash-agg over the fact table, then
    calendar-bounded grid algebra; no windows. Output (1 row):
    n_days, k, chi2_f, significant (vs chi-square df=4 at .05 —
    the fixture's k=5; re-literal for other treatment counts).
    """
    dtc = (
        events.groupBy(
            F.to_date("ts").alias("d"), F.col("event_type").alias("ty")
        )
        .agg(F.count("*").alias("x"))
    )
    days = dtc.select("d").distinct()
    types = dtc.select("ty").distinct()
    grid = (
        days.crossJoin(F.broadcast(types))
        .join(dtc, ["d", "ty"], "left")
        .select("d", "ty", F.coalesce(F.col("x"), F.lit(0)).alias("x"))
    )
    other = grid.select(
        F.col("d").alias("d2"),
        F.col("x").alias("x2"),
    )
    r2 = (
        grid.join(other, F.col("d") == F.col("d2"))
        .groupBy("d", "ty", "x")
        .agg(
            (
                2 * F.sum((F.col("x2") < F.col("x")).cast("bigint"))
                + F.sum((F.col("x2") == F.col("x")).cast("bigint"))
                + 1
            ).alias("r2")
        )
    )
    per_type = r2.groupBy("ty").agg(F.sum("r2").alias("rj2"))
    tot = r2.agg(
        F.countDistinct("d").alias("b"),
        F.countDistinct("ty").alias("k"),
        F.sum(F.col("r2") * F.col("r2")).alias("a4"),
    )
    m = (
        per_type.crossJoin(F.broadcast(tot))
        .groupBy("b", "k", "a4")
        .agg(
            F.sum(
                (F.col("rj2") - F.col("b") * (F.col("k") + 1))
                * (F.col("rj2") - F.col("b") * (F.col("k") + 1))
            ).alias("num")
        )
    )
    den = F.col("a4") - F.col("b") * F.col("k") * (F.col("k") + 1) * (
        F.col("k") + 1
    )
    chi = F.when(
        den != 0,
        F.round(
            ((F.col("k") - 1) * F.col("num")).cast("double")
            / den.cast("double"),
            6,
        ),
    )
    return m.select(
        F.col("b").alias("n_days"),
        "k",
        chi.alias("chi2_f"),
        (chi > KRUSKAL_CHI2_CRIT_05).alias("significant"),
    )


ORACLE_FRIEDMAN = f"""
fr_dtc AS (
  SELECT CAST(ts AS DATE) AS d, event_type AS ty,
         CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
fr_grid AS (
  SELECT dd.d, tt.ty, coalesce(c.x, 0) AS x
  FROM (SELECT DISTINCT d FROM fr_dtc) dd
  CROSS JOIN (SELECT DISTINCT ty FROM fr_dtc) tt
  LEFT JOIN fr_dtc c ON c.d = dd.d AND c.ty = tt.ty
),
fr_r2 AS (
  SELECT g.d, g.ty, g.x,
         2 * CAST(sum(CASE WHEN o.x < g.x THEN 1 ELSE 0 END)
                  AS BIGINT)
         + CAST(sum(CASE WHEN o.x = g.x THEN 1 ELSE 0 END)
                AS BIGINT) + 1 AS r2
  FROM fr_grid g JOIN fr_grid o ON g.d = o.d
  GROUP BY 1, 2, 3
),
fr_pt AS (
  SELECT ty, CAST(sum(r2) AS BIGINT) AS rj2 FROM fr_r2 GROUP BY 1
),
fr_tot AS (
  SELECT CAST(count(DISTINCT d) AS BIGINT) AS b,
         CAST(count(DISTINCT ty) AS BIGINT) AS k,
         CAST(sum(r2 * r2) AS BIGINT) AS a4
  FROM fr_r2
),
fr_m AS (
  SELECT b, k, a4,
         CAST(sum((rj2 - b * (k + 1)) * (rj2 - b * (k + 1)))
              AS BIGINT) AS num
  FROM fr_pt, fr_tot GROUP BY 1, 2, 3
),
friedman_test AS (
  SELECT b AS n_days, k,
         CASE WHEN a4 - b * k * (k + 1) * (k + 1) <> 0 THEN
           round(CAST((k - 1) * num AS DOUBLE)
                 / CAST(a4 - b * k * (k + 1) * (k + 1) AS DOUBLE), 6)
         END AS chi2_f,
         CASE WHEN a4 - b * k * (k + 1) * (k + 1) <> 0 THEN
           round(CAST((k - 1) * num AS DOUBLE)
                 / CAST(a4 - b * k * (k + 1) * (k + 1) AS DOUBLE), 6)
         END > {KRUSKAL_CHI2_CRIT_05} AS significant
  FROM fr_m
)
"""


# ---------------------------------------------------------------------------
# Tukey HSD post-hoc pairwise comparisons (after the ANOVA omnibus)
# ---------------------------------------------------------------------------

#: studentized-range critical value q(.05; k=5 groups, df=inf) — the
#: same infinite-df convention as the ANOVA literal (any SF this
#: engine targets has df2 >> 120).
TUKEY_Q_CRIT_05_K5 = 3.858


def tukey_hsd(events: DataFrame) -> DataFrame:
    """Tukey HSD post-hoc: which PAIRS of event types differ in mean
    value, with the studentized-range correction that keeps the
    familywise error at .05 across all C(5,2)=10 comparisons — the
    follow-up question ``events_anova``'s single omnibus F cannot
    answer (and the multiplicity trap of running 10 raw Welch tests;
    the generic BH machinery for that lives in
    ``events_multi_test_bh``).

    Same exact integer moments as the ANOVA (ONE hash-agg: n_g, Σc,
    Σc² per group); MSW assembles in doubles from the k=5 rows, and
    each pair row computes q = |mean_i - mean_j| /
    sqrt(MSW/2 * (1/n_i + 1/n_j)) as one mirrored double chain. The
    pair join is k^2-bounded (string-ordered to emit each unordered
    pair once, deterministically in both engines).

    Output (10 rows): type_a, type_b, n_a, n_b, mean_diff_cents,
    q_stat, significant.
    """
    g = (
        events.filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.round(F.col("value") * 100, 0).cast("bigint").alias("c"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("ng"),
            F.sum("c").alias("sg"),
            F.sum(F.col("c") * F.col("c")).alias("qg"),
        )
    )
    msw = g.agg(
        F.sum("ng").alias("n"),
        F.count("*").alias("k"),
        (
            F.sum(F.col("qg").cast("double"))
            - F.sum(
                F.col("sg").cast("double")
                * F.col("sg").cast("double")
                / F.col("ng").cast("double")
            )
        ).alias("ssw"),
    ).select(
        (
            F.col("ssw")
            / (F.col("n").cast("double") - F.col("k").cast("double"))
        ).alias("msw")
    )
    a = g.select(
        F.col("event_type").alias("type_a"),
        F.col("ng").alias("n_a"),
        F.col("sg").alias("s_a"),
    )
    b = g.select(
        F.col("event_type").alias("type_b"),
        F.col("ng").alias("n_b"),
        F.col("sg").alias("s_b"),
    )
    pairs = a.join(b, F.col("type_a") < F.col("type_b")).crossJoin(
        F.broadcast(msw)
    )
    diff = F.abs(
        F.col("s_a").cast("double") / F.col("n_a").cast("double")
        - F.col("s_b").cast("double") / F.col("n_b").cast("double")
    )
    se = F.sqrt(
        F.col("msw")
        / 2
        * (
            1 / F.col("n_a").cast("double")
            + 1 / F.col("n_b").cast("double")
        )
    )
    q = F.round(diff / se, 6)
    return pairs.select(
        "type_a",
        "type_b",
        "n_a",
        "n_b",
        F.round(diff, 4).alias("mean_diff_cents"),
        q.alias("q_stat"),
        (q > TUKEY_Q_CRIT_05_K5).alias("significant"),
    )


ORACLE_TUKEY = f"""
tk_g AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS ng,
         CAST(sum(c) AS BIGINT) AS sg,
         CAST(sum(c * c) AS BIGINT) AS qg
  FROM (SELECT event_type,
               CAST(round(value * 100, 0) AS BIGINT) AS c
        FROM events WHERE value IS NOT NULL)
  GROUP BY 1
),
tk_msw AS (
  SELECT (sum(CAST(qg AS DOUBLE))
          - sum(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
                / CAST(ng AS DOUBLE)))
         / (CAST(sum(ng) AS DOUBLE) - CAST(count(*) AS DOUBLE))
           AS msw
  FROM tk_g
),
tukey_hsd AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         a.ng AS n_a, b.ng AS n_b,
         round(abs(CAST(a.sg AS DOUBLE) / CAST(a.ng AS DOUBLE)
                   - CAST(b.sg AS DOUBLE) / CAST(b.ng AS DOUBLE)),
               4) AS mean_diff_cents,
         round(abs(CAST(a.sg AS DOUBLE) / CAST(a.ng AS DOUBLE)
                   - CAST(b.sg AS DOUBLE) / CAST(b.ng AS DOUBLE))
               / sqrt(msw / 2 * (1 / CAST(a.ng AS DOUBLE)
                                 + 1 / CAST(b.ng AS DOUBLE))), 6)
           AS q_stat,
         round(abs(CAST(a.sg AS DOUBLE) / CAST(a.ng AS DOUBLE)
                   - CAST(b.sg AS DOUBLE) / CAST(b.ng AS DOUBLE))
               / sqrt(msw / 2 * (1 / CAST(a.ng AS DOUBLE)
                                 + 1 / CAST(b.ng AS DOUBLE))), 6)
           > {TUKEY_Q_CRIT_05_K5} AS significant
  FROM tk_g a JOIN tk_g b ON a.event_type < b.event_type, tk_msw
)
"""


# ---------------------------------------------------------------------------
# Wagner-Whitin optimal lot sizing (min-plus shortest path, doubled)
# ---------------------------------------------------------------------------

#: ordering (setup) cost per replenishment, cents.
LOT_SETUP_CENTS = 5000
#: holding cost per unit per month, cents.
LOT_HOLD_CENTS = 1
#: min-plus squaring rounds: paths of up to 2^8 = 256 edges, i.e. a
#: 256-month (21-year) planning calendar — raise by one round per
#: further doubling of the calendar; each round is one bounded join.
LOT_DOUBLING_ROUNDS = 8


def lot_sizing_frontier(orders: DataFrame) -> DataFrame:
    """Wagner-Whitin optimal lot sizing over the monthly demand
    series: the minimum total (setup + holding) cost plan that
    satisfies every month's demand by batching future months into
    earlier orders — the DYNAMIC counterpart of the static EOQ
    (``parts_eoq``) and newsvendor fractile.

    Classic WW is a sequential driver-side DP; here the DP runs as a
    PACKED-ARRAY KERNEL on the calendar-bounded demand series — the
    same machinery as ``ranking.bucket_prefix_offsets``: one
    corpus-sized month hash-agg, then the months pack into a single
    sorted array and f(j) = min_{{i<=j}} f(i-1) + K + h*H(i,j) runs
    as nested higher-order functions entirely executor-side (H(i,j)
    = sum_{{t=i..j}} (t-i)*d_t assembles O(1) per candidate from
    prefix arrays P0/P1, so the kernel is O(months^2) integer ops on
    ~e2 elements — microseconds, where a join-based min-plus
    squaring loop pays 8 rounds of job scheduling for the same
    bounded state). Every cost is an exact BIGINT cent, so min()
    agrees across engines by construction; the oracle replays the
    equivalent min-plus shortest path ({R} unrolled squaring rounds
    over the order-coverage edge graph) and the hash gate proves the
    two formulations identical. Month index = count of distinct
    months <= m (a months^2 self-join — contiguous ids even when a
    calendar month has no orders, no global window).

    Output per month: through_month, month_idx, demand,
    opt_cost_cents = cheapest plan covering months 1..t (the full
    DP frontier, of which the last row is THE Wagner-Whitin
    optimum).
    """
    m = orders.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("mon")
    ).agg(F.count("*").alias("d"))
    idx = (
        m.join(
            m.select(F.col("mon").alias("mon2")),
            F.col("mon2") <= F.col("mon"),
        )
        .groupBy("mon", "d")
        .agg(F.count("*").alias("t"))
    )
    packed = idx.agg(
        F.sort_array(
            F.collect_list(F.struct("t", "d", "mon"))
        ).alias("ms")
    )
    pfx = packed.select(
        "ms",
        F.expr(
            "aggregate(ms, array(cast(0 as bigint)),"
            " (a, x) -> array_append(a,"
            " element_at(a, -1) + x.d))"
        ).alias("p0"),
        F.expr(
            "aggregate(ms, array(cast(0 as bigint)),"
            " (a, x) -> array_append(a,"
            " element_at(a, -1) + x.t * x.d))"
        ).alias("p1"),
    )
    k, h = LOT_SETUP_CENTS, LOT_HOLD_CENTS
    dp = pfx.select(
        "ms",
        F.expr(
            # the j = 1 guard keeps the fold off sequence(2, 1)
            # (Spark descends to [2, 1], and element_at(acc, 2) on
            # the 1-element seed only "works" via non-ANSI
            # out-of-bounds NULL + least() null-skipping — review
            # finding; the guard makes the kernel ANSI-safe).
            "aggregate(sequence(1, size(ms)),"
            " array(cast(0 as bigint)),"
            " (acc, j) -> array_append(acc,"
            "  if(j < 2,"
            f"   element_at(acc, 1) + {k} + {h} *"
            "    ((element_at(p1, j + 1) - element_at(p1, 1))"
            "     - 1 * (element_at(p0, j + 1) - element_at(p0, 1))),"
            "  aggregate(sequence(2, j),"
            f"   element_at(acc, 1) + {k} + {h} *"
            "    ((element_at(p1, j + 1) - element_at(p1, 1))"
            "     - 1 * (element_at(p0, j + 1) - element_at(p0, 1))),"
            "   (best, i) -> least(best,"
            f"    element_at(acc, i) + {k} + {h} *"
            "     ((element_at(p1, j + 1) - element_at(p1, i))"
            "      - i * (element_at(p0, j + 1)"
            "             - element_at(p0, i))))))))"
        ).alias("f"),
    )
    return dp.select(
        F.explode(
            F.expr(
                "transform(ms, (x, ix) -> struct("
                " x.mon as through_month, x.t as month_idx,"
                " x.d as demand,"
                " element_at(f, ix + 2) as opt_cost_cents))"
            )
        ).alias("r")
    ).select("r.*")


lot_sizing_frontier.__doc__ = lot_sizing_frontier.__doc__.format(
    R=LOT_DOUBLING_ROUNDS
)


def oracle_lot_sizing(
    setup: int = LOT_SETUP_CENTS,
    hold: int = LOT_HOLD_CENTS,
    rounds: int = LOT_DOUBLING_ROUNDS,
) -> str:
    ctes = [
        """
ww_m AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
         CAST(count(*) AS BIGINT) AS d
  FROM orders GROUP BY 1
)""",
        """
ww_i AS (
  SELECT a.mon, a.d, CAST(count(*) AS BIGINT) AS t
  FROM ww_m a JOIN ww_m b ON b.mon <= a.mon GROUP BY 1, 2
)""",
        f"""
ww_e AS (
  SELECT i.t AS src, j.t + 1 AS dst,
         {setup} + {hold} * CAST(sum((u.t - i.t) * u.d) AS BIGINT)
           AS w
  FROM ww_i i JOIN ww_i j ON j.t >= i.t
  JOIN ww_i u ON u.t BETWEEN i.t AND j.t
  GROUP BY 1, 2
)""",
        """
ww_d0 AS (
  SELECT src, dst, w FROM ww_e
  UNION ALL
  SELECT t, t, CAST(0 AS BIGINT) FROM ww_i
  UNION ALL
  SELECT max(t) + 1, max(t) + 1, CAST(0 AS BIGINT) FROM ww_i
)""",
    ]
    for r in range(1, rounds + 1):
        # MATERIALIZED: each round references its predecessor twice;
        # an inlined CTE chain re-evaluates 2^rounds times.
        ctes.append(
            f"""
ww_d{r} AS MATERIALIZED (
  SELECT a.src, b.dst, CAST(min(a.w + b.w) AS BIGINT) AS w
  FROM ww_d{r - 1} a JOIN ww_d{r - 1} b ON a.dst = b.src
  GROUP BY 1, 2
)"""
        )
    ctes.append(
        f"""
lot_sizing AS (
  SELECT m.mon AS through_month, m.t AS month_idx, m.d AS demand,
         d.w AS opt_cost_cents
  FROM ww_d{rounds} d JOIN ww_i m ON d.dst = m.t + 1
  WHERE d.src = 1
)"""
    )
    return ",".join(ctes)


# ---------------------------------------------------------------------------
# Gumbel block-maxima fit (extreme value analysis of hourly revenue)
# ---------------------------------------------------------------------------

#: Euler-Mascheroni constant and pi, written once as literals so the
#: Spark and DuckDB expressions share the exact same doubles.
EULER_GAMMA = 0.5772156649015329
PI_LIT = 3.141592653589793
#: return period (blocks) for the headline return level.
GUMBEL_RET_BLOCKS = 30


def gumbel_maxima(events: DataFrame) -> DataFrame:
    """Gumbel extreme-value fit on DAILY MAXIMA of hourly purchase
    revenue — "how big an hourly revenue spike should we provision
    for once per month": the block-maxima complement of
    ``events_hill_tail`` (which estimates the tail index from upper
    order statistics; Gumbel assumes the light-tailed domain and
    yields calibrated return levels).

    Method of moments on the block maxima (Gumbel mean = mu +
    gamma*beta, variance = pi^2 beta^2 / 6):
        beta = s * sqrt(6) / pi,  mu = m - gamma*beta,
        x_T  = mu - beta * ln(-ln(1 - 1/T))
    where m and s come from EXACT BIGINT block sums (each hourly
    revenue is an integer cent sum, each daily max an integer, and
    n, sum(x), sum(x^2) exact — the doubles start only at the final
    closed forms, with gamma/pi as shared literals). Two bounded
    hash-aggs (hour grain, then day grain) over one corpus pass.

    Output (1 row): n_blocks, mean_max_cents, sd_max_cents, beta,
    mu, ret30_cents (the once-per-{T}-blocks level).
    """
    hourly = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(
            F.sum(
                F.round(F.col("value") * 100, 0).cast("bigint")
            ).alias("rev")
        )
    )
    return gumbel_from_hourly(hourly)


def gumbel_from_hourly(hourly: DataFrame) -> DataFrame:
    """Gumbel fit from an (h, rev) hour-grain revenue table — the
    shared tail of ``gumbel_maxima`` and its streaming twin (whose
    standing state is exactly this additive hour-grain table)."""
    daily_max = hourly.groupBy(F.to_date("h").alias("d")).agg(
        F.max("rev").alias("mx")
    )
    mm = daily_max.agg(
        F.count("*").alias("n"),
        F.sum("mx").alias("s1"),
        F.sum(F.col("mx") * F.col("mx")).alias("s2"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / nd
    var = (
        nd * F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1").cast("double")
    ) / (nd * (nd - 1))
    sd = F.sqrt(var)
    beta = sd * F.sqrt(F.lit(6.0)) / F.lit(PI_LIT)
    mu = mean - F.lit(EULER_GAMMA) * beta
    ret = mu - beta * F.log(
        -F.log(1 - 1 / F.lit(float(GUMBEL_RET_BLOCKS)))
    )
    return mm.select(
        F.col("n").alias("n_blocks"),
        F.round(mean, 4).alias("mean_max_cents"),
        F.round(sd, 4).alias("sd_max_cents"),
        F.round(beta, 4).alias("beta"),
        F.round(mu, 4).alias("mu"),
        F.round(ret, 4).alias("ret30_cents"),
    )


gumbel_maxima.__doc__ = gumbel_maxima.__doc__.format(
    T=GUMBEL_RET_BLOCKS
)


ORACLE_GUMBEL = f"""
gb_h AS (
  SELECT date_trunc('hour', ts) AS h,
         CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS rev
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
gb_d AS (
  SELECT CAST(h AS DATE) AS d, CAST(max(rev) AS BIGINT) AS mx
  FROM gb_h GROUP BY 1
),
gb_m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(mx) AS BIGINT) AS s1,
         CAST(sum(mx * mx) AS BIGINT) AS s2
  FROM gb_d
),
gumbel_maxima AS (
  SELECT n AS n_blocks,
         round(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 4)
           AS mean_max_cents,
         round(sqrt((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                     - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))),
               4) AS sd_max_cents,
         round(sqrt((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                     - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)))
               * sqrt(6.0) / {PI_LIT}, 4) AS beta,
         round(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)
               - {EULER_GAMMA} * (sqrt((CAST(n AS DOUBLE)
                   * CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
                   * CAST(s1 AS DOUBLE))
                  / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)))
                 * sqrt(6.0) / {PI_LIT}), 4) AS mu,
         round((CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)
               - {EULER_GAMMA} * (sqrt((CAST(n AS DOUBLE)
                   * CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
                   * CAST(s1 AS DOUBLE))
                  / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)))
                 * sqrt(6.0) / {PI_LIT}))
               - (sqrt((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                     - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)))
                  * sqrt(6.0) / {PI_LIT})
                 * ln(-ln(1 - 1 / {float(GUMBEL_RET_BLOCKS)})), 4)
           AS ret30_cents
  FROM gb_m
)
"""


# ---------------------------------------------------------------------------
# Dynamic time warping (clicks vs purchases daily-shape alignment)
# ---------------------------------------------------------------------------

#: DTW "infinity" border sentinel. Path costs are bounded by
#: calendar_len * max|a-b| (~3.7e14 even at 1e11 daily counts), so
#: 4e15 can never be chosen over a real path and INF + cost stays
#: far inside BIGINT.
DTW_INF = 4_000_000_000_000_000


def dtw_alignment(events: DataFrame) -> DataFrame:
    """Dynamic time warping distance between the daily CLICK and
    PURCHASE count series — "do purchases trace the same shape as
    clicks, allowing lag/stretch", where plain correlation
    (``events_type_corr``) and fixed-lag CCF (``events_ccf``) demand
    rigid alignment. Previously on the deferred ledger as
    "cross-dependent DP state"; resolved by the same two moves as
    the Wagner-Whitin kernel:

    ENGINE: the DP D(i,j) = |a_i-b_j| + min(D(i-1,j), D(i,j-1),
    D(i-1,j-1)) runs as a packed-array kernel — both day-grain
    series pack into arrays (calendar-bounded at ANY corpus scale)
    and nested higher-order aggregates build the DP rows executor-
    side, O(n*m) exact BIGINT ops, one job. ORACLE: DuckDB replays
    the DP as a WAVEFRONT recursion — antidiagonal k has no
    intra-diagonal dependency, so a recursive CTE advances one
    diagonal per step carrying two diagonals of (i, j, d) rows (the
    classic systolic-array DTW schedule, here in pure SQL). Both
    sides are exact integers, so the hash gate proves the two
    schedules compute the same warp distance.

    The corpus-sized work is one (date, type) hash-agg. Output
    (1 row): n_a, n_b, dtw_cost (sum of |count gaps| along the
    optimal warp path).
    """
    def _daily(ty: str) -> DataFrame:
        return (
            events.filter(F.col("event_type") == ty)
            .groupBy(F.to_date("ts").alias("d"))
            .agg(F.count("*").alias("cnt"))
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("d", "cnt"))
                ).alias("s")
            )
            .select(F.expr("transform(s, x -> x.cnt)"))
        )

    # Empty-series guard (review finding): a zero-row side packs to
    # an empty array and the DP fold would index element_at(av, 0);
    # dropping the degenerate row yields 0 rows — matching the
    # oracle, whose final diagonal (n, m) never materializes when
    # either list is NULL/empty.
    packed = (
        _daily("click")
        .toDF("av")
        .crossJoin(_daily("purchase").toDF("bv"))
        .filter(F.expr("size(av) > 0 AND size(bv) > 0"))
    )
    inf = f"cast({DTW_INF} as bigint)"
    dp = packed.select(
        F.expr("size(av)").alias("n_a"),
        F.expr("size(bv)").alias("n_b"),
        F.expr(
            "aggregate(sequence(1, size(av)),"
            f" concat(array(cast(0 as bigint)),"
            f"  transform(sequence(1, size(bv)), x -> {inf})),"
            " (prev, i) -> aggregate(sequence(1, size(bv)),"
            f"  array({inf}),"
            "  (r, j) -> array_append(r,"
            "   abs(element_at(av, i) - element_at(bv, j))"
            "   + least(element_at(prev, j + 1), element_at(prev, j),"
            "           element_at(r, -1)))))"
        ).alias("row"),
    )
    return dp.select(
        "n_a",
        "n_b",
        F.expr("element_at(row, n_b + 1)").alias("dtw_cost"),
    )


ORACLE_DTW = f"""
dtw_a AS (
  SELECT list(cnt ORDER BY d) AS av FROM (
    SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS cnt
    FROM events WHERE event_type = 'click' GROUP BY 1)
),
dtw_b AS (
  SELECT list(cnt ORDER BY d) AS bv FROM (
    SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS cnt
    FROM events WHERE event_type = 'purchase' GROUP BY 1)
),
dtw_ab AS (
  SELECT av, bv, len(av) AS n, len(bv) AS m FROM dtw_a, dtw_b
),
dtw_rec AS (
  SELECT * FROM (VALUES
    (1, 0, 0, CAST(0 AS BIGINT)),
    (0, 1, 0, CAST({DTW_INF} AS BIGINT)),
    (0, 0, 1, CAST({DTW_INF} AS BIGINT))) AS t(age, i, j, d)
  UNION ALL
  SELECT u.age, u.ci AS i, u.cj AS j,
         CASE WHEN u.age = 1 THEN min(w.d)
              WHEN u.ci = 0 OR u.cj = 0 THEN CAST({DTW_INF} AS BIGINT)
              ELSE abs(ab.av[u.ci] - ab.bv[u.cj]) + min(w.d) END AS d
  FROM dtw_rec w
  CROSS JOIN dtw_ab ab
  CROSS JOIN UNNEST(
    CASE WHEN w.age = 0 THEN [
      {{'age': 0, 'ci': w.i + 1, 'cj': w.j}},
      {{'age': 0, 'ci': w.i, 'cj': w.j + 1}},
      {{'age': 1, 'ci': w.i, 'cj': w.j}}]
    ELSE [{{'age': 0, 'ci': w.i + 1, 'cj': w.j + 1}}] END) AS t(u)
  WHERE u.ci <= ab.n AND u.cj <= ab.m
        AND NOT (u.age = 1 AND w.i + w.j >= ab.n + ab.m)
  GROUP BY u.age, u.ci, u.cj, ab.av, ab.bv, ab.n, ab.m
),
dtw_alignment AS (
  SELECT ab.n AS n_a, ab.m AS n_b, w.d AS dtw_cost
  FROM dtw_rec w, dtw_ab ab
  WHERE w.age = 0 AND w.i = ab.n AND w.j = ab.m
)
"""


# ---------------------------------------------------------------------------
# energy distance (exact-integer two-sample distribution test)
# ---------------------------------------------------------------------------


def energy_distance(events: DataFrame) -> DataFrame:
    """Energy distance between the purchase and click value
    distributions — the moment-free two-sample test that is
    consistent against ANY distributional difference (location,
    scale, shape), where KS (``events_ks_drift``) keys on the single
    largest CDF gap and Wasserstein (``events_wasserstein``) on mean
    transport: E = 2*E|X-Y| - E|X-X'| - E|Y-Y'|, plus the Szekely-
    Rizzo e-statistic nm/(n+m)*E.

    EXACT INTEGER pair sums without the quadratic pair join: on the
    merged cent grain, every absolute-difference sum decomposes
    through exclusive prefix sums — sum_pairs |x-y| = sum_v cx(v) *
    [(v*N_below - S_below) + (S_above - v*N_above)] — so A = sum
    |X-Y|, B = sum |X-X'|, C = sum |Y-Y'| are exact DECIMAL(38,0)/
    HUGEINT from ONE prefix pass (octave-bucket kernel + partitioned
    within-bucket windows, zero global windows, the Kruskal-Wallis
    shape with four running sums). E and the e-statistic are the
    only double arithmetic, mirrored and rounded at 6 dp.

    Scale: one cent-grain hash-agg over the fact table; everything
    after runs on cent-grain and 1-row frames. Output (1 row):
    n_x, n_y, a_cross, b_within_x, c_within_y, energy_dist, e_stat.
    """
    ev = events.filter(
        F.col("event_type").isin("purchase", "click")
        & F.col("value").isNotNull()
    ).select(
        F.round(F.col("value") * 100, 0).cast("bigint").alias("v"),
        (F.col("event_type") == "purchase").alias("is_x"),
    )
    vg = ev.groupBy("v").agg(
        F.sum(F.when(F.col("is_x"), 1).otherwise(0)).alias("cx"),
        F.sum(F.when(F.col("is_x"), 0).otherwise(1)).alias("cy"),
    ).select(
        "v",
        "cx",
        "cy",
        (F.col("cx") * F.col("v")).alias("sx"),
        (F.col("cy") * F.col("v")).alias("sy"),
    )
    cols = ["cx", "cy", "sx", "sy"]
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    pre = _cent_prefix(vg, cols, value_col="v").select(
        "v",
        "cx",
        "cy",
        *[F.col(f"_pre_{c}").alias(f"p{c}") for c in cols],
    )
    tot = vg.agg(
        F.sum("cx").alias("nx"),
        F.sum("cy").alias("ny"),
        F.sum("sx").alias("tsx"),
        F.sum("sy").alias("tsy"),
    )
    j = pre.crossJoin(F.broadcast(tot))

    def _term(cnt: str, pn: str, ps: str, tn, ts) -> F.Column:
        below = dec(F.col("v")) * dec(F.col(pn)) - dec(F.col(ps))
        above = (
            dec(ts)
            - dec(F.col(ps))
            - dec(F.col("v")) * dec(F.col(cnt))
        ) - dec(F.col("v")) * (
            dec(tn) - dec(F.col(pn)) - dec(F.col(cnt))
        )
        return below + above

    m = j.agg(
        F.max("nx").alias("nx"),
        F.max("ny").alias("ny"),
        F.sum(
            dec(F.col("cx"))
            * _term("cy", "pcy", "psy", F.col("ny"), F.col("tsy"))
        ).alias("a"),
        F.sum(
            dec(F.col("cx"))
            * _term("cx", "pcx", "psx", F.col("nx"), F.col("tsx"))
        ).alias("b"),
        F.sum(
            dec(F.col("cy"))
            * _term("cy", "pcy", "psy", F.col("ny"), F.col("tsy"))
        ).alias("c"),
    )
    nd, md = F.col("nx").cast("double"), F.col("ny").cast("double")
    e = (
        2 * F.col("a").cast("double") / (nd * md)
        - F.col("b").cast("double") / (nd * nd)
        - F.col("c").cast("double") / (md * md)
    )
    return m.select(
        F.col("nx").alias("n_x"),
        F.col("ny").alias("n_y"),
        F.col("a").cast("decimal(38,0)").alias("a_cross"),
        F.col("b").cast("decimal(38,0)").alias("b_within_x"),
        F.col("c").cast("decimal(38,0)").alias("c_within_y"),
        F.round(e, 6).alias("energy_dist"),
        F.round(nd * md / (nd + md) * e, 6).alias("e_stat"),
    )


ORACLE_ENERGY = """
en_v AS (
  SELECT CAST(round(value * 100, 0) AS BIGINT) AS v,
         event_type = 'purchase' AS is_x
  FROM events WHERE event_type IN ('purchase', 'click')
    AND value IS NOT NULL
),
en_g AS (
  SELECT v,
         CAST(sum(CASE WHEN is_x THEN 1 ELSE 0 END) AS BIGINT)
           AS cx,
         CAST(sum(CASE WHEN is_x THEN 0 ELSE 1 END) AS BIGINT)
           AS cy
  FROM en_v GROUP BY 1
),
en_p AS (
  SELECT v, cx, cy,
         CAST(coalesce(sum(cx) OVER w, 0) AS BIGINT) AS pcx,
         CAST(coalesce(sum(cy) OVER w, 0) AS BIGINT) AS pcy,
         CAST(coalesce(sum(cx * v) OVER w, 0) AS BIGINT) AS psx,
         CAST(coalesce(sum(cy * v) OVER w, 0) AS BIGINT) AS psy
  FROM en_g
  WINDOW w AS (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
en_t AS (
  SELECT CAST(sum(cx) AS BIGINT) AS nx,
         CAST(sum(cy) AS BIGINT) AS ny,
         CAST(sum(cx * v) AS BIGINT) AS tsx,
         CAST(sum(cy * v) AS BIGINT) AS tsy
  FROM en_g
),
en_m AS (
  SELECT nx, ny,
         CAST(sum(CAST(cx AS HUGEINT)
           * ((CAST(v AS HUGEINT) * pcy - psy)
              + ((CAST(tsy AS HUGEINT) - psy - CAST(v AS HUGEINT)
                  * cy)
                 - CAST(v AS HUGEINT) * (CAST(ny AS HUGEINT) - pcy
                                         - cy)))) AS HUGEINT) AS a,
         CAST(sum(CAST(cx AS HUGEINT)
           * ((CAST(v AS HUGEINT) * pcx - psx)
              + ((CAST(tsx AS HUGEINT) - psx - CAST(v AS HUGEINT)
                  * cx)
                 - CAST(v AS HUGEINT) * (CAST(nx AS HUGEINT) - pcx
                                         - cx)))) AS HUGEINT) AS b,
         CAST(sum(CAST(cy AS HUGEINT)
           * ((CAST(v AS HUGEINT) * pcy - psy)
              + ((CAST(tsy AS HUGEINT) - psy - CAST(v AS HUGEINT)
                  * cy)
                 - CAST(v AS HUGEINT) * (CAST(ny AS HUGEINT) - pcy
                                         - cy)))) AS HUGEINT) AS c
  FROM en_p, en_t GROUP BY 1, 2
),
energy_distance AS (
  SELECT nx AS n_x, ny AS n_y,
         CAST(a AS DECIMAL(38, 0)) AS a_cross,
         CAST(b AS DECIMAL(38, 0)) AS b_within_x,
         CAST(c AS DECIMAL(38, 0)) AS c_within_y,
         round(2 * CAST(a AS DOUBLE) / (CAST(nx AS DOUBLE)
               * CAST(ny AS DOUBLE))
               - CAST(b AS DOUBLE) / (CAST(nx AS DOUBLE)
                                      * CAST(nx AS DOUBLE))
               - CAST(c AS DOUBLE) / (CAST(ny AS DOUBLE)
                                      * CAST(ny AS DOUBLE)), 6)
           AS energy_dist,
         round(CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE)
               / (CAST(nx AS DOUBLE) + CAST(ny AS DOUBLE))
               * (2 * CAST(a AS DOUBLE) / (CAST(nx AS DOUBLE)
                  * CAST(ny AS DOUBLE))
                  - CAST(b AS DOUBLE) / (CAST(nx AS DOUBLE)
                                         * CAST(nx AS DOUBLE))
                  - CAST(c AS DOUBLE) / (CAST(ny AS DOUBLE)
                                         * CAST(ny AS DOUBLE))), 6)
           AS e_stat
  FROM en_m
)
"""


# ---------------------------------------------------------------------------
# seasonality / trend strength (STL summary, Hyndman & Athanasopoulos)
# ---------------------------------------------------------------------------


def seasonality_strength(events: DataFrame) -> DataFrame:
    """Seasonality and trend STRENGTH of the daily event series —
    the two 0..1 numbers (Hyndman & Athanasopoulos, FPP3 ch. 4.4)
    that summarize the whole ``events_stl_decompose`` table:
        F_s = max(0, 1 - Var(R) / Var(S + R))
        F_t = max(0, 1 - Var(R) / Var(T + R))
    answering "is the day-of-week cycle real, and is there a trend
    worth modeling" before anyone commits to a seasonal forecaster.

    Pure composition of the verified STL components: one hash-agg
    over the day-grain decomposition collects n, Σ and Σ² of R,
    S+R, and T+R (the components are 6-dp-rounded doubles, so the
    sums fold identically in both engines at day-grain cardinality);
    each strength is one mirrored double chain, rounded at 6 dp.

    Output (1 row): n_days, f_seasonal, f_trend, seasonal_is_real
    (F_s > 0.64 — the usual "strong seasonality" reading).
    """
    comp = stl_decompose(events).select(
        F.col("remainder").alias("r"),
        (F.col("seasonal") + F.col("remainder")).alias("sr"),
        (F.col("trend") + F.col("remainder")).alias("tr"),
    )
    m = comp.agg(
        F.count("*").alias("n"),
        F.sum("r").alias("s_r"),
        F.sum(F.col("r") * F.col("r")).alias("q_r"),
        F.sum("sr").alias("s_sr"),
        F.sum(F.col("sr") * F.col("sr")).alias("q_sr"),
        F.sum("tr").alias("s_tr"),
        F.sum(F.col("tr") * F.col("tr")).alias("q_tr"),
    )
    nd = F.col("n").cast("double")

    def _var(q: str, s: str) -> F.Column:
        return F.col(q) / nd - (F.col(s) / nd) * (F.col(s) / nd)

    fs = F.greatest(
        F.lit(0.0), 1 - _var("q_r", "s_r") / _var("q_sr", "s_sr")
    )
    ft = F.greatest(
        F.lit(0.0), 1 - _var("q_r", "s_r") / _var("q_tr", "s_tr")
    )
    return m.select(
        F.col("n").alias("n_days"),
        F.round(fs, 6).alias("f_seasonal"),
        F.round(ft, 6).alias("f_trend"),
        (F.round(fs, 6) > 0.64).alias("seasonal_is_real"),
    )


ORACLE_SEASONALITY = """
sstr_c AS (
  SELECT remainder AS r, seasonal + remainder AS sr,
         trend + remainder AS tr
  FROM stl_decompose
),
sstr_m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         sum(r) AS s_r, sum(r * r) AS q_r,
         sum(sr) AS s_sr, sum(sr * sr) AS q_sr,
         sum(tr) AS s_tr, sum(tr * tr) AS q_tr
  FROM sstr_c
),
seasonality_strength AS (
  SELECT n AS n_days,
         round(greatest(0.0, 1 - (q_r / CAST(n AS DOUBLE)
                 - (s_r / CAST(n AS DOUBLE))
                   * (s_r / CAST(n AS DOUBLE)))
               / (q_sr / CAST(n AS DOUBLE)
                  - (s_sr / CAST(n AS DOUBLE))
                    * (s_sr / CAST(n AS DOUBLE)))), 6) AS f_seasonal,
         round(greatest(0.0, 1 - (q_r / CAST(n AS DOUBLE)
                 - (s_r / CAST(n AS DOUBLE))
                   * (s_r / CAST(n AS DOUBLE)))
               / (q_tr / CAST(n AS DOUBLE)
                  - (s_tr / CAST(n AS DOUBLE))
                    * (s_tr / CAST(n AS DOUBLE)))), 6) AS f_trend,
         round(greatest(0.0, 1 - (q_r / CAST(n AS DOUBLE)
                 - (s_r / CAST(n AS DOUBLE))
                   * (s_r / CAST(n AS DOUBLE)))
               / (q_sr / CAST(n AS DOUBLE)
                  - (s_sr / CAST(n AS DOUBLE))
                    * (s_sr / CAST(n AS DOUBLE)))), 6) > 0.64
           AS seasonal_is_real
  FROM sstr_m
)
"""


# ---------------------------------------------------------------------------
# Mood's median test (k-group location test on the grand median)
# ---------------------------------------------------------------------------


def mood_median_test(events: DataFrame) -> DataFrame:
    """Mood's median test: do the five event types straddle the GRAND
    median of value differently — the maximally outlier-robust
    k-group location test (only above/below survives), the blunt
    cousin of Kruskal-Wallis (``events_kruskal_wallis``) that stays
    valid under wildly different group shapes.

    The grand median is the smallest value whose inclusive
    cumulative count reaches (n+1)/2 under FLOAT division — i.e. the
    lower median for odd n and the UPPER median (rank n/2 + 1) for
    even n; both engines mirror this upper-median convention. It is
    selected by the same zero-global-window bucketed prefix
    machinery as ``events_median_ci``; values EQUAL to it are
    dropped (documented convention). The k x 2 contingency table is
    then one conditional hash-agg, and chi2 = sum (O-E)^2/E
    assembles from the k=5 rows with E = row*col/T — exact integer
    counts into one mirrored double chain, rounded at 6 dp.

    Two corpus passes (value-grain agg; above/below count against
    the broadcast 1-row median). Output (1 row): k, n_used,
    n_ties_dropped, grand_median_cents, chi2, significant (df=4
    convention of the fixture's k=5 — same literal as the KW test).
    """
    cg = events.filter(F.col("value").isNotNull()).select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("c"),
    )
    vg = cg.groupBy("c").agg(F.count("*").alias("cnt"))
    cum = _cent_prefix(vg, ["cnt"], inclusive=True).select(
        "c", F.col("_pre_cnt").alias("cum")
    )
    tot = vg.agg(F.sum("cnt").alias("n"))
    med = (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            F.min(
                F.when(
                    F.col("cum") >= (F.col("n") + 1) / 2,
                    F.col("c"),
                )
            ).alias("med")
        )
    )
    g = (
        cg.crossJoin(F.broadcast(med))
        .groupBy("event_type")
        .agg(
            F.sum((F.col("c") > F.col("med")).cast("bigint")).alias(
                "ab"
            ),
            F.sum((F.col("c") < F.col("med")).cast("bigint")).alias(
                "be"
            ),
            F.sum((F.col("c") == F.col("med")).cast("bigint")).alias(
                "ti"
            ),
            F.max("med").alias("med"),
        )
    )
    m = g.agg(
        F.count("*").alias("k"),
        F.sum("ab").alias("ta"),
        F.sum("be").alias("tb"),
        F.sum("ti").alias("tt"),
        F.max("med").alias("med"),
        F.sum(
            F.col("ab").cast("double") * F.col("ab").cast("double")
            / (F.col("ab") + F.col("be")).cast("double")
        ).alias("qa"),
        F.sum(
            F.col("be").cast("double") * F.col("be").cast("double")
            / (F.col("ab") + F.col("be")).cast("double")
        ).alias("qb"),
    )
    tu = (F.col("ta") + F.col("tb")).cast("double")
    chi = tu * (
        F.col("qa") / F.col("ta").cast("double")
        + F.col("qb") / F.col("tb").cast("double")
    ) - tu
    return m.select(
        "k",
        (F.col("ta") + F.col("tb")).alias("n_used"),
        F.col("tt").alias("n_ties_dropped"),
        F.col("med").alias("grand_median_cents"),
        F.round(chi, 6).alias("chi2"),
        (F.round(chi, 6) > KRUSKAL_CHI2_CRIT_05).alias("significant"),
    )


ORACLE_MOOD = f"""
md_c AS (
  SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL
),
md_v AS (
  SELECT c, CAST(count(*) AS BIGINT) AS cnt FROM md_c GROUP BY 1
),
md_cum AS (
  SELECT c, CAST(sum(cnt) OVER (ORDER BY c
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
    AS cum
  FROM md_v
),
md_m AS (
  SELECT min(CASE WHEN cum >= (n + 1) / 2 THEN c END) AS med
  FROM md_cum, (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM md_v)
),
md_g AS (
  SELECT event_type,
         CAST(sum(CASE WHEN c > med THEN 1 ELSE 0 END) AS BIGINT)
           AS ab,
         CAST(sum(CASE WHEN c < med THEN 1 ELSE 0 END) AS BIGINT)
           AS be,
         CAST(sum(CASE WHEN c = med THEN 1 ELSE 0 END) AS BIGINT)
           AS ti,
         CAST(max(med) AS BIGINT) AS med
  FROM md_c, md_m GROUP BY 1
),
md_a AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
         CAST(sum(ab) AS BIGINT) AS ta,
         CAST(sum(be) AS BIGINT) AS tb,
         CAST(sum(ti) AS BIGINT) AS tt,
         CAST(max(med) AS BIGINT) AS med,
         sum(CAST(ab AS DOUBLE) * CAST(ab AS DOUBLE)
             / CAST(ab + be AS DOUBLE)) AS qa,
         sum(CAST(be AS DOUBLE) * CAST(be AS DOUBLE)
             / CAST(ab + be AS DOUBLE)) AS qb
  FROM md_g
),
mood_median_test AS (
  SELECT k, ta + tb AS n_used, tt AS n_ties_dropped,
         med AS grand_median_cents,
         round(CAST(ta + tb AS DOUBLE)
               * (qa / CAST(ta AS DOUBLE) + qb / CAST(tb AS DOUBLE))
               - CAST(ta + tb AS DOUBLE), 6) AS chi2,
         round(CAST(ta + tb AS DOUBLE)
               * (qa / CAST(ta AS DOUBLE) + qb / CAST(tb AS DOUBLE))
               - CAST(ta + tb AS DOUBLE), 6)
           > {KRUSKAL_CHI2_CRIT_05} AS significant
  FROM md_a
)
"""


# ---------------------------------------------------------------------------
# record-value test (trend detection by counting record days)
# ---------------------------------------------------------------------------


def record_days_test(events: DataFrame) -> DataFrame:
    """Record-value trend test on daily revenue: count the days that
    set a new all-time high. Under exchangeability (no trend) the
    expected record count is the harmonic number H_n and
    Var = H_n - H_n^(2), both distribution-FREE — so an excess of
    records is trend evidence that needs no magnitude assumptions at
    all, the third leg beside Mann-Kendall (pair signs,
    ``events_robust_trend``) and runs (``events_runs_test``).

    Zero windows: the day-grain series packs into one sorted array
    (calendar-bounded at any corpus scale) and the running-max fold
    counts records executor-side; H_n and H_n^(2) fold over
    sequence(1, n) in the same order in both engines (DuckDB replays
    the record count with a MAX OVER and the harmonic sums with
    list_transform — same IEEE additions). The first day is a record
    by convention (H_n includes the i=1 term).

    Output (1 row): n_days, n_records, expected, z, trending
    (one-sided z > 1.645).
    """
    daily = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
            .alias("rev")
        )
    )
    packed = daily.agg(
        F.sort_array(F.collect_list(F.struct("d", "rev"))).alias("s")
    )
    m = packed.select(
        F.expr("size(s)").alias("n"),
        F.expr(
            "aggregate(s,"
            " named_struct('mx', cast(-1 as bigint),"
            "              'r', cast(0 as bigint)),"
            " (acc, x) -> named_struct("
            "  'mx', greatest(acc.mx, x.rev),"
            "  'r', acc.r + if(x.rev > acc.mx, 1, 0))).r"
        ).alias("n_records"),
        F.expr(
            "aggregate(sequence(1, size(s)), cast(0.0 as double),"
            " (a, i) -> a + 1.0 / i)"
        ).alias("h1"),
        F.expr(
            "aggregate(sequence(1, size(s)), cast(0.0 as double),"
            " (a, i) -> a + 1.0 / (cast(i as double) * i))"
        ).alias("h2"),
    )
    z = (F.col("n_records").cast("double") - F.col("h1")) / F.sqrt(
        F.col("h1") - F.col("h2")
    )
    return m.select(
        F.col("n").alias("n_days"),
        "n_records",
        F.round(F.col("h1"), 6).alias("expected"),
        F.round(z, 6).alias("z"),
        (F.round(z, 6) > 1.645).alias("trending"),
    )


ORACLE_RECORDS = """
rd_d AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS rev
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
rd_f AS (
  SELECT CASE WHEN rev > coalesce(max(rev) OVER (ORDER BY d
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
         THEN 1 ELSE 0 END AS isrec
  FROM rd_d
),
rd_r AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(isrec) AS BIGINT) AS n_records
  FROM rd_f
),
rd_h AS (
  SELECT n, n_records,
         list_aggregate(list_transform(range(1, n + 1),
           i -> 1.0 / i), 'sum') AS h1,
         list_aggregate(list_transform(range(1, n + 1),
           i -> 1.0 / (CAST(i AS DOUBLE) * i)), 'sum') AS h2
  FROM rd_r
),
record_days_test AS (
  SELECT n AS n_days, n_records, round(h1, 6) AS expected,
         round((CAST(n_records AS DOUBLE) - h1) / sqrt(h1 - h2), 6)
           AS z,
         round((CAST(n_records AS DOUBLE) - h1) / sqrt(h1 - h2), 6)
           > 1.645 AS trending
  FROM rd_h
)
"""


# ---------------------------------------------------------------------------
# turning-points randomness test (local extrema count)
# ---------------------------------------------------------------------------


def turning_points_test(events: DataFrame) -> DataFrame:
    """Turning-points test of the daily revenue series: count the
    interior days that are strict local maxima or minima. An i.i.d.
    series has E[T] = 2(n-2)/3 and Var[T] = (16n-29)/90 — too FEW
    turning points means momentum/trend, too MANY means oscillation
    (negative autocorrelation); the classic Kendall randomness check
    beside runs (``events_runs_test``, signs vs median) and records
    (``events_record_days``, all-time highs). Plateaus (a day equal
    to a neighbor) are not turning points under the strict-extremum
    convention (documented; exact in integer cents).

    Zero windows: the calendar-bounded day series packs into one
    sorted array and the triple scan is a single higher-order filter;
    the moments are closed forms of n. Output (1 row): n_days,
    n_turning, expected, z, nonrandom (|z| > 1.96).
    """
    daily = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
            .alias("rev")
        )
    )
    packed = daily.agg(
        F.sort_array(F.collect_list(F.struct("d", "rev"))).alias("s")
    )
    m = packed.select(
        F.expr("size(s)").alias("n"),
        F.expr(
            "size(filter(sequence(2, size(s) - 1), i ->"
            " (s[i - 1].rev > s[i - 2].rev"
            "  AND s[i - 1].rev > s[i].rev)"
            " OR (s[i - 1].rev < s[i - 2].rev"
            "     AND s[i - 1].rev < s[i].rev)))"
        ).cast("bigint").alias("t"),
    )
    nd = F.col("n").cast("double")
    exp_t = 2 * (nd - 2) / 3
    var_t = (16 * nd - 29) / 90
    z = (F.col("t").cast("double") - exp_t) / F.sqrt(var_t)
    return m.select(
        F.col("n").alias("n_days"),
        F.col("t").alias("n_turning"),
        F.round(exp_t, 6).alias("expected"),
        F.round(z, 6).alias("z"),
        (F.abs(F.round(z, 6)) > 1.96).alias("nonrandom"),
    )


ORACLE_TURNING = """
tp_d AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS rev
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
tp_l AS (
  SELECT rev,
         lag(rev) OVER (ORDER BY d) AS prev,
         lead(rev) OVER (ORDER BY d) AS nxt
  FROM tp_d
),
tp_m AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM tp_d) AS n,
         CAST(sum(CASE WHEN (rev > prev AND rev > nxt)
                         OR (rev < prev AND rev < nxt)
                  THEN 1 ELSE 0 END) AS BIGINT) AS t
  FROM tp_l WHERE prev IS NOT NULL AND nxt IS NOT NULL
),
turning_points_test AS (
  SELECT n AS n_days, t AS n_turning,
         round(2 * (CAST(n AS DOUBLE) - 2) / 3, 6) AS expected,
         round((CAST(t AS DOUBLE)
                - 2 * (CAST(n AS DOUBLE) - 2) / 3)
               / sqrt((16 * CAST(n AS DOUBLE) - 29) / 90), 6) AS z,
         abs(round((CAST(t AS DOUBLE)
                - 2 * (CAST(n AS DOUBLE) - 2) / 3)
               / sqrt((16 * CAST(n AS DOUBLE) - 29) / 90), 6)) > 1.96
           AS nonrandom
  FROM tp_m
)
"""


# ---------------------------------------------------------------------------
# power-of-two ordering policies vs the Wagner-Whitin optimum
# ---------------------------------------------------------------------------

#: power-of-two ordering intervals evaluated: 2^0 .. 2^POTWO_MAX_EXP
#: months (128 covers any calendar the lot-sizing envelope covers).
POTWO_MAX_EXP = 7


def potwo_policy_eval(orders: DataFrame) -> DataFrame:
    """Power-of-two ordering policies against the exact Wagner-Whitin
    optimum (``orders_lot_sizing``): order every 2^j months
    (skipping empty cycles), j = 0..{J} — the restricted policy
    class operations actually run because it synchronizes across
    SKUs, with the classic result that the best power-of-two is
    within ~6% of optimal under stationary demand. This query prices
    that gap EXACTLY on the real demand series.

    All integers: each cycle's holding cost folds from the same
    (t - cycle_start) * d_t terms as the WW edge costs via one
    (interval, cycle) hash-agg over the months x {NJ} policy grid
    (calendar-bounded), and the optimum joins in from the verified
    DP frontier's last row. vs_optimal_pct is the single rounded
    division; ties on the best policy break toward the shorter
    interval via the exact integer comparison.

    Output ({NJ} rows): interval_months, n_orders_placed,
    total_cost_cents, optimal_cost_cents, vs_optimal_pct, is_best.
    """
    m = orders.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("mon")
    ).agg(F.count("*").alias("d"))
    idx = (
        m.join(
            m.select(F.col("mon").alias("mon2")),
            F.col("mon2") <= F.col("mon"),
        )
        .groupBy("mon", "d")
        .agg(F.count("*").alias("t"))
    )
    exps = idx.sparkSession.range(POTWO_MAX_EXP + 1).select(
        F.expr("shiftleft(cast(1 as bigint), cast(id as int))").alias(
            "l"
        )
    )
    cyc = (
        idx.crossJoin(F.broadcast(exps))
        .withColumn(
            "c0",
            (F.col("t") - 1) - (F.col("t") - 1) % F.col("l"),
        )
        .groupBy("l", "c0")
        .agg(
            F.sum(
                (F.col("t") - 1 - F.col("c0")) * F.col("d")
            ).alias("hold"),
            F.sum("d").alias("dem"),
        )
    )
    per_l = cyc.groupBy("l").agg(
        F.sum((F.col("dem") > 0).cast("bigint")).alias(
            "n_orders_placed"
        ),
        F.sum(
            F.when(
                F.col("dem") > 0,
                F.lit(LOT_SETUP_CENTS)
                + F.lit(LOT_HOLD_CENTS) * F.col("hold"),
            ).otherwise(F.lit(0).cast("bigint"))
        ).alias("total_cost_cents"),
    )
    opt = lot_sizing_frontier(orders).agg(
        F.max_by("opt_cost_cents", "month_idx").alias("opt")
    )
    best = per_l.agg(F.min("total_cost_cents").alias("bc"))
    return (
        per_l.crossJoin(F.broadcast(opt))
        .crossJoin(F.broadcast(best))
        .select(
            F.col("l").alias("interval_months"),
            "n_orders_placed",
            "total_cost_cents",
            F.col("opt").alias("optimal_cost_cents"),
            F.round(
                100
                * F.col("total_cost_cents").cast("double")
                / F.col("opt").cast("double"),
                6,
            ).alias("vs_optimal_pct"),
            (F.col("total_cost_cents") == F.col("bc")).alias(
                "is_best"
            ),
        )
    )


potwo_policy_eval.__doc__ = potwo_policy_eval.__doc__.format(
    J=POTWO_MAX_EXP, NJ=POTWO_MAX_EXP + 1
)


def oracle_potwo(
    setup: int = LOT_SETUP_CENTS,
    hold: int = LOT_HOLD_CENTS,
    max_exp: int = POTWO_MAX_EXP,
) -> str:
    exps = " UNION ALL ".join(
        f"SELECT CAST({1 << j} AS BIGINT) AS l"
        for j in range(max_exp + 1)
    )
    return f"""
pt_e AS ({exps}),
pt_c AS (
  SELECT e.l, (i.t - 1) - (i.t - 1) % e.l AS c0,
         CAST(sum((i.t - 1 - ((i.t - 1) - (i.t - 1) % e.l)) * i.d)
              AS BIGINT) AS hold,
         CAST(sum(i.d) AS BIGINT) AS dem
  FROM ww_i i, pt_e e GROUP BY 1, 2
),
pt_l AS (
  SELECT l,
         CAST(sum(CASE WHEN dem > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_orders_placed,
         CAST(sum(CASE WHEN dem > 0 THEN {setup} + {hold} * hold
                  ELSE 0 END) AS BIGINT) AS total_cost_cents
  FROM pt_c GROUP BY 1
),
pt_o AS (
  SELECT arg_max(opt_cost_cents, month_idx) AS opt FROM lot_sizing
),
pt_b AS (SELECT min(total_cost_cents) AS bc FROM pt_l),
potwo_policy AS (
  SELECT l AS interval_months, n_orders_placed, total_cost_cents,
         opt AS optimal_cost_cents,
         round(100 * CAST(total_cost_cents AS DOUBLE)
               / CAST(opt AS DOUBLE), 6) AS vs_optimal_pct,
         total_cost_cents = bc AS is_best
  FROM pt_l, pt_o, pt_b
)"""


# ---------------------------------------------------------------------------
# Jarque-Bera normality test (moment-based, exact raw power sums)
# ---------------------------------------------------------------------------

#: chi-square critical value at alpha=.05, df=2 (the JB reference).
JB_CHI2_CRIT_05 = 5.991


def jarque_bera_test(events: DataFrame) -> DataFrame:
    """Jarque-Bera NORMALITY test of purchase value — the question
    every parametric user of this engine's t/z/ANOVA family is
    implicitly assuming away: are the values even close to Gaussian?
    JB = n/6 * (skew^2 + kurtosis_excess^2/4) ~ chi2(2) under
    normality; heavy tails or asymmetry reject.

    ONE map-side-combinable hash-agg collects the exact raw power
    sums S1..S4 in DECIMAL(38,0)/HUGEINT (c^4 at 5-digit cents is
    ~6e18 per row — past BIGINT, inside DECIMAL up to ~1e15 rows);
    the central moments, g1, g2 and JB assemble from the single
    moment row in one mirrored double chain, rounded at 6 dp. The
    sample skewness/kurtosis themselves are emitted — the
    distribution-shape readout next to the robust quartile version
    (``events_quartile_skew``).

    Output (1 row): n, skewness, kurtosis_excess, jb_stat, normal.
    """
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    c = F.col("c")
    m = (
        events.filter(
            (F.col("event_type") == "purchase")
            & F.col("value").isNotNull()
        )
        .select(
            F.round(F.col("value") * 100, 0).cast("bigint").alias("c")
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(dec(c)).alias("s1"),
            F.sum(dec(c) * dec(c)).alias("s2"),
            F.sum(dec(c) * dec(c) * dec(c)).alias("s3"),
            F.sum(dec(c) * dec(c) * dec(c) * dec(c)).alias("s4"),
        )
    )
    nd = F.col("n").cast("double")
    mu = F.col("s1").cast("double") / nd
    r2 = F.col("s2").cast("double") / nd
    r3 = F.col("s3").cast("double") / nd
    r4 = F.col("s4").cast("double") / nd
    m2 = r2 - mu * mu
    m3 = r3 - 3 * mu * r2 + 2 * mu * mu * mu
    m4 = r4 - 4 * mu * r3 + 6 * mu * mu * r2 - 3 * mu * mu * mu * mu
    g1 = m3 / F.sqrt(m2 * m2 * m2)
    g2 = m4 / (m2 * m2) - 3
    jb = nd / 6 * (g1 * g1 + g2 * g2 / 4)
    return m.select(
        "n",
        F.round(g1, 6).alias("skewness"),
        F.round(g2, 6).alias("kurtosis_excess"),
        F.round(jb, 6).alias("jb_stat"),
        (F.round(jb, 6) <= JB_CHI2_CRIT_05).alias("normal"),
    )


ORACLE_JARQUE_BERA = f"""
jb_m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(c AS HUGEINT)) AS HUGEINT) AS s1,
         CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS s2,
         CAST(sum(CAST(c AS HUGEINT) * c * c) AS HUGEINT) AS s3,
         CAST(sum(CAST(c AS HUGEINT) * c * c * c) AS HUGEINT) AS s4
  FROM (SELECT CAST(round(value * 100, 0) AS BIGINT) AS c
        FROM events
        WHERE event_type = 'purchase' AND value IS NOT NULL)
),
jb_r AS (
  SELECT n, CAST(s1 AS DOUBLE) / n AS mu,
         CAST(s2 AS DOUBLE) / n AS r2,
         CAST(s3 AS DOUBLE) / n AS r3,
         CAST(s4 AS DOUBLE) / n AS r4
  FROM jb_m
),
jb_c AS (
  SELECT n, r2 - mu * mu AS m2,
         r3 - 3 * mu * r2 + 2 * mu * mu * mu AS m3,
         r4 - 4 * mu * r3 + 6 * mu * mu * r2
            - 3 * mu * mu * mu * mu AS m4
  FROM jb_r
),
jb_g AS (
  SELECT n, m3 / sqrt(m2 * m2 * m2) AS g1,
         m4 / (m2 * m2) - 3 AS g2
  FROM jb_c
),
jarque_bera AS (
  SELECT n, round(g1, 6) AS skewness,
         round(g2, 6) AS kurtosis_excess,
         round(CAST(n AS DOUBLE) / 6 * (g1 * g1 + g2 * g2 / 4), 6)
           AS jb_stat,
         round(CAST(n AS DOUBLE) / 6 * (g1 * g1 + g2 * g2 / 4), 6)
           <= {JB_CHI2_CRIT_05} AS normal
  FROM jb_g
)
"""


# ---------------------------------------------------------------------------
# quartile (Bowley) skewness — robust shape readout
# ---------------------------------------------------------------------------


def quartile_skew(events: DataFrame) -> DataFrame:
    """Bowley quartile skewness of purchase value — the
    outlier-immune shape readout beside the moment version inside
    ``events_jarque_bera`` (whose g1 a single fat order can move
    arbitrarily; Bowley is bounded in [-1, 1] and touches only
    order statistics): B = (Q3 + Q1 - 2*Q2) / (Q3 - Q1).

    EXACT quartiles: Q_k = min value whose cumulative count reaches
    rank ceil(k*n/4) = (k*n + 3) div 4 — pure integer ranks, no
    interpolation convention to mismatch — selected by the same
    zero-global-window bucketed prefix machinery as
    ``events_median_ci``. B is the single rounded division.

    Output (1 row): n, q1_cents, q2_cents, q3_cents, iqr_cents,
    bowley_skew.
    """
    ev = events.filter(
        (F.col("event_type") == "purchase")
        & F.col("value").isNotNull()
    ).select(
        F.round(F.col("value") * 100, 0).cast("bigint").alias("c")
    )
    vg = ev.groupBy("c").agg(F.count("*").alias("cnt"))
    cum = _cent_prefix(vg, ["cnt"], inclusive=True).select(
        "c", F.col("_pre_cnt").alias("cum")
    )
    tot = vg.agg(F.sum("cnt").alias("n"))
    j = cum.crossJoin(F.broadcast(tot))

    def _q(k: int) -> F.Column:
        rank = F.expr(f"({k} * n + 3) div 4")
        return F.min(F.when(F.col("cum") >= rank, F.col("c")))

    m = j.groupBy("n").agg(
        _q(1).alias("q1"), _q(2).alias("q2"), _q(3).alias("q3")
    )
    b = F.when(
        F.col("q3") > F.col("q1"),
        F.round(
            (
                F.col("q3") + F.col("q1") - 2 * F.col("q2")
            ).cast("double")
            / (F.col("q3") - F.col("q1")).cast("double"),
            6,
        ),
    )
    return m.select(
        "n",
        F.col("q1").alias("q1_cents"),
        F.col("q2").alias("q2_cents"),
        F.col("q3").alias("q3_cents"),
        (F.col("q3") - F.col("q1")).alias("iqr_cents"),
        b.alias("bowley_skew"),
    )


ORACLE_QUARTILE_SKEW = """
qs_v AS (
  SELECT c, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT CAST(round(value * 100, 0) AS BIGINT) AS c
        FROM events WHERE event_type = 'purchase'
          AND value IS NOT NULL)
  GROUP BY 1
),
qs_c AS (
  SELECT c, CAST(sum(cnt) OVER (ORDER BY c
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
    AS cum
  FROM qs_v
),
qs_m AS (
  SELECT n,
         min(CASE WHEN cum >= (1 * n + 3) // 4 THEN c END) AS q1,
         min(CASE WHEN cum >= (2 * n + 3) // 4 THEN c END) AS q2,
         min(CASE WHEN cum >= (3 * n + 3) // 4 THEN c END) AS q3
  FROM qs_c, (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM qs_v)
  GROUP BY n
),
quartile_skew AS (
  SELECT n, q1 AS q1_cents, q2 AS q2_cents, q3 AS q3_cents,
         q3 - q1 AS iqr_cents,
         CASE WHEN q3 > q1 THEN
           round(CAST(q3 + q1 - 2 * q2 AS DOUBLE)
                 / CAST(q3 - q1 AS DOUBLE), 6)
         END AS bowley_skew
  FROM qs_m
)
"""


# ---------------------------------------------------------------------------
# Ansari-Bradley test (rank-based two-sample SCALE test)
# ---------------------------------------------------------------------------


def ansari_bradley(events: DataFrame) -> DataFrame:
    """Ansari-Bradley test: do purchase and click values differ in
    SPREAD (same-ish center assumed) — the rank-based scale test
    beside the parametric Hartley/Levene pair: each observation
    scores min(rank, N+1-rank) (extremes score low, the middle
    high), so a sample squeezed toward the center scores HIGH.

    EXACT INTEGER scores with the mid-rank convention: on the merged
    cent grain the doubled mid-rank 2r = 2*pre + cnt + 1 comes from
    the octave-bucket kernel (zero global windows, the KW shape) and
    the doubled score 2s = least(2r, 2*(N+1) - 2r) stays integer, so
    AB2 = sum cx*2s is an exact BIGINT. The no-tie null moments
    (parity-split closed forms: E = n(N+2)/4 / n(N+1)^2/(4N),
    Var = nm(N+2)(N-2)/(48(N-1)) / nm(N+1)(3+N^2)/(48N^2)) give the
    normal z — documented convention: mid-rank scores with the
    no-tie variance, conservative at cent grain where ties are a
    vanishing fraction.

    Output (1 row): n_x, n_y, ab2_score, z, scale_differs
    (|z| > 1.96).
    """
    ev = events.filter(
        F.col("event_type").isin("purchase", "click")
        & F.col("value").isNotNull()
    ).select(
        F.round(F.col("value") * 100, 0).cast("bigint").alias("c"),
        (F.col("event_type") == "purchase").alias("is_x"),
    )
    vg = ev.groupBy("c").agg(
        F.sum(F.when(F.col("is_x"), 1).otherwise(0)).alias("cx"),
        F.count("*").alias("cnt"),
    )
    pre = _cent_prefix(vg, ["cnt"]).select(
        "c", "cx", "cnt", F.col("_pre_cnt").alias("pre")
    )
    tot = vg.agg(
        F.sum("cnt").alias("nn"), F.sum("cx").alias("nx")
    )
    j = pre.crossJoin(F.broadcast(tot))
    r2 = 2 * F.col("pre") + F.col("cnt") + 1
    s2 = F.least(r2, 2 * (F.col("nn") + 1) - r2)
    m = j.groupBy("nn", "nx").agg(
        F.sum(F.col("cx") * s2).alias("ab2")
    )
    nd = F.col("nn").cast("double")
    xd = F.col("nx").cast("double")
    yd = nd - xd
    even = F.col("nn") % 2 == 0
    e_ab = F.when(even, xd * (nd + 2) / 4).otherwise(
        xd * (nd + 1) * (nd + 1) / (4 * nd)
    )
    v_ab = F.when(
        even,
        xd * yd * (nd + 2) * (nd - 2) / (48 * (nd - 1)),
    ).otherwise(
        xd * yd * (nd + 1) * (3 + nd * nd) / (48 * nd * nd)
    )
    z = (F.col("ab2").cast("double") / 2 - e_ab) / F.sqrt(v_ab)
    return m.select(
        F.col("nx").alias("n_x"),
        (F.col("nn") - F.col("nx")).alias("n_y"),
        F.col("ab2").alias("ab2_score"),
        F.round(z, 6).alias("z"),
        (F.abs(F.round(z, 6)) > 1.96).alias("scale_differs"),
    )


ORACLE_ANSARI = """
ab_v AS (
  SELECT c,
         CAST(sum(CASE WHEN is_x THEN 1 ELSE 0 END) AS BIGINT)
           AS cx,
         CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT CAST(round(value * 100, 0) AS BIGINT) AS c,
               event_type = 'purchase' AS is_x
        FROM events WHERE event_type IN ('purchase', 'click')
          AND value IS NOT NULL)
  GROUP BY 1
),
ab_p AS (
  SELECT c, cx, cnt,
         CAST(coalesce(sum(cnt) OVER (ORDER BY c
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS pre
  FROM ab_v
),
ab_t AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS nn,
         CAST(sum(cx) AS BIGINT) AS nx
  FROM ab_v
),
ab_m AS (
  SELECT nn, nx,
         CAST(sum(cx * least(2 * pre + cnt + 1,
                             2 * (nn + 1) - (2 * pre + cnt + 1)))
              AS BIGINT) AS ab2
  FROM ab_p, ab_t GROUP BY 1, 2
),
ansari_bradley AS (
  SELECT nx AS n_x, nn - nx AS n_y, ab2 AS ab2_score,
         round((CAST(ab2 AS DOUBLE) / 2
                - CASE WHEN nn % 2 = 0
                  THEN CAST(nx AS DOUBLE) * (CAST(nn AS DOUBLE) + 2)
                       / 4
                  ELSE CAST(nx AS DOUBLE) * (CAST(nn AS DOUBLE) + 1)
                       * (CAST(nn AS DOUBLE) + 1)
                       / (4 * CAST(nn AS DOUBLE)) END)
               / sqrt(CASE WHEN nn % 2 = 0
                  THEN CAST(nx AS DOUBLE)
                       * (CAST(nn AS DOUBLE) - CAST(nx AS DOUBLE))
                       * (CAST(nn AS DOUBLE) + 2)
                       * (CAST(nn AS DOUBLE) - 2)
                       / (48 * (CAST(nn AS DOUBLE) - 1))
                  ELSE CAST(nx AS DOUBLE)
                       * (CAST(nn AS DOUBLE) - CAST(nx AS DOUBLE))
                       * (CAST(nn AS DOUBLE) + 1)
                       * (3 + CAST(nn AS DOUBLE)
                          * CAST(nn AS DOUBLE))
                       / (48 * CAST(nn AS DOUBLE)
                          * CAST(nn AS DOUBLE)) END), 6) AS z,
         abs(round((CAST(ab2 AS DOUBLE) / 2
                - CASE WHEN nn % 2 = 0
                  THEN CAST(nx AS DOUBLE) * (CAST(nn AS DOUBLE) + 2)
                       / 4
                  ELSE CAST(nx AS DOUBLE) * (CAST(nn AS DOUBLE) + 1)
                       * (CAST(nn AS DOUBLE) + 1)
                       / (4 * CAST(nn AS DOUBLE)) END)
               / sqrt(CASE WHEN nn % 2 = 0
                  THEN CAST(nx AS DOUBLE)
                       * (CAST(nn AS DOUBLE) - CAST(nx AS DOUBLE))
                       * (CAST(nn AS DOUBLE) + 2)
                       * (CAST(nn AS DOUBLE) - 2)
                       / (48 * (CAST(nn AS DOUBLE) - 1))
                  ELSE CAST(nx AS DOUBLE)
                       * (CAST(nn AS DOUBLE) - CAST(nx AS DOUBLE))
                       * (CAST(nn AS DOUBLE) + 1)
                       * (3 + CAST(nn AS DOUBLE)
                          * CAST(nn AS DOUBLE))
                       / (48 * CAST(nn AS DOUBLE)
                          * CAST(nn AS DOUBLE)) END), 6)) > 1.96
           AS scale_differs
  FROM ab_m
)
"""


# ---------------------------------------------------------------------------
# partial correlation (clicks <-> purchases controlling for views)
# ---------------------------------------------------------------------------


def partial_correlation(events: DataFrame) -> DataFrame:
    """Partial correlation of daily click and purchase counts
    CONTROLLING for daily view volume — "do clicks drive purchases,
    or does overall traffic drive both": r_xy.z =
    (r_xy - r_xz*r_yz) / sqrt((1-r_xz^2)(1-r_yz^2)), the one-line
    deconfounder beside the raw pairwise ``events_type_corr`` and
    the lag picture in ``events_ccf``.

    All three pairwise Pearson correlations come from ONE day-grain
    pivot agg with exact BIGINT moment sums (n, Sx, Sy, Sz, all
    squares and cross-products — eleven integers); the three r's and
    the partial assemble in a mirrored double chain, rounded at 6 dp.
    Missing (day, type) cells are true zero counts via the dense
    conditional agg. Output (1 row): n_days, r_xy, r_xz, r_yz,
    r_partial, confounded (sign flip or |drop| > half).
    """
    d = (
        events.groupBy(F.to_date("ts").alias("d"))
        .agg(
            F.sum(
                (F.col("event_type") == "click").cast("bigint")
            ).alias("x"),
            F.sum(
                (F.col("event_type") == "purchase").cast("bigint")
            ).alias("y"),
            F.sum(
                (F.col("event_type") == "view").cast("bigint")
            ).alias("z"),
        )
    )
    m = d.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum("z").alias("sz"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("z") * F.col("z")).alias("szz"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("z")).alias("sxz"),
        F.sum(F.col("y") * F.col("z")).alias("syz"),
    )
    nd = F.col("n").cast("double")

    def _r(sab, sa, sb, saa, sbb) -> F.Column:
        num = nd * F.col(sab).cast("double") - F.col(sa).cast(
            "double"
        ) * F.col(sb).cast("double")
        da = nd * F.col(saa).cast("double") - F.col(sa).cast(
            "double"
        ) * F.col(sa).cast("double")
        db = nd * F.col(sbb).cast("double") - F.col(sb).cast(
            "double"
        ) * F.col(sb).cast("double")
        return num / F.sqrt(da * db)

    rxy = _r("sxy", "sx", "sy", "sxx", "syy")
    rxz = _r("sxz", "sx", "sz", "sxx", "szz")
    ryz = _r("syz", "sy", "sz", "syy", "szz")
    rp = (rxy - rxz * ryz) / F.sqrt(
        (1 - rxz * rxz) * (1 - ryz * ryz)
    )
    conf = (F.round(rp, 6) * F.round(rxy, 6) < 0) | (
        F.abs(F.round(rp, 6)) < F.abs(F.round(rxy, 6)) / 2
    )
    return m.select(
        F.col("n").alias("n_days"),
        F.round(rxy, 6).alias("r_xy"),
        F.round(rxz, 6).alias("r_xz"),
        F.round(ryz, 6).alias("r_yz"),
        F.round(rp, 6).alias("r_partial"),
        conf.alias("confounded"),
    )


ORACLE_PARTIAL_CORR = """
pc_d AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS x,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                  END) AS BIGINT) AS y,
         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              AS BIGINT) AS z
  FROM events GROUP BY 1
),
pc_m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(z) AS BIGINT) AS sz,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(z * z) AS BIGINT) AS szz,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * z) AS BIGINT) AS sxz,
         CAST(sum(y * z) AS BIGINT) AS syz
  FROM pc_d
),
pc_r AS (
  SELECT n,
         (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
         / sqrt((CAST(n AS DOUBLE) * sxx
                 - CAST(sx AS DOUBLE) * sx)
                * (CAST(n AS DOUBLE) * syy
                   - CAST(sy AS DOUBLE) * sy)) AS rxy,
         (CAST(n AS DOUBLE) * sxz - CAST(sx AS DOUBLE) * sz)
         / sqrt((CAST(n AS DOUBLE) * sxx
                 - CAST(sx AS DOUBLE) * sx)
                * (CAST(n AS DOUBLE) * szz
                   - CAST(sz AS DOUBLE) * sz)) AS rxz,
         (CAST(n AS DOUBLE) * syz - CAST(sy AS DOUBLE) * sz)
         / sqrt((CAST(n AS DOUBLE) * syy
                 - CAST(sy AS DOUBLE) * sy)
                * (CAST(n AS DOUBLE) * szz
                   - CAST(sz AS DOUBLE) * sz)) AS ryz
  FROM pc_m
),
partial_correlation AS (
  SELECT n AS n_days, round(rxy, 6) AS r_xy, round(rxz, 6) AS r_xz,
         round(ryz, 6) AS r_yz,
         round((rxy - rxz * ryz)
               / sqrt((1 - rxz * rxz) * (1 - ryz * ryz)), 6)
           AS r_partial,
         (round((rxy - rxz * ryz)
                / sqrt((1 - rxz * rxz) * (1 - ryz * ryz)), 6)
          * round(rxy, 6) < 0)
         OR (abs(round((rxy - rxz * ryz)
                / sqrt((1 - rxz * rxz) * (1 - ryz * ryz)), 6))
             < abs(round(rxy, 6)) / 2) AS confounded
  FROM pc_r
)
"""


# ---------------------------------------------------------------------------
# Durbin-Watson first-order autocorrelation test (round 7)
# ---------------------------------------------------------------------------

#: rule-of-thumb DW bands: < 1.5 positive autocorrelation, > 2.5
#: negative (the exact dL/dU bounds depend on n and regressor count —
#: a table lookup, not an expression; the bands are the standard
#: practitioners' screen).
DW_POS_BAND = 1.5
DW_NEG_BAND = 2.5


def durbin_watson(events: DataFrame) -> DataFrame:
    """Durbin-Watson statistic of the daily purchase-revenue series
    (deviations from its own mean — the null-model residuals):
    DW = sum (x_t - x_{t-1})^2 / sum (x_t - xbar)^2, the classic
    first-order serial-correlation screen that complements the
    ACF/Ljung-Box report (``events_acf``) with the single-number
    regression-residual diagnostic (DW ~ 2(1 - rho1)).

    EXACT until the last division: both quadratic forms assemble from
    integer cent sums as DECIMAL(38,0) — numerator n*ssd, denominator
    n*Q - S^2 (the n-scaled centered sum of squares, so the mean
    never materializes as a rational). Overflow envelope: n*Q < 1e38
    holds while daily sums stay under ~1.5e17 cents at a 10-year
    calendar — same decade analysis as SCALE.md's changepoint
    section, same rescaling rule beyond it.

    One corpus pass to day grain; the lag-1 difference rides a
    calendar-bounded ordered window (the acf_report stance).
    Output (1 row): n_days, dw, positive_autocorr, negative_autocorr.
    """
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    daily = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(
                F.round(F.col("value") * 100, 0).cast("bigint")
            ).alias("x")
        )
    )
    w = Window.orderBy("day")
    lagged = daily.select(
        "x", (F.col("x") - F.lag("x", 1).over(w)).alias("d")
    )
    m = lagged.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("s"),
        F.sum(dec(F.col("x")) * dec(F.col("x"))).alias("q"),
        F.sum(dec(F.col("d")) * dec(F.col("d"))).alias("ssd"),
    )
    num = dec(F.col("n")) * F.col("ssd")
    den = dec(F.col("n")) * F.col("q") - dec(F.col("s")) * dec(
        F.col("s")
    )
    dw = F.round(num.cast("double") / den.cast("double"), 6)
    return m.select(
        F.col("n").alias("n_days"),
        dw.alias("dw"),
        (dw < DW_POS_BAND).alias("positive_autocorr"),
        (dw > DW_NEG_BAND).alias("negative_autocorr"),
    )


ORACLE_DURBIN_WATSON = f"""
dwt_d AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS x
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
dwt_l AS (
  SELECT x, x - lag(x) OVER (ORDER BY day) AS d FROM dwt_d
),
dwt_m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS s,
         CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS q,
         CAST(sum(CAST(d AS HUGEINT) * d) AS HUGEINT) AS ssd
  FROM dwt_l
),
durbin_watson AS (
  SELECT n AS n_days,
         round(CAST(n * ssd AS DOUBLE)
               / CAST(n * q - CAST(s AS HUGEINT) * s AS DOUBLE), 6)
           AS dw,
         round(CAST(n * ssd AS DOUBLE)
               / CAST(n * q - CAST(s AS HUGEINT) * s AS DOUBLE), 6)
           < {DW_POS_BAND} AS positive_autocorr,
         round(CAST(n * ssd AS DOUBLE)
               / CAST(n * q - CAST(s AS HUGEINT) * s AS DOUBLE), 6)
           > {DW_NEG_BAND} AS negative_autocorr
  FROM dwt_m
)
"""


# ---------------------------------------------------------------------------
# Grubbs extreme-studentized-deviate screen (round 7)
# ---------------------------------------------------------------------------


def grubbs_extreme(events: DataFrame) -> DataFrame:
    """Grubbs-style extreme studentized deviate of the daily
    purchase-revenue series: G = max|x - xbar| / s — "is the single
    most extreme day statistically surprising", the one-point
    complement to the windowed Hampel/MAD screens. The exact Grubbs
    critical value is a t-quantile in n (engine-ulp territory, like
    the DFT's trig basis — deliberately not reproduced); the emitted
    flag is the practitioners' G > 3 three-sigma screen, with G
    itself exact-to-rounding for any downstream table lookup.

    The extreme day is selected by EXACT integer comparison: the
    n-scaled deviation |x*n - S| is a BIGINT-in-DECIMAL, the max is
    integral, and ties break to the earliest day (min day at the max
    — deterministic in both engines, no arg_max tie ambiguity).
    G = maxdev * sqrt((n-1) / (n * (n*Q - S^2))) assembles in doubles
    only at the end, rounded 6 dp.

    One day collapse + one broadcast re-scan of the day table.
    Output (1 row): n_days, extreme_day, extreme_cents, g_stat,
    exceeds_three_sigma.
    """
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    daily = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(
                F.round(F.col("value") * 100, 0).cast("bigint")
            ).alias("x")
        )
        .localCheckpoint(eager=True)  # day-grain; read twice
    )
    m = daily.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("s"),
        F.sum(dec(F.col("x")) * dec(F.col("x"))).alias("q"),
    )
    dev = daily.crossJoin(F.broadcast(m)).select(
        "day",
        "x",
        "n",
        "s",
        "q",
        F.abs(dec(F.col("x")) * dec(F.col("n")) - dec(F.col("s"))).alias(
            "dn"
        ),
    )
    mx = dev.groupBy().agg(F.max("dn").alias("mx"))
    # the (day, cents) pair must come from ONE row: min_by on day
    # keeps the earliest tied max-deviation day's own revenue
    # (independent min(day)/min(x) could pair day A with day B's
    # cents when two days tie — review finding); day is unique at
    # this grain, so min_by is deterministic in both engines.
    ext = (
        dev.join(F.broadcast(mx), F.col("dn") == F.col("mx"))
        .groupBy("n", "s", "q", "mx")
        .agg(
            F.min("day").alias("extreme_day"),
            F.expr("min_by(x, day)").alias("extreme_cents"),
        )
    )
    nd = F.col("n").cast("double")
    den = (
        dec(F.col("n")) * F.col("q")
        - dec(F.col("s")) * dec(F.col("s"))
    ).cast("double")
    g = F.round(
        F.col("mx").cast("double") * F.sqrt((nd - 1) / (nd * den)), 6
    )
    return ext.select(
        F.col("n").alias("n_days"),
        "extreme_day",
        "extreme_cents",
        g.alias("g_stat"),
        (g > 3.0).alias("exceeds_three_sigma"),
    )


ORACLE_GRUBBS = """
gr_d AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS x
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
gr_m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS s,
         CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS q
  FROM gr_d
),
gr_dev AS (
  SELECT d.day, d.x, m.n, m.s, m.q,
         abs(CAST(d.x AS HUGEINT) * m.n - m.s) AS dn
  FROM gr_d d, gr_m m
),
gr_mx AS (SELECT max(dn) AS mx FROM gr_dev),
grubbs_extreme AS (
  SELECT n AS n_days,
         min(day) AS extreme_day,
         arg_min(x, day) AS extreme_cents,
         round(CAST(mx AS DOUBLE)
               * sqrt((CAST(n AS DOUBLE) - 1)
                      / (CAST(n AS DOUBLE)
                         * CAST(n * q - CAST(s AS HUGEINT) * s
                                AS DOUBLE))), 6) AS g_stat,
         round(CAST(mx AS DOUBLE)
               * sqrt((CAST(n AS DOUBLE) - 1)
                      / (CAST(n AS DOUBLE)
                         * CAST(n * q - CAST(s AS HUGEINT) * s
                                AS DOUBLE))), 6) > 3.0
           AS exceeds_three_sigma
  FROM gr_dev JOIN gr_mx ON dn = mx
  GROUP BY n, s, q, mx
)
"""


# ---------------------------------------------------------------------------
# Brown-Forsythe median-based variance homogeneity (round 7)
# ---------------------------------------------------------------------------


def brown_forsythe(events: DataFrame) -> DataFrame:
    """Brown-Forsythe test: Levene's ANOVA-on-deviations with the
    deviations taken from each group's MEDIAN instead of its mean —
    the recommended default when groups are skewed or heavy-tailed
    (the mean-based W in ``events_levene`` loses level control
    there). Completes the scale-test ladder: Levene (mean),
    Brown-Forsythe (median), Ansari-Bradley (ranks).

    Each group's median is the EXACT order statistic under the same
    upper-median convention as ``events_mood_median``, selected by
    PER-GROUP octave-bucket prefix sums (offsets ride a bucket-grain
    partitioned window <= 48 rows per group; within-octave prefixes a
    (group, octave)-partitioned window — zero global windows). The
    deviations z = |c - med_g| are then plain BIGINTs, so the group
    moments are exact and the F statistic assembles from the k=5
    moment rows in one mirrored double chain.

    Two corpus passes (value-grain agg; deviation agg against the
    broadcast 5-row median frame). Output (1 row): k, n, ssb, ssw,
    f_stat, homogeneous.
    """
    cg = events.filter(F.col("value").isNotNull()).select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("c"),
    )
    vg = cg.groupBy("event_type", "c").agg(F.count("*").alias("cnt"))
    cum = _cent_prefix(
        vg, ["cnt"], inclusive=True, group_cols=("event_type",)
    ).select("event_type", "c", F.col("_pre_cnt").alias("cum"))
    ng = vg.groupBy("event_type").agg(F.sum("cnt").alias("ng"))
    med = (
        cum.join(ng, "event_type")
        .groupBy("event_type")
        .agg(
            F.min(
                F.when(
                    F.col("cum") >= (F.col("ng") + 1) / 2, F.col("c")
                )
            ).alias("med")
        )
    )
    gm = (
        cg.join(F.broadcast(med), "event_type")
        .select(
            "event_type",
            F.abs(F.col("c") - F.col("med")).alias("z"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("ng"),
            F.sum("z").alias("sg"),
            F.sum(F.col("z") * F.col("z")).alias("qg"),
        )
    )
    m = gm.agg(
        F.count("*").alias("k"),
        F.sum("ng").alias("n"),
        F.sum(
            F.col("sg").cast("double")
            * F.col("sg").cast("double")
            / F.col("ng").cast("double")
        ).alias("t1"),
        F.sum(F.col("sg").cast("double")).alias("ts"),
        F.sum(F.col("qg").cast("double")).alias("t2"),
    )
    nd = F.col("n").cast("double")
    kd = F.col("k").cast("double")
    ssb = F.col("t1") - F.col("ts") * F.col("ts") / nd
    ssw = F.col("t2") - F.col("t1")
    f = (ssb / (kd - 1)) / (ssw / (nd - kd))
    return m.select(
        "k",
        "n",
        F.round(ssb, 4).alias("ssb"),
        F.round(ssw, 4).alias("ssw"),
        F.round(f, 6).alias("f_stat"),
        (F.round(f, 6) <= ANOVA_F_CRIT_05).alias("homogeneous"),
    )


ORACLE_BROWN_FORSYTHE = f"""
bf_c AS (
  SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL
),
bf_v AS (
  SELECT event_type, c, CAST(count(*) AS BIGINT) AS cnt
  FROM bf_c GROUP BY 1, 2
),
bf_cum AS (
  SELECT event_type, c,
         CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY c
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cum
  FROM bf_v
),
bf_ng AS (
  SELECT event_type, CAST(sum(cnt) AS BIGINT) AS ng
  FROM bf_v GROUP BY 1
),
bf_med AS (
  SELECT m.event_type,
         min(CASE WHEN m.cum >= (g.ng + 1) / 2 THEN m.c END) AS med
  FROM bf_cum m JOIN bf_ng g ON m.event_type = g.event_type
  GROUP BY 1
),
bf_gm AS (
  SELECT c.event_type, CAST(count(*) AS BIGINT) AS ng,
         CAST(sum(abs(c.c - m.med)) AS BIGINT) AS sg,
         CAST(sum(CAST(abs(c.c - m.med) AS HUGEINT)
                  * abs(c.c - m.med)) AS HUGEINT) AS qg
  FROM bf_c c JOIN bf_med m ON c.event_type = m.event_type
  GROUP BY 1
),
bf_m AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
         CAST(sum(ng) AS BIGINT) AS n,
         sum(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
             / CAST(ng AS DOUBLE)) AS t1,
         sum(CAST(sg AS DOUBLE)) AS ts,
         sum(CAST(qg AS DOUBLE)) AS t2
  FROM bf_gm
),
brown_forsythe AS (
  SELECT k, n,
         round(t1 - ts * ts / CAST(n AS DOUBLE), 4) AS ssb,
         round(t2 - t1, 4) AS ssw,
         round(((t1 - ts * ts / CAST(n AS DOUBLE))
                / (CAST(k AS DOUBLE) - 1))
               / ((t2 - t1) / (CAST(n AS DOUBLE)
                               - CAST(k AS DOUBLE))), 6) AS f_stat,
         round(((t1 - ts * ts / CAST(n AS DOUBLE))
                / (CAST(k AS DOUBLE) - 1))
               / ((t2 - t1) / (CAST(n AS DOUBLE)
                               - CAST(k AS DOUBLE))), 6)
           <= {ANOVA_F_CRIT_05} AS homogeneous
  FROM bf_m
)
"""


# ---------------------------------------------------------------------------
# Cliff's delta ordinal effect size (round 7)
# ---------------------------------------------------------------------------

#: Romano et al. magnitude bands on |delta|.
CLIFFS_NEGLIGIBLE = 0.147
CLIFFS_SMALL = 0.33
CLIFFS_MEDIUM = 0.474


def cliffs_delta(events: DataFrame) -> DataFrame:
    """Cliff's delta between purchase and click event values:
    delta = (#(x>y) - #(x<y)) / (n1*n2) — the ordinal,
    distribution-free effect size that complements Cohen's d
    (``events_effect_size``: means can be dominated by whales) and
    the Mann-Whitney z (significance, not magnitude).

    All three pair counts are EXACT integers from one pass of the
    octave-bucket prefix kernel (``_cent_prefix``): on the cent
    grain, #(x>y) = sum c1(v) * (#y strictly below v), ties =
    sum c1(v)*c2(v), #(x<y) = n1*n2 - gt - ties — no pair join, no
    global window. Only the final delta divides, rounded 6 dp; the
    magnitude label reads the ROUNDED delta (the JSD guard
    convention).

    Output (1 row): n1, n2, n_gt, n_lt, n_tie, delta, magnitude.
    """
    cg = events.filter(
        F.col("value").isNotNull()
        & F.col("event_type").isin("purchase", "click")
    ).select(
        F.round(F.col("value") * 100, 0).cast("bigint").alias("c"),
        (F.col("event_type") == "purchase").alias("is_x"),
    )
    vg = cg.groupBy("c").agg(
        F.sum(F.when(F.col("is_x"), 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("is_x"), 0).otherwise(1)).alias("c2"),
    )
    pre = _cent_prefix(vg, ["c2"], inclusive=False)
    agg = pre.agg(
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
        F.sum(F.col("c1") * F.col("_pre_c2")).alias("n_gt"),
        F.sum(F.col("c1") * F.col("c2")).alias("n_tie"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    lt = n1 * n2 - F.col("n_gt") - F.col("n_tie")
    delta = F.round(
        (F.col("n_gt") - lt).cast("double")
        / (n1 * n2).cast("double"),
        6,
    )
    mag = (
        F.when(F.abs(delta) < CLIFFS_NEGLIGIBLE, "negligible")
        .when(F.abs(delta) < CLIFFS_SMALL, "small")
        .when(F.abs(delta) < CLIFFS_MEDIUM, "medium")
        .otherwise("large")
    )
    return agg.select(
        "n1",
        "n2",
        "n_gt",
        lt.alias("n_lt"),
        "n_tie",
        delta.alias("delta"),
        mag.alias("magnitude"),
    )


ORACLE_CLIFFS_DELTA = f"""
cd_c AS (
  SELECT CAST(round(value * 100, 0) AS BIGINT) AS c,
         event_type = 'purchase' AS is_x
  FROM events
  WHERE value IS NOT NULL AND event_type IN ('purchase', 'click')
),
cd_v AS (
  SELECT c,
         CAST(sum(CASE WHEN is_x THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(sum(CASE WHEN is_x THEN 0 ELSE 1 END) AS BIGINT) AS c2
  FROM cd_c GROUP BY 1
),
cd_p AS (
  SELECT c1, c2,
         CAST(coalesce(sum(c2) OVER (ORDER BY c
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS pre_c2
  FROM cd_v
),
cd_a AS (
  SELECT CAST(sum(c1) AS BIGINT) AS n1,
         CAST(sum(c2) AS BIGINT) AS n2,
         CAST(sum(c1 * pre_c2) AS BIGINT) AS n_gt,
         CAST(sum(c1 * c2) AS BIGINT) AS n_tie
  FROM cd_p
),
cliffs_delta AS (
  SELECT n1, n2, n_gt,
         n1 * n2 - n_gt - n_tie AS n_lt,
         n_tie,
         round(CAST(n_gt - (n1 * n2 - n_gt - n_tie) AS DOUBLE)
               / CAST(n1 * n2 AS DOUBLE), 6) AS delta,
         CASE WHEN abs(round(CAST(n_gt - (n1 * n2 - n_gt - n_tie)
                    AS DOUBLE) / CAST(n1 * n2 AS DOUBLE), 6))
                   < {CLIFFS_NEGLIGIBLE} THEN 'negligible'
              WHEN abs(round(CAST(n_gt - (n1 * n2 - n_gt - n_tie)
                    AS DOUBLE) / CAST(n1 * n2 AS DOUBLE), 6))
                   < {CLIFFS_SMALL} THEN 'small'
              WHEN abs(round(CAST(n_gt - (n1 * n2 - n_gt - n_tie)
                    AS DOUBLE) / CAST(n1 * n2 AS DOUBLE), 6))
                   < {CLIFFS_MEDIUM} THEN 'medium'
              ELSE 'large' END AS magnitude
  FROM cd_a
)
"""


# ---------------------------------------------------------------------------
# Cochran's Q for k related binary treatments (round 7)
# ---------------------------------------------------------------------------


def cochran_q(events: DataFrame) -> DataFrame:
    """Cochran's Q over the user x event-type INCIDENCE matrix (did
    user u ever emit type t): do the k event types differ in reach —
    the k-treatment generalization of McNemar (``events_mcnemar``)
    for matched binary outcomes, the presence/absence complement to
    the magnitude ladder (ANOVA/KW on values).

    Exact integer algebra end to end: with column totals C_t, row
    totals R_u and N = sum C_t, Q = (k-1) * sum_t (k*C_t - N)^2 /
    (k * (k*N - sum_u R_u^2)) — the k-scaled form that never builds
    the rational N/k. All-zero and all-one rows are provably
    Q-neutral (they shift every C_t and N together), so no row
    filtering convention is needed.

    Scale: one distinct-pair hash-agg (user, type), then user-grain
    and type-grain rollups — k is the type domain, so the final
    assembly is a k-row fold. Output (1 row): k, n_users,
    n_incidences, q_stat, significant (chi2 df=4 at .05 — the
    fixture's k=5 convention, same literal as the KW test).
    """
    inc = events.select("user_id", "event_type").distinct()
    ct = inc.groupBy("event_type").agg(F.count("*").alias("c"))
    ru = inc.groupBy("user_id").agg(F.count("*").alias("r"))
    rtot = ru.agg(
        F.count("*").alias("n_users"),
        F.sum(F.col("r") * F.col("r")).alias("r2"),
    )
    m = (
        ct.agg(
            F.count("*").alias("k"),
            F.sum("c").alias("nn"),
            F.collect_list("c").alias("cs"),
        )
        .crossJoin(F.broadcast(rtot))
    )
    num = (F.col("k") - 1) * F.aggregate(
        "cs",
        F.lit(0).cast("bigint"),
        lambda acc, c: acc
        + (F.col("k") * c - F.col("nn"))
        * (F.col("k") * c - F.col("nn")),
    )
    den = F.col("k") * (F.col("k") * F.col("nn") - F.col("r2"))
    q = F.when(
        den != 0,
        F.round(num.cast("double") / den.cast("double"), 6),
    )
    return m.select(
        "k",
        "n_users",
        F.col("nn").alias("n_incidences"),
        q.alias("q_stat"),
        (q > KRUSKAL_CHI2_CRIT_05).alias("significant"),
    )


ORACLE_COCHRAN_Q = f"""
cq_inc AS (
  SELECT DISTINCT user_id, event_type FROM events
),
cq_ct AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS c
  FROM cq_inc GROUP BY 1
),
cq_ru AS (
  SELECT CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(r * r) AS BIGINT) AS r2
  FROM (SELECT user_id, CAST(count(*) AS BIGINT) AS r
        FROM cq_inc GROUP BY 1)
),
cq_m AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
         CAST(sum(c) AS BIGINT) AS nn
  FROM cq_ct
),
cq_num AS (
  SELECT (m.k - 1)
         * CAST(sum((m.k * t.c - m.nn) * (m.k * t.c - m.nn))
                AS BIGINT) AS num
  FROM cq_ct t, cq_m m GROUP BY m.k, m.nn
),
cochran_q AS (
  SELECT m.k, u.n_users, m.nn AS n_incidences,
         CASE WHEN m.k * (m.k * m.nn - u.r2) <> 0 THEN
           round(CAST(n.num AS DOUBLE)
                 / CAST(m.k * (m.k * m.nn - u.r2) AS DOUBLE), 6)
         END AS q_stat,
         CASE WHEN m.k * (m.k * m.nn - u.r2) <> 0 THEN
           round(CAST(n.num AS DOUBLE)
                 / CAST(m.k * (m.k * m.nn - u.r2) AS DOUBLE), 6)
         END > {KRUSKAL_CHI2_CRIT_05} AS significant
  FROM cq_m m, cq_ru u, cq_num n
)
"""


# ---------------------------------------------------------------------------
# Page's trend test over the 7-day revenue cycle (round 7)
# ---------------------------------------------------------------------------

PAGE_CYCLE = 7


def page_trend(events: DataFrame) -> DataFrame:
    """Page's L test for an ORDERED alternative: does daily purchase
    revenue trend monotonically across the 7-day cycle? Friedman
    (``events_friedman``) only answers "are the positions different";
    Page's L = sum_j j*R_j weights the within-block ranks by the
    hypothesized order and so has power specifically against
    monotone trends.

    Blocks are consecutive 7-day calendar windows from the first
    event day over the GAPFILLED calendar (absent days enter as 0
    revenue — a sequence() explode, calendar-bounded), keeping only
    complete blocks; position j = 1..7 within the block. Ranks use
    the same doubled-midrank k^2-per-block grid as Friedman (exact
    integers), so L2 = sum j*2R_j is a BIGINT; the normal
    approximation z = (L2 - b*k(k+1)^2/2) / sqrt(b*k^2(k+1)(k^2-1)/36)
    assembles in doubles (midrank ties use the untied-variance
    formula — the standard practical convention, documented).

    One corpus pass to day grain; everything after is
    calendar-bounded grid algebra, no windows. Output (1 row):
    n_blocks, k, l2_stat, z, increasing, decreasing (one-sided 1.645
    both ways).
    """
    k = PAGE_CYCLE
    daily = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(
                F.round(F.col("value") * 100, 0).cast("bigint")
            ).alias("x")
        )
    )
    span = daily.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    cal = span.select(
        F.explode(F.expr("sequence(d0, d1)")).alias("day"), "d0"
    )
    grid = (
        cal.join(daily, "day", "left")
        .select(
            F.floor(F.datediff("day", "d0") / k).alias("blk"),
            (F.datediff("day", "d0") % k + 1).alias("pos"),
            F.coalesce("x", F.lit(0)).alias("x"),
        )
    )
    full = grid.groupBy("blk").agg(F.count("*").alias("c")).filter(
        F.col("c") == k
    ).select("blk")
    g = grid.join(full, "blk", "leftsemi")
    other = g.select(
        F.col("blk").alias("b2"), F.col("x").alias("x2")
    )
    r2 = (
        g.join(other, F.col("blk") == F.col("b2"))
        .groupBy("blk", "pos", "x")
        .agg(
            (
                2 * F.sum((F.col("x2") < F.col("x")).cast("bigint"))
                + F.sum((F.col("x2") == F.col("x")).cast("bigint"))
                + 1
            ).alias("r2")
        )
    )
    m = r2.agg(
        F.countDistinct("blk").alias("b"),
        F.sum(F.col("pos") * F.col("r2")).alias("l2"),
    )
    bd = F.col("b").cast("double")
    e2 = bd * k * (k + 1) * (k + 1) / 2.0
    var2 = bd * k * k * (k + 1) * (k * k - 1) / 36.0
    z = F.round((F.col("l2") - e2) / F.sqrt(var2), 6)
    return m.select(
        F.col("b").alias("n_blocks"),
        F.lit(k).alias("k"),
        F.col("l2").alias("l2_stat"),
        z.alias("z"),
        (z > 1.645).alias("increasing"),
        (z < -1.645).alias("decreasing"),
    )


ORACLE_PAGE_TREND = f"""
pg_d AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS x
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
pg_span AS (SELECT min(day) AS d0, max(day) AS d1 FROM pg_d),
pg_cal AS (
  SELECT unnest(generate_series(s.d0, s.d1,
                                INTERVAL 1 DAY))::DATE AS day, s.d0
  FROM pg_span s
),
pg_grid AS (
  SELECT CAST(datediff('day', c.d0, c.day) // {PAGE_CYCLE}
              AS BIGINT) AS blk,
         CAST(datediff('day', c.d0, c.day) % {PAGE_CYCLE} + 1
              AS BIGINT) AS pos,
         coalesce(d.x, 0) AS x
  FROM pg_cal c LEFT JOIN pg_d d ON d.day = c.day
),
pg_full AS (
  SELECT blk FROM pg_grid GROUP BY 1
  HAVING count(*) = {PAGE_CYCLE}
),
pg_g AS (
  SELECT g.* FROM pg_grid g
  WHERE EXISTS (SELECT 1 FROM pg_full f WHERE f.blk = g.blk)
),
pg_r2 AS (
  SELECT g.blk, g.pos, g.x,
         2 * CAST(sum(CASE WHEN o.x < g.x THEN 1 ELSE 0 END)
                  AS BIGINT)
         + CAST(sum(CASE WHEN o.x = g.x THEN 1 ELSE 0 END)
                AS BIGINT) + 1 AS r2
  FROM pg_g g JOIN pg_g o ON g.blk = o.blk
  GROUP BY 1, 2, 3
),
pg_m AS (
  SELECT CAST(count(DISTINCT blk) AS BIGINT) AS b,
         CAST(sum(pos * r2) AS BIGINT) AS l2
  FROM pg_r2
),
page_trend AS (
  SELECT b AS n_blocks, CAST({PAGE_CYCLE} AS INT) AS k,
         l2 AS l2_stat,
         round((l2 - CAST(b AS DOUBLE) * {PAGE_CYCLE}
                * {PAGE_CYCLE + 1} * {PAGE_CYCLE + 1} / 2.0)
               / sqrt(CAST(b AS DOUBLE) * {PAGE_CYCLE * PAGE_CYCLE}
                      * {PAGE_CYCLE + 1}
                      * {PAGE_CYCLE * PAGE_CYCLE - 1} / 36.0), 6)
           AS z,
         round((l2 - CAST(b AS DOUBLE) * {PAGE_CYCLE}
                * {PAGE_CYCLE + 1} * {PAGE_CYCLE + 1} / 2.0)
               / sqrt(CAST(b AS DOUBLE) * {PAGE_CYCLE * PAGE_CYCLE}
                      * {PAGE_CYCLE + 1}
                      * {PAGE_CYCLE * PAGE_CYCLE - 1} / 36.0), 6)
           > 1.645 AS increasing,
         round((l2 - CAST(b AS DOUBLE) * {PAGE_CYCLE}
                * {PAGE_CYCLE + 1} * {PAGE_CYCLE + 1} / 2.0)
               / sqrt(CAST(b AS DOUBLE) * {PAGE_CYCLE * PAGE_CYCLE}
                      * {PAGE_CYCLE + 1}
                      * {PAGE_CYCLE * PAGE_CYCLE - 1} / 36.0), 6)
           < -1.645 AS decreasing
  FROM pg_m
)
"""


# ---------------------------------------------------------------------------
# Hurst exponent via rescaled-range (R/S) analysis (round 7)
# ---------------------------------------------------------------------------

#: dyadic R/S window sizes (days). Data-independent grid; windows
#: with fewer than 2 complete blocks at the fixture span simply drop
#: out of the regression (mirrored in the oracle).
HURST_WINDOWS = (8, 16, 32)


def hurst_exponent(events: DataFrame) -> DataFrame:
    """Hurst exponent of daily purchase revenue by classic rescaled-
    range analysis: split the (gapfilled) day series into complete
    blocks of w days for each dyadic w, compute R/S per block
    (range of cumulative mean-deviations over the block sd), and
    regress log2(mean R/S) on log2(w) — H > 0.5 long-range
    persistence, H < 0.5 mean reversion, the fractal complement to
    the ACF's fixed-lag view.

    Integer-exact core: within a block of size w, the w-scaled
    cumulative deviation at step j is the BIGINT w*cum_j - j*S_w, so
    R*w = max - min is exact and S^2 assembles from integer moments;
    only the final R/S, log2 and the 3-point OLS slope are doubles,
    rounded 6 dp. Per-block prefix sums ride (w, block)-partitioned
    windows — w-bounded by the declared grid, zero global windows.

    One corpus pass to day grain, then |grid| x days bounded algebra.
    Output (1 row): n_days, n_points, hurst, persistent.
    """
    daily = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(
                F.round(F.col("value") * 100, 0).cast("bigint")
            ).alias("x")
        )
    )
    span = daily.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    cal = span.select(
        F.explode(F.expr("sequence(d0, d1)")).alias("day"), "d0"
    )
    ser = cal.join(daily, "day", "left").select(
        F.datediff("day", "d0").alias("idx"),
        F.coalesce("x", F.lit(0)).alias("x"),
    )
    n_days = ser.groupBy().agg(F.count("*").alias("n_days"))
    arms = ser.select(
        "idx",
        "x",
        F.explode(
            F.array(*[F.lit(w) for w in HURST_WINDOWS])
        ).alias("w"),
    ).select(
        "w",
        F.floor(F.col("idx") / F.col("w")).alias("blk"),
        (F.col("idx") % F.col("w") + 1).alias("j"),
        "x",
    )
    full = (
        arms.groupBy("w", "blk")
        .agg(F.count("*").alias("c"), F.sum("x").alias("sw"))
        .filter(F.col("c") == F.col("w"))
        .select("w", "blk", "sw")
    )
    win = (
        Window.partitionBy("w", "blk")
        .orderBy("j")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dev = (
        arms.join(full, ["w", "blk"])
        .select(
            "w",
            "blk",
            "j",
            "x",
            "sw",
            (
                F.col("w") * F.sum("x").over(win)
                - F.col("j") * F.col("sw")
            ).alias("cumdev_w"),
        )
    )
    decc = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    blocks = dev.groupBy("w", "blk").agg(
        (
            (F.greatest(F.max("cumdev_w"), F.lit(0))
             - F.least(F.min("cumdev_w"), F.lit(0))).cast("double")
            / F.col("w").cast("double")
        ).alias("r"),
        # population sd from EXACT integer moments (a double x^2 sum
        # loses integer exactness past 2^53)
        F.sqrt(
            F.sum(decc(F.col("x")) * decc(F.col("x"))).cast("double")
            / F.col("w").cast("double")
            - (F.max("sw").cast("double") / F.col("w"))
            * (F.max("sw").cast("double") / F.col("w"))
        ).alias("s"),
    )
    per_w = (
        blocks.filter(F.col("s") > 0)
        .groupBy("w")
        .agg(F.avg(F.col("r") / F.col("s")).alias("rs"))
        .filter(F.col("rs") > 0)
        .select(
            F.log2("w").alias("lx"), F.log2("rs").alias("ly")
        )
    )
    reg = per_w.agg(
        F.count("*").alias("np"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
    )
    npd = F.col("np").cast("double")
    h = F.round(
        (npd * F.col("sxy") - F.col("sx") * F.col("sy"))
        / (npd * F.col("sxx") - F.col("sx") * F.col("sx")),
        6,
    )
    return reg.crossJoin(F.broadcast(n_days)).select(
        "n_days",
        F.col("np").alias("n_points"),
        h.alias("hurst"),
        (h > 0.5).alias("persistent"),
    )


def _oracle_hurst() -> str:
    ws = ", ".join(str(w) for w in HURST_WINDOWS)
    return f"""
hu_d AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS x
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
hu_span AS (SELECT min(day) AS d0, max(day) AS d1 FROM hu_d),
hu_ser AS (
  SELECT CAST(datediff('day', s.d0, c.day) AS BIGINT) AS idx,
         coalesce(d.x, 0) AS x
  FROM (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE
               AS day, d0
        FROM hu_span) c(day, d0)
  CROSS JOIN hu_span s
  LEFT JOIN hu_d d ON d.day = c.day
),
hu_n AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM hu_ser),
hu_arms AS (
  SELECT w, idx // w AS blk, idx % w + 1 AS j, x
  FROM hu_ser, unnest([{ws}]) AS t(w)
),
hu_full AS (
  SELECT w, blk, CAST(sum(x) AS BIGINT) AS sw
  FROM hu_arms GROUP BY 1, 2 HAVING count(*) = w
),
hu_dev AS (
  SELECT a.w, a.blk, a.j, a.x, f.sw,
         a.w * CAST(sum(a.x) OVER (PARTITION BY a.w, a.blk
                 ORDER BY a.j ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) AS BIGINT)
           - a.j * f.sw AS cumdev_w
  FROM hu_arms a JOIN hu_full f ON a.w = f.w AND a.blk = f.blk
),
hu_blocks AS (
  SELECT w, blk,
         CAST(greatest(max(cumdev_w), 0)
              - least(min(cumdev_w), 0) AS DOUBLE)
           / CAST(w AS DOUBLE) AS r,
         sqrt(CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE)
              / CAST(w AS DOUBLE)
              - (CAST(max(sw) AS DOUBLE) / w)
                * (CAST(max(sw) AS DOUBLE) / w)) AS s
  FROM hu_dev GROUP BY 1, 2
),
hu_pw AS (
  SELECT log2(CAST(w AS DOUBLE)) AS lx, log2(rs) AS ly
  FROM (SELECT w, avg(r / s) AS rs FROM hu_blocks
        WHERE s > 0 GROUP BY 1)
  WHERE rs > 0
),
hu_reg AS (
  SELECT CAST(count(*) AS BIGINT) AS np,
         sum(lx) AS sx, sum(ly) AS sy,
         sum(lx * ly) AS sxy, sum(lx * lx) AS sxx
  FROM hu_pw
),
hurst_exponent AS (
  SELECT n.n_days, r.np AS n_points,
         round((CAST(r.np AS DOUBLE) * r.sxy - r.sx * r.sy)
               / (CAST(r.np AS DOUBLE) * r.sxx - r.sx * r.sx), 6)
           AS hurst,
         round((CAST(r.np AS DOUBLE) * r.sxy - r.sx * r.sy)
               / (CAST(r.np AS DOUBLE) * r.sxx - r.sx * r.sx), 6)
           > 0.5 AS persistent
  FROM hu_reg r, hu_n n
)
"""


ORACLE_HURST = _oracle_hurst()


# ---------------------------------------------------------------------------
# Weibull fit by median-rank regression (round 7)
# ---------------------------------------------------------------------------


def weibull_fit(events: DataFrame) -> DataFrame:
    """Weibull (shape, scale) fit of the daily purchase-revenue
    distribution by MEDIAN-RANK REGRESSION — the probability-plot
    method reliability engineering standardizes on: sort the n day
    values, assign Bernard median ranks F_i = (i-0.3)/(n+0.4), and
    OLS ln(-ln(1-F_i)) on ln(x_i); the slope IS the Weibull shape k
    (k < 1 heavy-tailed/decreasing hazard), exp(-intercept/k) the
    scale. Complements the Gumbel block-maxima fit (domain of
    attraction vs body fit) and the Hill tail index.

    Determinism: the day series packs into ONE (x, day)-sorted array
    (calendar-bounded), and every regression sum is a SEQUENTIAL
    executor-side fold over positions 1..n — the record-days/Gumbel
    "same IEEE additions" protocol — so both engines add identical
    doubles in identical order before the 6-dp rounding.

    One corpus pass to day grain; the fold is O(days). Output
    (1 row): n_days, shape, scale_cents, r2.
    """
    daily = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(
                F.round(F.col("value") * 100, 0).cast("bigint")
            ).alias("x")
        )
        .filter(F.col("x") > 0)
    )
    packed = daily.agg(
        F.sort_array(F.collect_list(F.struct("x", "day"))).alias("s")
    )

    def fold(term: str) -> F.Column:
        # empty-series guard: sequence(1, 0) DESCENDS in Spark, so an
        # unguarded fold would index element_at(s, 0) and throw where
        # DuckDB's empty range() yields a NULL row (review finding).
        return F.expr(
            "if(size(s) = 0, cast(null as double),"
            " aggregate(sequence(1, size(s)), cast(0.0 as double),"
            f" (a, i) -> a + ({term})))"
        )

    lx = "ln(cast(element_at(s, i).x as double))"
    yy = (
        "ln(-ln(1.0 - (cast(i as double) - 0.3)"
        " / (cast(size(s) as double) + 0.4)))"
    )
    m = packed.select(
        F.expr("size(s)").alias("n"),
        fold(lx).alias("sx"),
        fold(yy).alias("sy"),
        fold(f"({lx}) * ({yy})").alias("sxy"),
        fold(f"({lx}) * ({lx})").alias("sxx"),
        fold(f"({yy}) * ({yy})").alias("syy"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy") - F.col("sx") * F.col("sy")
    denx = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = nd * F.col("syy") - F.col("sy") * F.col("sy")
    k = num / denx
    b = (F.col("sy") - k * F.col("sx")) / nd
    return m.select(
        F.col("n").alias("n_days"),
        F.round(k, 6).alias("shape"),
        F.round(F.exp(-b / k), 2).alias("scale_cents"),
        F.round(num * num / (denx * deny), 6).alias("r2"),
    )


ORACLE_WEIBULL = """
wb_d AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS x
  FROM events WHERE event_type = 'purchase' GROUP BY 1
  HAVING sum(CAST(round(value * 100, 0) AS BIGINT)) > 0
),
wb_p AS (
  SELECT list(x ORDER BY x, day) AS s, CAST(count(*) AS BIGINT) AS n
  FROM wb_d
),
wb_m AS (
  SELECT n,
         list_aggregate(list_transform(range(1, n + 1),
           i -> ln(CAST(s[i] AS DOUBLE))), 'sum') AS sx,
         list_aggregate(list_transform(range(1, n + 1),
           i -> ln(-ln(1.0 - (CAST(i AS DOUBLE) - 0.3)
                             / (CAST(n AS DOUBLE) + 0.4)))), 'sum')
           AS sy,
         list_aggregate(list_transform(range(1, n + 1),
           i -> ln(CAST(s[i] AS DOUBLE))
                * ln(-ln(1.0 - (CAST(i AS DOUBLE) - 0.3)
                               / (CAST(n AS DOUBLE) + 0.4)))), 'sum')
           AS sxy,
         list_aggregate(list_transform(range(1, n + 1),
           i -> ln(CAST(s[i] AS DOUBLE))
                * ln(CAST(s[i] AS DOUBLE))), 'sum') AS sxx,
         list_aggregate(list_transform(range(1, n + 1),
           i -> ln(-ln(1.0 - (CAST(i AS DOUBLE) - 0.3)
                             / (CAST(n AS DOUBLE) + 0.4)))
                * ln(-ln(1.0 - (CAST(i AS DOUBLE) - 0.3)
                               / (CAST(n AS DOUBLE) + 0.4)))), 'sum')
           AS syy
  FROM wb_p
),
weibull_fit AS (
  SELECT n AS n_days,
         round((CAST(n AS DOUBLE) * sxy - sx * sy)
               / (CAST(n AS DOUBLE) * sxx - sx * sx), 6) AS shape,
         round(exp(-((sy - ((CAST(n AS DOUBLE) * sxy - sx * sy)
                            / (CAST(n AS DOUBLE) * sxx - sx * sx))
                           * sx) / CAST(n AS DOUBLE))
                   / ((CAST(n AS DOUBLE) * sxy - sx * sy)
                      / (CAST(n AS DOUBLE) * sxx - sx * sx))), 2)
           AS scale_cents,
         round((CAST(n AS DOUBLE) * sxy - sx * sy)
               * (CAST(n AS DOUBLE) * sxy - sx * sy)
               / ((CAST(n AS DOUBLE) * sxx - sx * sx)
                  * (CAST(n AS DOUBLE) * syy - sy * sy)), 6) AS r2
  FROM wb_m
)
"""


# ---------------------------------------------------------------------------
# p-chart attribute control chart (round 7)
# ---------------------------------------------------------------------------


def error_pchart(events: DataFrame) -> DataFrame:
    """Shewhart p-chart of the daily ERROR-event fraction: center
    line pbar = total errors / total events, per-day 3-sigma
    binomial limits UCL/LCL = pbar +- 3*sqrt(pbar(1-pbar)/n_t) (LCL
    clamped at 0), and the out-of-control flag — the attribute-chart
    member of the SPC family beside CUSUM (drift) and EWMA (small
    sustained shifts): the p-chart catches single-day blowups in a
    RATE whose daily denominator varies.

    All counts are exact BIGINTs from one day-grain agg; p, the
    limits and the flag are one mirrored double chain per day row,
    with the flag comparing the 6-dp ROUNDED p against the 6-dp
    ROUNDED limits (the JSD guard convention — both engines compare
    identical literals).

    One corpus pass; day-grain output. Output per day: day, n_events,
    n_errors, p, ucl, lcl, out_of_control.
    """
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").alias("n"),
        F.sum(
            (F.col("event_type") == "error").cast("bigint")
        ).alias("e"),
    )
    return pchart_from_daily(daily)


def pchart_from_daily(daily: DataFrame) -> DataFrame:
    """p-chart assembly from a day-grain (day, n, e) frame — shared
    by the batch op and the streaming twin (whose standing state IS
    this frame, merged additively across micro-batches)."""
    tot = daily.agg(
        F.sum("n").alias("tn"), F.sum("e").alias("te")
    )
    j = daily.crossJoin(F.broadcast(tot))
    pbar = F.col("te").cast("double") / F.col("tn").cast("double")
    se = F.sqrt(pbar * (1 - pbar) / F.col("n").cast("double"))
    p = F.round(F.col("e").cast("double") / F.col("n").cast("double"), 6)
    ucl = F.round(pbar + 3 * se, 6)
    lcl = F.round(F.greatest(pbar - 3 * se, F.lit(0.0)), 6)
    return j.select(
        "day",
        F.col("n").alias("n_events"),
        F.col("e").alias("n_errors"),
        p.alias("p"),
        ucl.alias("ucl"),
        lcl.alias("lcl"),
        ((p > ucl) | (p < lcl)).alias("out_of_control"),
    )


ORACLE_PCHART = """
pc_d AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS e
  FROM events GROUP BY 1
),
pc_t AS (
  SELECT CAST(sum(n) AS BIGINT) AS tn, CAST(sum(e) AS BIGINT) AS te
  FROM pc_d
),
error_pchart AS (
  SELECT day, n AS n_events, e AS n_errors,
         round(CAST(e AS DOUBLE) / n, 6) AS p,
         round(CAST(te AS DOUBLE) / tn
               + 3 * sqrt((CAST(te AS DOUBLE) / tn)
                          * (1 - CAST(te AS DOUBLE) / tn) / n), 6)
           AS ucl,
         round(greatest(CAST(te AS DOUBLE) / tn
               - 3 * sqrt((CAST(te AS DOUBLE) / tn)
                          * (1 - CAST(te AS DOUBLE) / tn) / n),
               0.0), 6) AS lcl,
         (round(CAST(e AS DOUBLE) / n, 6)
            > round(CAST(te AS DOUBLE) / tn
                    + 3 * sqrt((CAST(te AS DOUBLE) / tn)
                               * (1 - CAST(te AS DOUBLE) / tn) / n),
                    6))
         OR (round(CAST(e AS DOUBLE) / n, 6)
            < round(greatest(CAST(te AS DOUBLE) / tn
                    - 3 * sqrt((CAST(te AS DOUBLE) / tn)
                               * (1 - CAST(te AS DOUBLE) / tn) / n),
                    0.0), 6)) AS out_of_control
  FROM pc_d, pc_t
)
"""


# ---------------------------------------------------------------------------
# one-sample KS goodness-of-fit: interarrival gaps vs exponential (round 7)
# ---------------------------------------------------------------------------


def ks_exponential(events: DataFrame) -> DataFrame:
    """One-sample Kolmogorov-Smirnov test of per-user interarrival
    gaps against the fitted EXPONENTIAL (rate = 1/mean gap): is the
    arrival process memoryless — the Poisson-process assumption the
    queueing family (Erlang-B/C) quietly makes, here tested instead
    of assumed. The two-sample KS (``events_ks_drift``) compares two
    empirical samples; this compares one sample to an analytic CDF,
    so D must be evaluated on BOTH sides of each ECDF jump (the sup
    can land at F(x-) as well as F(x)).

    Gaps come from the user-partitioned deterministic lag (the
    ``user_interarrival_stats`` kernel); the ECDF rides the
    octave-bucket prefix kernel at ms value grain (zero global
    windows), counts stay exact BIGINTs, and the analytic CDF
    1 - exp(-g*n/S) is one mirrored double chain per distinct value.
    D rounds at 6 dp; reject uses the asymptotic 5% bound
    1.358/sqrt(n) (rounded before compare, the literal-guard
    convention).

    One shuffle to user partitions + value-grain algebra. Output
    (1 row): n_gaps, mean_gap_ms, d_stat, reject.
    """
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    gaps = (
        events.select(
            "user_id",
            "event_id",
            F.unix_millis("ts").alias("ts_ms"),
        )
        .withColumn(
            "g", F.col("ts_ms") - F.lag("ts_ms").over(w)
        )
        .filter(F.col("g").isNotNull())
    )
    vg = gaps.groupBy("g").agg(F.count("*").alias("cnt"))
    pre = _cent_prefix(vg, ["cnt"], value_col="g", inclusive=True)
    tot = vg.agg(
        F.sum("cnt").alias("n"),
        F.sum(F.col("g") * F.col("cnt")).alias("s"),
    )
    j = pre.crossJoin(F.broadcast(tot))
    nd = F.col("n").cast("double")
    fe = 1 - F.exp(
        -F.col("g").cast("double") * nd / F.col("s").cast("double")
    )
    hi = F.abs(F.col("_pre_cnt").cast("double") / nd - fe)
    lo = F.abs(
        (F.col("_pre_cnt") - F.col("cnt")).cast("double") / nd - fe
    )
    m = j.groupBy("n", "s").agg(
        F.round(F.max(F.greatest(hi, lo)), 6).alias("d_stat")
    )
    return m.select(
        F.col("n").alias("n_gaps"),
        F.round(
            F.col("s").cast("double") / F.col("n").cast("double"), 4
        ).alias("mean_gap_ms"),
        "d_stat",
        (
            F.col("d_stat")
            > F.round(1.358 / F.sqrt(F.col("n").cast("double")), 6)
        ).alias("reject"),
    )


ORACLE_KS_EXPONENTIAL = """
ke_g AS (
  SELECT ts_ms - lag(ts_ms) OVER (
           PARTITION BY user_id ORDER BY ts_ms, event_id) AS g
  FROM (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms FROM events)
),
ke_v AS (
  SELECT g, CAST(count(*) AS BIGINT) AS cnt
  FROM ke_g WHERE g IS NOT NULL GROUP BY 1
),
ke_p AS (
  SELECT g, cnt,
         CAST(sum(cnt) OVER (ORDER BY g
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cum
  FROM ke_v
),
ke_t AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS n,
         CAST(sum(g * cnt) AS BIGINT) AS s
  FROM ke_v
),
ke_d AS (
  SELECT t.n, t.s,
         round(max(greatest(
           abs(CAST(p.cum AS DOUBLE) / t.n
               - (1 - exp(-CAST(p.g AS DOUBLE) * t.n / t.s))),
           abs(CAST(p.cum - p.cnt AS DOUBLE) / t.n
               - (1 - exp(-CAST(p.g AS DOUBLE) * t.n / t.s)))
         )), 6) AS d_stat
  FROM ke_p p, ke_t t GROUP BY 1, 2
),
ks_exponential AS (
  SELECT n AS n_gaps,
         round(CAST(s AS DOUBLE) / n, 4) AS mean_gap_ms,
         d_stat,
         d_stat > round(1.358 / sqrt(CAST(n AS DOUBLE)), 6)
           AS reject
  FROM ke_d
)
"""


# ---------------------------------------------------------------------------
# Bartlett variance-homogeneity test (round 7)
# ---------------------------------------------------------------------------


def bartlett_test(events: DataFrame) -> DataFrame:
    """Bartlett's test for equal variances across event types — the
    NORMAL-THEORY member of the scale ladder (most powerful under
    normality, notoriously sensitive to heavy tails; Levene and
    Brown-Forsythe are its robust fallbacks, and all three shipping
    together is exactly how a practitioner triangulates):
    T = [(N-k) ln(Sp^2) - sum (n_i-1) ln(S_i^2)] / C with the
    Bartlett small-sample correction C.

    Per-group moments (n_i, sum c, sum c^2) are exact DECIMAL/BIGINT
    from ONE hash-agg; the unbiased variances, lns and the k-row
    assembly are one mirrored double chain (ln evaluated on
    identical doubles in both engines), rounded 6 dp. Groups with
    n_i < 2 or zero variance are excluded from the statistic (ln(0)
    guard), with the count emitted.

    Output (1 row): k_used, n, t_stat, significant (chi2 df=4 at
    .05 — the fixture-k convention of the ladder).
    """
    g = (
        events.filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.round(F.col("value") * 100, 0).cast("bigint").alias("c"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("ng"),
            F.sum("c").alias("sg"),
            F.sum(
                F.col("c").cast("decimal(38,0)")
                * F.col("c").cast("decimal(38,0)")
            ).alias("qg"),
        )
    )
    ngd = F.col("ng").cast("double")
    var = (
        ngd * F.col("qg").cast("double")
        - F.col("sg").cast("double") * F.col("sg").cast("double")
    ) / (ngd * (ngd - 1))
    gv = g.select("ng", var.alias("v")).filter(
        (F.col("ng") >= 2) & (F.col("v") > 0)
    )
    m = gv.agg(
        F.count("*").alias("k"),
        F.sum("ng").alias("n"),
        F.sum((F.col("ng") - 1).cast("double") * F.col("v")).alias(
            "sv"
        ),
        F.sum(
            (F.col("ng") - 1).cast("double") * F.log("v")
        ).alias("slv"),
        F.sum(1.0 / (F.col("ng") - 1).cast("double")).alias("sinv"),
    )
    nd = F.col("n").cast("double")
    kd = F.col("k").cast("double")
    nk = nd - kd
    sp2 = F.col("sv") / nk
    c = 1 + (F.col("sinv") - 1 / nk) / (3 * (kd - 1))
    t = F.round((nk * F.log(sp2) - F.col("slv")) / c, 6)
    return m.select(
        F.col("k").alias("k_used"),
        "n",
        t.alias("t_stat"),
        (t > KRUSKAL_CHI2_CRIT_05).alias("significant"),
    )


ORACLE_BARTLETT = f"""
bt_g AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS ng,
         CAST(sum(c) AS BIGINT) AS sg,
         CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS qg
  FROM (SELECT event_type,
               CAST(round(value * 100, 0) AS BIGINT) AS c
        FROM events WHERE value IS NOT NULL)
  GROUP BY 1
),
bt_v AS (
  SELECT ng,
         (CAST(ng AS DOUBLE) * CAST(qg AS DOUBLE)
          - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))
         / (CAST(ng AS DOUBLE) * (CAST(ng AS DOUBLE) - 1)) AS v
  FROM bt_g
),
bt_m AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
         CAST(sum(ng) AS BIGINT) AS n,
         sum((CAST(ng AS DOUBLE) - 1) * v) AS sv,
         sum((CAST(ng AS DOUBLE) - 1) * ln(v)) AS slv,
         sum(1.0 / (CAST(ng AS DOUBLE) - 1)) AS sinv
  FROM bt_v WHERE ng >= 2 AND v > 0
),
bartlett_test AS (
  SELECT k AS k_used, n,
         round(((CAST(n AS DOUBLE) - k)
                * ln(sv / (CAST(n AS DOUBLE) - k)) - slv)
               / (1 + (sinv - 1 / (CAST(n AS DOUBLE) - k))
                      / (3 * (CAST(k AS DOUBLE) - 1))), 6) AS t_stat,
         round(((CAST(n AS DOUBLE) - k)
                * ln(sv / (CAST(n AS DOUBLE) - k)) - slv)
               / (1 + (sinv - 1 / (CAST(n AS DOUBLE) - k))
                      / (3 * (CAST(k AS DOUBLE) - 1))), 6)
           > {KRUSKAL_CHI2_CRIT_05} AS significant
  FROM bt_m
)
"""


# ---------------------------------------------------------------------------
# Welch heteroscedastic one-way ANOVA (round 7)
# ---------------------------------------------------------------------------


def welch_anova(events: DataFrame) -> DataFrame:
    """Welch's heteroscedastic one-way ANOVA of event value across
    types: the location test that does NOT assume equal variances —
    the partner the scale ladder (Levene/Brown-Forsythe/Bartlett)
    points you to when it rejects homogeneity and the classic F
    (``events_anova``) loses its level. Weights w_i = n_i/s_i^2;
    F* = [sum w_i (m_i - m_w)^2 / (k-1)] /
    [1 + 2(k-2)/(k^2-1) * sum (1-w_i/W)^2/(n_i-1)].

    Same exact-integer group moments as the ANOVA (one hash-agg);
    means/variances/weights are a mirrored k-row double chain,
    rounded 6 dp. Groups need n_i >= 2 and s_i^2 > 0 (excluded
    otherwise, count emitted). The critical value is the ladder's
    fixed df1=4 literal (Welch df2 is large at any fixture scale).

    Output (1 row): k_used, n, f_stat, significant.
    """
    g = (
        events.filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.round(F.col("value") * 100, 0).cast("bigint").alias("c"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("ng"),
            F.sum("c").alias("sg"),
            F.sum(
                F.col("c").cast("decimal(38,0)")
                * F.col("c").cast("decimal(38,0)")
            ).alias("qg"),
        )
    )
    ngd = F.col("ng").cast("double")
    mean = F.col("sg").cast("double") / ngd
    var = (
        ngd * F.col("qg").cast("double")
        - F.col("sg").cast("double") * F.col("sg").cast("double")
    ) / (ngd * (ngd - 1))
    gv = g.select("ng", mean.alias("m"), var.alias("v")).filter(
        (F.col("ng") >= 2) & (F.col("v") > 0)
    ).withColumn("w", F.col("ng").cast("double") / F.col("v"))
    m = gv.agg(
        F.count("*").alias("k"),
        F.sum("ng").alias("n"),
        F.sum("w").alias("sw"),
        F.sum(F.col("w") * F.col("m")).alias("swm"),
        F.sum(F.col("w") * F.col("m") * F.col("m")).alias("swm2"),
        F.sum(
            F.col("w") * F.col("w") / (F.col("ng") - 1).cast("double")
        ).alias("sww"),
        F.sum(F.col("w") / (F.col("ng") - 1).cast("double")).alias(
            "swn"
        ),
        F.sum(1.0 / (F.col("ng") - 1).cast("double")).alias("sinv"),
    )
    kd = F.col("k").cast("double")
    # sum (1 - w_i/W)^2/(n_i-1) expands to sinv - 2*swn/W + sww/W^2
    lam = (
        F.col("sinv")
        - 2 * F.col("swn") / F.col("sw")
        + F.col("sww") / (F.col("sw") * F.col("sw"))
    )
    # sum w_i (m_i - m_w)^2 = swm2 - swm^2/W
    num = (
        F.col("swm2") - F.col("swm") * F.col("swm") / F.col("sw")
    ) / (kd - 1)
    den = 1 + 2 * (kd - 2) / (kd * kd - 1) * lam
    f = F.round(num / den, 6)
    return m.select(
        F.col("k").alias("k_used"),
        "n",
        f.alias("f_stat"),
        (f > ANOVA_F_CRIT_05).alias("significant"),
    )


ORACLE_WELCH_ANOVA = f"""
wa_g AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS ng,
         CAST(sum(c) AS BIGINT) AS sg,
         CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS qg
  FROM (SELECT event_type,
               CAST(round(value * 100, 0) AS BIGINT) AS c
        FROM events WHERE value IS NOT NULL)
  GROUP BY 1
),
wa_v AS (
  SELECT ng,
         CAST(sg AS DOUBLE) / ng AS m,
         (CAST(ng AS DOUBLE) * CAST(qg AS DOUBLE)
          - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))
         / (CAST(ng AS DOUBLE) * (CAST(ng AS DOUBLE) - 1)) AS v
  FROM wa_g
),
wa_w AS (
  SELECT ng, m, v, CAST(ng AS DOUBLE) / v AS w
  FROM wa_v WHERE ng >= 2 AND v > 0
),
wa_m AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
         CAST(sum(ng) AS BIGINT) AS n,
         sum(w) AS sw,
         sum(w * m) AS swm,
         sum(w * m * m) AS swm2,
         sum(w * w / (CAST(ng AS DOUBLE) - 1)) AS sww,
         sum(w / (CAST(ng AS DOUBLE) - 1)) AS swn,
         sum(1.0 / (CAST(ng AS DOUBLE) - 1)) AS sinv
  FROM wa_w
),
welch_anova AS (
  SELECT k AS k_used, n,
         round(((swm2 - swm * swm / sw) / (CAST(k AS DOUBLE) - 1))
               / (1 + 2 * (CAST(k AS DOUBLE) - 2)
                      / (CAST(k AS DOUBLE) * k - 1)
                      * (sinv - 2 * swn / sw + sww / (sw * sw))), 6)
           AS f_stat,
         round(((swm2 - swm * swm / sw) / (CAST(k AS DOUBLE) - 1))
               / (1 + 2 * (CAST(k AS DOUBLE) - 2)
                      / (CAST(k AS DOUBLE) * k - 1)
                      * (sinv - 2 * swn / sw + sww / (sw * sw))), 6)
           > {ANOVA_F_CRIT_05} AS significant
  FROM wa_m
)
"""


# ---------------------------------------------------------------------------
# circular statistics: Rayleigh uniformity of purchase hour (round 7)
# ---------------------------------------------------------------------------


def rayleigh_hour(events: DataFrame) -> DataFrame:
    """Circular statistics of the purchase HOUR-OF-DAY: mean
    direction (peak hour), resultant length R-bar, and the Rayleigh
    uniformity test z = n*R-bar^2 — the correct way to average a
    clock (the linear mean of {23h, 1h} is noon; the circular mean
    is midnight), and the formal "is there a daily rhythm at all"
    gate under the seasonality ladder.

    The corpus collapses to 24 exact hour counts in one hash-agg;
    C = sum n_h cos(2*pi*h/24) and S = ... sin(...) then fold over
    the PACKED hour-sorted array (one sequential executor fold —
    same-IEEE additions in both engines, the record-days protocol),
    so the only doubles are 24 identical cos/sin terms in identical
    order. p ~ exp(-z) (large-n Rayleigh); the flag compares the
    6-dp ROUNDED p to 0.05.

    Output (1 row): n, mean_hour, r_bar, z_stat, p_approx,
    nonuniform.
    """
    hc = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.hour("ts").alias("h"))
        .agg(F.count("*").alias("c"))
    )
    packed = hc.agg(
        F.sort_array(F.collect_list(F.struct("h", "c"))).alias("s")
    )
    m = packed.select(
        F.expr(
            "aggregate(s, cast(0 as bigint), (a, x) -> a + x.c)"
        ).alias("n"),
        F.expr(
            "aggregate(s, cast(0.0 as double),"
            " (a, x) -> a + x.c * cos(2 * pi() * x.h / 24))"
        ).alias("cc"),
        F.expr(
            "aggregate(s, cast(0.0 as double),"
            " (a, x) -> a + x.c * sin(2 * pi() * x.h / 24))"
        ).alias("ss"),
    )
    nd = F.col("n").cast("double")
    rbar = F.sqrt(
        F.col("cc") * F.col("cc") + F.col("ss") * F.col("ss")
    ) / nd
    mean_hour = (
        (F.atan2(F.col("ss"), F.col("cc")) / (2 * F.lit(3.141592653589793)))
        * 24 + 24
    ) % 24
    z = nd * rbar * rbar
    p = F.round(F.exp(-z), 6)
    return m.select(
        "n",
        F.round(mean_hour, 4).alias("mean_hour"),
        F.round(rbar, 6).alias("r_bar"),
        F.round(z, 6).alias("z_stat"),
        p.alias("p_approx"),
        (p < 0.05).alias("nonuniform"),
    )


ORACLE_RAYLEIGH = """
ry_h AS (
  SELECT hour(ts) AS h, CAST(count(*) AS BIGINT) AS c
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
ry_p AS (
  SELECT list({'h': h, 'c': c} ORDER BY h) AS s FROM ry_h
),
ry_m AS (
  SELECT list_aggregate(list_transform(s, x -> x.c), 'sum') AS n,
         list_aggregate(list_transform(s,
           x -> x.c * cos(2 * pi() * x.h / 24)), 'sum') AS cc,
         list_aggregate(list_transform(s,
           x -> x.c * sin(2 * pi() * x.h / 24)), 'sum') AS ss
  FROM ry_p
),
rayleigh_hour AS (
  SELECT CAST(n AS BIGINT) AS n,
         round(((atan2(ss, cc) / (2 * 3.141592653589793)) * 24
                % 24 + 24) % 24, 4) AS mean_hour,
         round(sqrt(cc * cc + ss * ss) / n, 6) AS r_bar,
         round(n * (sqrt(cc * cc + ss * ss) / n)
                 * (sqrt(cc * cc + ss * ss) / n), 6) AS z_stat,
         round(exp(-(n * (sqrt(cc * cc + ss * ss) / n)
                     * (sqrt(cc * cc + ss * ss) / n))), 6)
           AS p_approx,
         round(exp(-(n * (sqrt(cc * cc + ss * ss) / n)
                     * (sqrt(cc * cc + ss * ss) / n))), 6) < 0.05
           AS nonuniform
  FROM ry_m
)
"""


# ---------------------------------------------------------------------------
# Cramer-von Mises two-sample test (round 7)
# ---------------------------------------------------------------------------

#: asymptotic 5% critical value of the two-sample CvM T statistic.
CVM_CRIT_05 = 0.461


def cramer_von_mises(events: DataFrame) -> DataFrame:
    """Two-sample Cramer-von Mises test, purchase vs click values:
    T = nm/N^2 * sum over pooled points of (F_n - G_m)^2 — the
    INTEGRATED-distance member of the two-sample family (KS reads
    the single worst gap; CvM accumulates every gap, so it sees
    broad shape differences KS's sup misses; energy/AD weight the
    tails differently).

    FULLY exact integer core: with per-value counts a, b, inclusive
    cumulatives A, B (the octave prefix kernel) and z = a + b,
    T = sum_v z*(m*A - n*B)^2 / (n*m*N^2) — the numerator sum is one
    DECIMAL(38,0) hash-agg (envelope: z*(mA)^2 <= N*(nm)^2 ~ 1e38 at
    n,m ~ 5e7 pooled cent-grain rows; beyond that, pre-aggregate the
    value grain coarser), and T divides ONCE, rounded 6 dp.

    Output (1 row): n1, n2, t_stat, significant (T > 0.461, the
    asymptotic 5% point).
    """
    cg = events.filter(
        F.col("value").isNotNull()
        & F.col("event_type").isin("purchase", "click")
    ).select(
        F.round(F.col("value") * 100, 0).cast("bigint").alias("c"),
        (F.col("event_type") == "purchase").alias("is_x"),
    )
    vg = cg.groupBy("c").agg(
        F.sum(F.when(F.col("is_x"), 1).otherwise(0)).alias("a"),
        F.sum(F.when(F.col("is_x"), 0).otherwise(1)).alias("b"),
    )
    pre = _cent_prefix(vg, ["a", "b"], inclusive=True)
    tot = vg.agg(F.sum("a").alias("n"), F.sum("b").alias("m"))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    j = pre.crossJoin(F.broadcast(tot))
    term = dec(F.col("a") + F.col("b")) * (
        dec(F.col("m")) * dec(F.col("_pre_a"))
        - dec(F.col("n")) * dec(F.col("_pre_b"))
    ) * (
        dec(F.col("m")) * dec(F.col("_pre_a"))
        - dec(F.col("n")) * dec(F.col("_pre_b"))
    )
    agg = j.groupBy("n", "m").agg(F.sum(term).alias("s"))
    nd, md = F.col("n").cast("double"), F.col("m").cast("double")
    nn = nd + md
    t = F.round(
        F.col("s").cast("double") / (nd * md * nn * nn), 6
    )
    return agg.select(
        F.col("n").alias("n1"),
        F.col("m").alias("n2"),
        t.alias("t_stat"),
        (t > CVM_CRIT_05).alias("significant"),
    )


ORACLE_CVM = f"""
cv_c AS (
  SELECT CAST(round(value * 100, 0) AS BIGINT) AS c,
         event_type = 'purchase' AS is_x
  FROM events
  WHERE value IS NOT NULL AND event_type IN ('purchase', 'click')
),
cv_v AS (
  SELECT c,
         CAST(sum(CASE WHEN is_x THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(sum(CASE WHEN is_x THEN 0 ELSE 1 END) AS BIGINT) AS b
  FROM cv_c GROUP BY 1
),
cv_p AS (
  SELECT a, b,
         CAST(sum(a) OVER (ORDER BY c
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS ca,
         CAST(sum(b) OVER (ORDER BY c
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cb
  FROM cv_v
),
cv_t AS (
  SELECT CAST(sum(a) AS BIGINT) AS n, CAST(sum(b) AS BIGINT) AS m
  FROM cv_v
),
cv_s AS (
  SELECT t.n, t.m,
         CAST(sum(CAST(p.a + p.b AS HUGEINT)
              * (t.m * CAST(p.ca AS HUGEINT) - t.n * p.cb)
              * (t.m * CAST(p.ca AS HUGEINT) - t.n * p.cb))
              AS HUGEINT) AS s
  FROM cv_p p, cv_t t GROUP BY 1, 2
),
cramer_von_mises AS (
  SELECT n AS n1, m AS n2,
         round(CAST(s AS DOUBLE)
               / (CAST(n AS DOUBLE) * m * (n + m) * (n + m)), 6)
           AS t_stat,
         round(CAST(s AS DOUBLE)
               / (CAST(n AS DOUBLE) * m * (n + m) * (n + m)), 6)
           > {CVM_CRIT_05} AS significant
  FROM cv_s
)
"""


# ---------------------------------------------------------------------------
# Anderson-Darling two-sample test (round 7)
# ---------------------------------------------------------------------------

#: asymptotic 5% point of the standardized AD k-sample statistic
#: (Scholz-Stephens T_kN table, k=2 -> df m=1): 1.960.
AD_CRIT_05 = 1.960

#: harmonic-number evaluation switch: exact ascending fold up to this
#: pooled size, Euler-Maclaurin closed form beyond (EM error < 1e-14
#: at the cap — eleven orders under the 6-dp rounding; both engines
#: branch on the same literal, so the doubles agree either way).
AD_HARMONIC_FOLD_CAP = 512
_EULER_GAMMA = 0.5772156649015329
_PI2_OVER_6 = 1.6449340668482264


def anderson_darling_2s(events: DataFrame) -> DataFrame:
    """Two-sample Anderson-Darling test (Scholz-Stephens A2akN,
    ties-adjusted midrank version), purchase vs click values — the
    TAIL-WEIGHTED member of the two-sample family: the 1/(H(1-H))
    weight makes AD the most sensitive of KS/CvM/AD to differences
    in the distribution tails, which is where revenue distributions
    actually differ.

    Integer core via the octave prefix kernel: per pooled distinct
    value, the DOUBLED midrank cumulatives 2B = 2*cum - z and
    2Ba = 2*cuma - a are exact BIGINTs; each value's term
    z*(N*2Ba - n*2B)^2 / (2B*(2N - 2B) - N*z) is then ONE division
    (numerator DECIMAL-exact), and the sum over the value grain is
    a double fold whose addends are O(N) — fold-order noise ~1e-12
    relative against the 6-dp rounding (the AR2 protocol, noted in
    code). Standardized against the Scholz-Stephens variance with
    H/h/g evaluated by the same packed harmonic folds as the
    record-days test.

    Output (1 row): n1, n2, a2_stat, t_std, significant
    (T > 1.960).
    """
    cg = events.filter(
        F.col("value").isNotNull()
        & F.col("event_type").isin("purchase", "click")
    ).select(
        F.round(F.col("value") * 100, 0).cast("bigint").alias("c"),
        (F.col("event_type") == "purchase").alias("is_x"),
    )
    vg = cg.groupBy("c").agg(
        F.sum(F.when(F.col("is_x"), 1).otherwise(0)).alias("a"),
        F.sum(F.when(F.col("is_x"), 0).otherwise(1)).alias("b"),
    ).withColumn("z", F.col("a") + F.col("b"))
    pre = _cent_prefix(vg, ["a", "z"], inclusive=True)
    tot = vg.agg(
        F.sum("a").alias("n"),
        F.sum("b").alias("m"),
        F.sum("z").alias("nn"),
    )
    j = pre.crossJoin(F.broadcast(tot))
    # doubled midrank cumulatives (exact integers)
    b2 = 2 * F.col("_pre_z") - F.col("z")
    ba2 = 2 * F.col("_pre_a") - F.col("a")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    num = (
        dec(F.col("nn")) * dec(ba2) - dec(F.col("n")) * dec(b2)
    )
    den = dec(b2) * dec(2 * F.col("nn") - b2) - dec(
        F.col("nn")
    ) * dec(F.col("z"))
    term = F.when(
        den != 0,
        (dec(F.col("z")) * num * num).cast("double")
        / den.cast("double"),
    ).otherwise(F.lit(0.0))
    agg = j.groupBy("n", "m", "nn").agg(F.sum(term).alias("s"))
    nd = F.col("nn").cast("double")
    hcap = (
        1.0 / F.col("n").cast("double")
        + 1.0 / F.col("m").cast("double")
    )
    # doubled-cumulative scaling cancels: (N*2Ba - n*2B)^2 =
    # 4*(N*Ba - n*B)^2 and den(2B) = 4*(B(N-B) - N*z/4). For k=2 the
    # two samples' inner sums are IDENTICAL ((N*Ma2 - m*B) =
    # -(N*Ma1 - n*B)), so sum_i (1/n_i)(...) = hcap * s, and
    # A2 = (N-1)/N * hcap * s / N.
    a2 = (nd - 1) / nd * hcap * F.col("s") / nd
    # Scholz-Stephens variance of A2akN for k=2. The constants need
    # only the harmonic numbers H_{N-1} and H2_N: the double sum
    # g = sum_{i<=N-2} (H_{N-1} - H_i)/(N-i) has the CLOSED FORM
    # g = H2_N - 2*H_{N-1}/N - 1/N^2 (generating-function identity
    # sum_{j<N} H_{N-j}/j = H_N^2 - H2_N, validated to machine
    # precision in tests) — so NOTHING here is O(N): below the
    # AD_HARMONIC_FOLD_CAP literal both engines run the exact
    # ascending fold, above it the Euler-Maclaurin expansions (error
    # < 1e-14 at the cap, identical doubles both engines). No
    # corpus-sized array ever materializes (review finding).
    em_h = (
        f"ln(cast(nn - 1 as double)) + {_EULER_GAMMA!r}"
        " + 1.0 / (2.0 * (nn - 1))"
        " - 1.0 / (12.0 * (nn - 1) * (nn - 1))"
        " + 1.0 / (120.0 * (nn - 1) * (nn - 1) * (nn - 1)"
        " * (nn - 1))"
    )
    em_h2 = (
        f"{_PI2_OVER_6!r} - 1.0 / nn + 1.0 / (2.0 * nn * nn)"
        " - 1.0 / (6.0 * nn * nn * nn)"
        " + 1.0 / (30.0 * nn * nn * nn * nn * nn)"
    )
    cap = AD_HARMONIC_FOLD_CAP
    agg = agg.withColumn(
        "hh",
        F.expr(
            f"if(nn - 1 <= {cap},"
            " aggregate(sequence(1, cast(nn - 1 as int)),"
            " cast(0.0 as double), (ac, i) -> ac + 1.0 / i),"
            f" {em_h})"
        ),
    ).withColumn(
        "h2n",
        F.expr(
            f"if(nn <= {cap},"
            " aggregate(sequence(1, cast(nn as int)),"
            " cast(0.0 as double),"
            " (ac, i) -> ac + 1.0 / (cast(i as double) * i)),"
            f" {em_h2})"
        ),
    ).withColumn(
        "gg",
        F.expr(
            "h2n - 2.0 * hh / nn"
            " - 1.0 / (cast(nn as double) * nn)"
        ),
    )
    hh = F.col("hh")
    gg = F.col("gg")
    k = 2
    aa = (4 * gg - 6) * (k - 1) + (10 - 6 * gg) * hcap
    bb = (
        (2 * gg - 4) * k * k
        + 8 * hh * k
        + (2 * gg - 14 * hh - 4) * hcap
        - 8 * hh
        + 4 * gg
        - 6
    )
    cc = (
        (6 * hh + 2 * gg - 2) * k * k
        + (4 * hh - 4 * gg + 6) * k
        + (2 * hh - 6) * hcap
        + 4 * hh
    )
    dd = (2 * hh + 6) * k * k - 4 * hh * k
    var = (
        aa * nd * nd * nd + bb * nd * nd + cc * nd + dd
    ) / ((nd - 1) * (nd - 2) * (nd - 3))
    tstd = F.round((a2 - (k - 1)) / F.sqrt(var), 6)
    return agg.select(
        F.col("n").alias("n1"),
        F.col("m").alias("n2"),
        F.round(a2, 6).alias("a2_stat"),
        tstd.alias("t_std"),
        (tstd > AD_CRIT_05).alias("significant"),
    )


ORACLE_AD_2S = f"""
ad_c AS (
  SELECT CAST(round(value * 100, 0) AS BIGINT) AS c,
         event_type = 'purchase' AS is_x
  FROM events
  WHERE value IS NOT NULL AND event_type IN ('purchase', 'click')
),
ad_v AS (
  SELECT c,
         CAST(sum(CASE WHEN is_x THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(sum(CASE WHEN is_x THEN 0 ELSE 1 END) AS BIGINT) AS b,
         CAST(count(*) AS BIGINT) AS z0
  FROM ad_c GROUP BY 1
),
ad_p AS (
  SELECT a, b, z0 AS z,
         CAST(sum(a) OVER (ORDER BY c
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS ca,
         CAST(sum(z0) OVER (ORDER BY c
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cz
  FROM ad_v
),
ad_t AS (
  SELECT CAST(sum(a) AS BIGINT) AS n, CAST(sum(b) AS BIGINT) AS m,
         CAST(sum(z0) AS BIGINT) AS nn
  FROM ad_v
),
ad_s AS (
  SELECT t.n, t.m, t.nn,
         sum(CASE WHEN (2 * p.cz - p.z)
                       * (2 * t.nn - (2 * p.cz - p.z))
                       - t.nn * p.z <> 0
             THEN CAST(CAST(p.z AS HUGEINT)
                  * (t.nn * CAST(2 * p.ca - p.a AS HUGEINT)
                     - t.n * (2 * p.cz - p.z))
                  * (t.nn * CAST(2 * p.ca - p.a AS HUGEINT)
                     - t.n * (2 * p.cz - p.z)) AS DOUBLE)
                  / CAST(CAST(2 * p.cz - p.z AS HUGEINT)
                         * (2 * t.nn - (2 * p.cz - p.z))
                         - CAST(t.nn AS HUGEINT) * p.z AS DOUBLE)
             ELSE 0.0 END) AS s
  FROM ad_p p, ad_t t GROUP BY 1, 2, 3
),
ad_hg AS (
  SELECT n, m, nn, s,
         CASE WHEN nn - 1 <= {AD_HARMONIC_FOLD_CAP} THEN
           list_aggregate(list_transform(range(1, CAST(nn AS INT)),
             i -> 1.0 / i), 'sum')
         ELSE ln(CAST(nn - 1 AS DOUBLE)) + {_EULER_GAMMA!r}
              + 1.0 / (2.0 * (nn - 1))
              - 1.0 / (12.0 * (nn - 1) * (nn - 1))
              + 1.0 / (120.0 * (nn - 1) * (nn - 1) * (nn - 1)
                       * (nn - 1)) END AS hh,
         CASE WHEN nn <= {AD_HARMONIC_FOLD_CAP} THEN
           list_aggregate(list_transform(range(1, CAST(nn + 1 AS INT)),
             i -> 1.0 / (CAST(i AS DOUBLE) * i)), 'sum')
         ELSE {_PI2_OVER_6!r} - 1.0 / nn + 1.0 / (2.0 * nn * nn)
              - 1.0 / (6.0 * nn * nn * nn)
              + 1.0 / (30.0 * nn * nn * nn * nn * nn) END AS h2n,
         1.0 / n + 1.0 / m AS hcap
  FROM ad_s
),
ad_g AS (
  SELECT n, m, nn, s, hh, hcap,
         h2n - 2.0 * hh / nn - 1.0 / (CAST(nn AS DOUBLE) * nn) AS gg
  FROM ad_hg
),
ad_f AS (
  SELECT n, m, nn, hh, hcap, gg,
         (CAST(nn AS DOUBLE) - 1) / nn * hcap * s / nn AS a2,
         ((((4 * gg - 6) * 1 + (10 - 6 * gg) * hcap)
             * CAST(nn AS DOUBLE) * nn * nn
           + ((2 * gg - 4) * 4 + 8 * hh * 2
              + (2 * gg - 14 * hh - 4) * hcap - 8 * hh
              + 4 * gg - 6) * CAST(nn AS DOUBLE) * nn
           + ((6 * hh + 2 * gg - 2) * 4
              + (4 * hh - 4 * gg + 6) * 2
              + (2 * hh - 6) * hcap + 4 * hh) * CAST(nn AS DOUBLE)
           + ((2 * hh + 6) * 4 - 4 * hh * 2))
          / ((CAST(nn AS DOUBLE) - 1) * (nn - 2) * (nn - 3))) AS var
  FROM ad_g
),
anderson_darling_2s AS (
  SELECT n AS n1, m AS n2,
         round(a2, 6) AS a2_stat,
         round((a2 - 1) / sqrt(var), 6) AS t_std,
         round((a2 - 1) / sqrt(var), 6) > {AD_CRIT_05} AS significant
  FROM ad_f
)
"""


# ---------------------------------------------------------------------------
# daily periodogram at fixed integer periods (round 8)
# ---------------------------------------------------------------------------

#: candidate cycle lengths, in days. Integer periods over the
#: calendar-bounded day index keep every trig argument 2*pi*d/P an
#: identical double in both engines.
PERIODOGRAM_PERIODS = tuple(range(2, 15))


def periodogram_daily(events: DataFrame) -> DataFrame:
    """Direct-sum power spectrum of the DAILY purchase-count series at
    fixed integer periods (2..14 days) — the "which weekly/biweekly
    cycle dominates" readout that closes the seasonality ladder above
    the Rayleigh uniformity gate (is there a daily rhythm) and the STL
    decomposition. This retires the r6/r7 DFT deferral: the deferral
    reasoned that an irrational trig basis breaks the cross-engine
    hash, but ``rayleigh_hour`` (round 7) established the packed
    same-IEEE trig-fold protocol — the corpus collapses to an exact
    integer day-count series, and the only doubles are T identical
    cos/sin terms folded in identical (day-sorted) order in both
    engines (the record-days protocol).

    Per period P: C = sum_d (x_d - mu) cos(2 pi d / P), S = likewise
    with sin, power I_P = (C^2 + S^2) / T — the classic periodogram of
    the MEAN-CENTERED series (centering removes the DC term that would
    otherwise swamp every bin). The day series is gap-filled over the
    full calendar span (a zero-purchase day is a real observation, and
    skipping it would shift every later phase), x_d and T are exact
    BIGINTs, and mu = total/T is the single shared double.

    Scale: one day-grain hash-agg (calendar-bounded — SCALE.md's
    bounded-grain argument: days do not grow with row count), then a
    13-row period frame folding over the packed array on one executor.
    At 100 TB the day table is still tiny; the fold cost is
    |periods| * T multiply-adds. Output per period: period, c_term,
    s_term, power, is_peak.
    """
    pd_ = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("c"))
    )
    bounds = pd_.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    cal = bounds.select(
        F.explode(F.expr("sequence(d0, d1)")).alias("day"), "d0"
    )
    daily = cal.join(pd_, "day", "left").select(
        F.datediff("day", "d0").cast("bigint").alias("d"),
        F.coalesce("c", F.lit(0)).cast("bigint").alias("c"),
    )
    packed = daily.agg(
        F.sort_array(F.collect_list(F.struct("d", "c"))).alias("s"),
        F.sum("c").alias("tot"),
        F.count("*").alias("t"),
    )
    per = packed.select(
        "s",
        "t",
        (F.col("tot").cast("double") / F.col("t").cast("double")).alias(
            "mu"
        ),
        F.explode(
            F.array(*[F.lit(p) for p in PERIODOGRAM_PERIODS])
        ).alias("period"),
    )
    folded = per.select(
        "period",
        "t",
        F.expr(
            "aggregate(s, cast(0.0 as double),"
            " (a, x) -> a + (x.c - mu) * cos(2 * pi() * x.d / period))"
        ).alias("cc"),
        F.expr(
            "aggregate(s, cast(0.0 as double),"
            " (a, x) -> a + (x.c - mu) * sin(2 * pi() * x.d / period))"
        ).alias("ss"),
    )
    # + 0.0 normalizes IEEE -0.0 (record-days convention: a tiny
    # negative rounds to -0.0 in one engine, +0.0 in the other).
    pw = folded.select(
        "period",
        (F.round("cc", 6) + 0.0).alias("c_term"),
        (F.round("ss", 6) + 0.0).alias("s_term"),
        F.round(
            (F.col("cc") * F.col("cc") + F.col("ss") * F.col("ss"))
            / F.col("t").cast("double"),
            6,
        ).alias("power"),
    )
    mx = pw.agg(F.max("power").alias("pmax"))
    return pw.crossJoin(F.broadcast(mx)).select(
        "period",
        "c_term",
        "s_term",
        "power",
        (F.col("power") == F.col("pmax")).alias("is_peak"),
    )


ORACLE_PERIODOGRAM = f"""
pg_d AS (
  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS c
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
pg_b AS (SELECT min(day) AS d0, max(day) AS d1 FROM pg_d),
pg_cal AS (
  SELECT CAST(u.day AS DATE) AS day, b.d0
  FROM pg_b b, unnest(generate_series(CAST(b.d0 AS TIMESTAMP),
                                      CAST(b.d1 AS TIMESTAMP),
                                      INTERVAL 1 DAY)) AS u(day)
),
pg_daily AS (
  SELECT CAST(date_diff('day', c.d0, c.day) AS BIGINT) AS d,
         CAST(coalesce(p.c, 0) AS BIGINT) AS c
  FROM pg_cal c LEFT JOIN pg_d p USING (day)
),
pg_pack AS (
  SELECT list({{'d': d, 'c': c}} ORDER BY d) AS s,
         CAST(sum(c) AS BIGINT) AS tot,
         CAST(count(*) AS BIGINT) AS t
  FROM pg_daily
),
pg_per AS (
  SELECT s, t, CAST(tot AS DOUBLE) / t AS mu, pp.period
  FROM pg_pack,
       (SELECT unnest([{", ".join(str(p) for p in PERIODOGRAM_PERIODS)}])
          AS period) pp
),
pg_f AS (
  SELECT period, t,
         list_aggregate(list_transform(s,
           x -> (x.c - mu) * cos(2 * pi() * x.d / period)), 'sum') AS cc,
         list_aggregate(list_transform(s,
           x -> (x.c - mu) * sin(2 * pi() * x.d / period)), 'sum') AS ss
  FROM pg_per
),
pg_pw AS (
  SELECT period, round(cc, 6) + 0.0 AS c_term,
         round(ss, 6) + 0.0 AS s_term,
         round((cc * cc + ss * ss) / t, 6) AS power
  FROM pg_f
),
events_periodogram AS (
  SELECT period, c_term, s_term, power,
         power = (SELECT max(power) FROM pg_pw) AS is_peak
  FROM pg_pw
)
"""


# ---------------------------------------------------------------------------
# per-user bounded-capacity LRU hit-rate simulation (round 8)
# ---------------------------------------------------------------------------

#: cache capacities to report — the cache-sizing curve.
LRU_CAPACITIES = (1, 2, 4, 8)


def lru_hitrate(events: DataFrame) -> DataFrame:
    """Per-user capacity-k LRU cache simulation over each user's
    time-ordered item-access sequence (item = the ``props`` JSON
    payload's ``k`` field — the event's object id), reporting the
    corpus hit rate per capacity in {1, 2, 4, 8} — the cache-sizing
    readout a serving team asks of an access log ("how big must the
    per-session cache be before hit rate plateaus"). This retires the
    deferred-ledger LRU entry: the GLOBAL-sequence variant stays
    parked (one unbounded fold over the whole corpus), but the
    per-user sequence is key-bounded — exactly the legitimacy argument
    the shipped DTW/Needleman-Wunsch packed-array kernels rely on.

    The simulation is an exact integer fold: each user's item array
    (sorted by ts, event_id — ts is unique per user in the fixtures,
    the tiebreak is for safety) is folded once per capacity with an
    (lru-list, hits) accumulator — hit moves the item to the front,
    miss prepends and truncates to capacity. Zero doubles anywhere
    except the final hit_rate division, mirrored 6 dp.

    Scale: one (user, item-array) hash-agg — per-user arrays are
    session-bounded, the same grain every sequence kernel here uses —
    then |capacities| folds per user, each O(len * capacity) with
    capacity <= 8. The oracle replays the identical automaton as a
    recursive CTE. Output per capacity: capacity, n_refs, hits,
    hit_rate.
    """
    seq = events.select(
        "user_id",
        "ts",
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("item"),
    )
    per_user = seq.groupBy("user_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(ts, event_id,"
            " item))), x -> x.item)"
        ).alias("items")
    )
    caps = per_user.select(
        "items",
        F.explode(
            F.array(*[F.lit(k) for k in LRU_CAPACITIES])
        ).alias("capacity"),
    )
    folded = caps.select(
        "capacity",
        F.size("items").cast("bigint").alias("refs"),
        F.expr(
            "aggregate(items,"
            " named_struct('q', cast(array() as array<bigint>),"
            "              'h', cast(0 as bigint)),"
            " (acc, x) -> if(array_contains(acc.q, x),"
            "   named_struct('q', concat(array(x),"
            "                            filter(acc.q, e -> e != x)),"
            "                'h', acc.h + 1L),"
            "   named_struct('q', slice(concat(array(x), acc.q), 1,"
            "                           capacity),"
            "                'h', acc.h)),"
            " acc -> acc.h)"
        ).alias("hits"),
    )
    out = folded.groupBy("capacity").agg(
        F.sum("refs").alias("n_refs"), F.sum("hits").alias("hits")
    )
    return out.select(
        F.col("capacity").cast("int").alias("capacity"),
        "n_refs",
        "hits",
        F.round(
            F.col("hits").cast("double") / F.col("n_refs").cast("double"),
            6,
        ).alias("hit_rate"),
    )


ORACLE_LRU_HITRATE = f"""
lru_seq AS (
  SELECT user_id,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn,
         CAST(props ->> '$.k' AS BIGINT) AS item
  FROM events
),
lru_len AS (SELECT user_id, CAST(max(rn) AS BIGINT) AS m
            FROM lru_seq GROUP BY 1),
lru_step AS (
  SELECT l.user_id, c.capacity, 0 AS rn,
         CAST([] AS BIGINT[]) AS q, CAST(0 AS BIGINT) AS h
  FROM lru_len l
  CROSS JOIN (SELECT unnest([{", ".join(str(k) for k in LRU_CAPACITIES)}])
                AS capacity) c
  UNION ALL
  SELECT s.user_id, s.capacity, s.rn + 1,
         CASE WHEN list_contains(s.q, e.item)
              THEN list_prepend(e.item,
                                list_filter(s.q, x -> x <> e.item))
              ELSE array_slice(list_prepend(e.item, s.q),
                               1, s.capacity) END,
         s.h + CASE WHEN list_contains(s.q, e.item) THEN 1 ELSE 0 END
  FROM lru_step s
  JOIN lru_seq e ON e.user_id = s.user_id AND e.rn = s.rn + 1
),
lru_fin AS (
  SELECT s.capacity, s.h, l.m
  FROM lru_step s JOIN lru_len l ON l.user_id = s.user_id
  WHERE s.rn = l.m
),
events_lru_hitrate AS (
  SELECT CAST(capacity AS INT) AS capacity,
         CAST(sum(m) AS BIGINT) AS n_refs,
         CAST(sum(h) AS BIGINT) AS hits,
         round(CAST(sum(h) AS DOUBLE) / sum(m), 6) AS hit_rate
  FROM lru_fin GROUP BY 1
)
"""


# ---------------------------------------------------------------------------
# histogram-based outlier score (round 8)
# ---------------------------------------------------------------------------

HBOS_TOP_K = 20


def hbos_outliers(events: DataFrame) -> DataFrame:
    """HBOS (Goldstein & Dengel 2012) over three bounded-grain event
    features — hour-of-day (24 bins), day-of-week (7), and the
    sign-safe value octave (<= ~48 bins, the `_cent_prefix` bucket
    law): score = sum_f -ln p_f(x), i.e. an event is anomalous when it
    sits in RARE bins of several independent histograms at once. This
    is the histogram sibling of the shipped outlier family (MAD =
    per-key deviation, kNN/density = geometry, DBSCAN noise =
    connectivity): HBOS is the one that needs NO pairwise structure at
    all, which is why it is the standard first-pass screen at
    data-lake scale.

    Determinism: every histogram count is an exact BIGINT, and the
    score collapses to 3 ln N - ln(n_h * n_d * n_v) — one ln of an
    exact integer per event, identical doubles cross-engine (no
    accumulated float sums). Top-{k} by (rounded score DESC,
    event_id) is fully tie-broken.

    Scale: three bounded-grain hash-aggs (24 + 7 + ~48 rows)
    broadcast back onto the fact scan — one pass, zero shuffles wider
    than the histograms; the top-k is a local-then-global limit.
    Output: event_id, user_id, hour, dow, voct, score.
    """
    c = F.round(F.col("value") * 100, 0).cast("bigint")
    voct = (
        F.when(c >= 0, F.floor(F.log2(c + 1)))
        .otherwise(-1 - F.floor(F.log2(-c)))
        .cast("bigint")
    )
    base = events.filter(F.col("value").isNotNull()).select(
        "event_id",
        "user_id",
        F.hour("ts").alias("hour"),
        F.dayofweek("ts").alias("dow"),
        voct.alias("voct"),
    )
    hh = base.groupBy("hour").agg(F.count("*").alias("n_h"))
    dd = base.groupBy("dow").agg(F.count("*").alias("n_d"))
    vv = base.groupBy("voct").agg(F.count("*").alias("n_v"))
    tot = base.agg(F.count("*").alias("n"))
    scored = (
        base.join(F.broadcast(hh), "hour")
        .join(F.broadcast(dd), "dow")
        .join(F.broadcast(vv), "voct")
        .crossJoin(F.broadcast(tot))
        .select(
            "event_id",
            "user_id",
            "hour",
            "dow",
            "voct",
            F.round(
                3 * F.log(F.col("n").cast("double"))
                - F.log(
                    (
                        F.col("n_h") * F.col("n_d") * F.col("n_v")
                    ).cast("double")
                ),
                6,
            ).alias("score"),
        )
    )
    return scored.orderBy(F.col("score").desc(), "event_id").limit(
        HBOS_TOP_K
    )


hbos_outliers.__doc__ = hbos_outliers.__doc__.format(k=HBOS_TOP_K)

ORACLE_HBOS = f"""
hb_base AS (
  SELECT event_id, user_id,
         hour(ts) AS hour, dayofweek(ts) + 1 AS dow,
         CASE WHEN CAST(round(value * 100, 0) AS BIGINT) >= 0
              THEN CAST(floor(log2(CAST(round(value * 100, 0)
                                        AS BIGINT) + 1)) AS BIGINT)
              ELSE CAST(-1 - floor(log2(-CAST(round(value * 100, 0)
                                              AS BIGINT))) AS BIGINT)
         END AS voct
  FROM events WHERE value IS NOT NULL
),
hb_h AS (SELECT hour, CAST(count(*) AS BIGINT) AS n_h
         FROM hb_base GROUP BY 1),
hb_d AS (SELECT dow, CAST(count(*) AS BIGINT) AS n_d
         FROM hb_base GROUP BY 1),
hb_v AS (SELECT voct, CAST(count(*) AS BIGINT) AS n_v
         FROM hb_base GROUP BY 1),
hb_n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM hb_base),
hb_scored AS (
  SELECT b.event_id, b.user_id, b.hour, b.dow, b.voct,
         round(3 * ln(CAST(n.n AS DOUBLE))
               - ln(CAST(h.n_h * d.n_d * v.n_v AS DOUBLE)), 6)
           AS score
  FROM hb_base b
  JOIN hb_h h USING (hour) JOIN hb_d d USING (dow)
  JOIN hb_v v USING (voct) CROSS JOIN hb_n n
),
events_hbos_outliers AS (
  SELECT event_id, user_id, hour, dow, voct, score
  FROM hb_scored
  ORDER BY score DESC, event_id LIMIT {HBOS_TOP_K}
)
"""


# ---------------------------------------------------------------------------
# Yuen's trimmed-mean two-sample test (round 8)
# ---------------------------------------------------------------------------

#: per-tail trim proportion — EXACTLY 1/5, applied as integer n DIV 5
#: so the trim count is engine-exact (no float multiply).
YUEN_TRIM_DEN = 5


def yuen_trimmed_test(events: DataFrame) -> DataFrame:
    """Yuen's (1974) two-sample test on 20%-trimmed means of purchase
    vs click values — the robust LOCATION test that completes the
    two-sample family: Mann-Whitney ranks everything (loses the
    metric), Mood keeps only above/below, Cliff's delta is an effect
    size; Yuen keeps the METRIC scale while discarding both 20% tails,
    so whales and zero-spikes cannot move it, and it remains a test
    about means (of the trimmed population) — the one reviewers ask
    for when t-test assumptions fail but "which group spends more" must
    stay in dollars.

    Exact order statistics on the cent grain via the octave-bucket
    prefix kernel (``_cent_prefix``, group_cols): per group, g = n DIV
    5, the winsorizing values L (rank g+1) and U (rank n-g), and the
    partial-tail sums make every trimmed/winsorized moment an exact
    BIGINT — sum of g smallest = prefix-sum below L plus
    (g - count-below-L) copies of L, symmetric above. Only the final
    t/df chain divides: trimmed mean mt = trimsum/h with h = n - 2g,
    winsorized variance s2w = (wsum2 - wsum^2/n)/(n-1), d = s2w (n-1)
    / (h (h-1)), t = (mt1-mt2)/sqrt(d1+d2), Welch-Satterthwaite df =
    (d1+d2)^2 / (d1^2/(h1-1) + d2^2/(h2-1)); |t| > 1.96 is the
    documented large-sample 5% convention (h ~ hundreds at sf0.01+).

    Scale: one value-grain hash-agg per group + the bounded-octave
    prefix kernel + two 1-row joins — zero global windows, zero pair
    joins. Output (1 row): n1, n2, g1, g2, h1, h2, tm1, tm2 (the
    trimmed means, converted back from the cent grain to the VALUE
    scale at the edge), t_stat, df, significant.
    """
    cg = events.filter(
        F.col("value").isNotNull()
        & F.col("event_type").isin("purchase", "click")
    ).select(
        F.when(F.col("event_type") == "purchase", F.lit("x"))
        .otherwise(F.lit("y"))
        .alias("grp"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("c"),
    )
    vg = cg.groupBy("grp", "c").agg(F.count("*").alias("cnt")).select(
        "grp",
        "c",
        "cnt",
        (F.col("c") * F.col("cnt")).alias("s"),
        (F.col("c") * F.col("c") * F.col("cnt")).alias("s2"),
    )
    pre = _cent_prefix(vg, ["cnt", "s", "s2"], group_cols=("grp",))
    pre2 = pre.select(
        "grp",
        "c",
        "_pre_cnt",
        "_pre_s",
        "_pre_s2",
        (F.col("_pre_cnt") + F.col("cnt")).alias("cum"),
        (F.col("_pre_s") + F.col("s")).alias("cs"),
        (F.col("_pre_s2") + F.col("s2")).alias("cs2"),
    )
    tots = (
        vg.groupBy("grp")
        .agg(
            F.sum("cnt").alias("n"),
            F.sum("s").alias("st"),
            F.sum("s2").alias("st2"),
        )
        .select("*", F.expr(f"n DIV {YUEN_TRIM_DEN}").alias("g"))
    )
    j = pre2.join(F.broadcast(tots), "grp")
    lu = j.groupBy("grp").agg(
        F.min(
            F.when(F.col("cum") >= F.col("g") + 1, F.col("c"))
        ).alias("lv"),
        F.min(
            F.when(F.col("cum") >= F.col("n") - F.col("g"), F.col("c"))
        ).alias("uv"),
    )
    lrow = pre2.join(
        F.broadcast(
            lu.select("grp", F.col("lv").alias("c"), "lv")
        ),
        ["grp", "c"],
    ).select(
        "grp",
        "lv",
        F.col("_pre_cnt").alias("lcnt"),
        F.col("_pre_s").alias("ls"),
        F.col("_pre_s2").alias("ls2"),
    )
    urow = pre2.join(
        F.broadcast(
            lu.select("grp", F.col("uv").alias("c"), "uv")
        ),
        ["grp", "c"],
    ).select(
        "grp",
        "uv",
        F.col("cum").alias("ucum"),
        F.col("cs").alias("ucs"),
        F.col("cs2").alias("ucs2"),
    )
    m = tots.join(lrow, "grp").join(urow, "grp")
    g, n = F.col("g"), F.col("n")
    lv, uv = F.col("lv"), F.col("uv")
    s_below = F.col("ls") + (g - F.col("lcnt")) * lv
    s2_below = F.col("ls2") + (g - F.col("lcnt")) * lv * lv
    cnt_above = n - F.col("ucum")
    s_above = F.col("st") - F.col("ucs") + (g - cnt_above) * uv
    s2_above = (
        F.col("st2") - F.col("ucs2") + (g - cnt_above) * uv * uv
    )
    h = n - 2 * g
    trim_sum = F.col("st") - s_below - s_above
    wsum = trim_sum + g * (lv + uv)
    wsum2 = F.col("st2") - s2_below - s2_above + g * (lv * lv + uv * uv)
    mt = trim_sum.cast("double") / h.cast("double")
    s2w = (
        wsum2.cast("double")
        - wsum.cast("double") * wsum.cast("double") / n.cast("double")
    ) / (n.cast("double") - 1)
    d = s2w * (n.cast("double") - 1) / (
        h.cast("double") * (h.cast("double") - 1)
    )
    per = m.select(
        "grp",
        n.alias("n"),
        g.alias("g"),
        h.alias("h"),
        mt.alias("mt"),
        d.alias("d"),
    )
    wide = per.groupBy().pivot("grp", ["x", "y"]).agg(
        F.first("n").alias("n"),
        F.first("g").alias("g"),
        F.first("h").alias("h"),
        F.first("mt").alias("mt"),
        F.first("d").alias("d"),
    )
    # degenerate-input guard (r8 ADVICE item 3): with one group absent
    # the pivot emits a single row with NULL columns for that side,
    # while the oracle's cross join of an empty branch emits zero rows
    # — drop the half-populated row so both engines agree on "no test".
    wide = wide.filter(
        F.col("x_n").isNotNull() & F.col("y_n").isNotNull()
    )
    dx, dy = F.col("x_d"), F.col("y_d")
    hx, hy = F.col("x_h").cast("double"), F.col("y_h").cast("double")
    t = (F.col("x_mt") - F.col("y_mt")) / F.sqrt(dx + dy)
    df = ((dx + dy) * (dx + dy)) / (
        dx * dx / (hx - 1) + dy * dy / (hy - 1)
    )
    return wide.select(
        F.col("x_n").alias("n1"),
        F.col("y_n").alias("n2"),
        F.col("x_g").alias("g1"),
        F.col("y_g").alias("g2"),
        F.col("x_h").alias("h1"),
        F.col("y_h").alias("h2"),
        F.round(F.col("x_mt") / 100, 6).alias("tm1"),
        F.round(F.col("y_mt") / 100, 6).alias("tm2"),
        F.round(t, 6).alias("t_stat"),
        F.round(df, 6).alias("df"),
        (F.abs(F.round(t, 6)) > 1.96).alias("significant"),
    )


ORACLE_YUEN = f"""
yu_cg AS (
  SELECT CASE WHEN event_type = 'purchase' THEN 'x' ELSE 'y' END AS grp,
         CAST(round(value * 100, 0) AS BIGINT) AS c
  FROM events
  WHERE value IS NOT NULL AND event_type IN ('purchase', 'click')
),
yu_vg AS (
  SELECT grp, c, CAST(count(*) AS BIGINT) AS cnt,
         CAST(c * count(*) AS BIGINT) AS s,
         CAST(c * c * count(*) AS BIGINT) AS s2
  FROM yu_cg GROUP BY 1, 2
),
yu_pre AS (
  SELECT grp, c,
         CAST(sum(cnt) OVER w AS BIGINT) AS cum,
         CAST(sum(s) OVER w AS BIGINT) AS cs,
         CAST(sum(s2) OVER w AS BIGINT) AS cs2,
         CAST(sum(cnt) OVER w - cnt AS BIGINT) AS pcnt,
         CAST(sum(s) OVER w - s AS BIGINT) AS ps,
         CAST(sum(s2) OVER w - s2 AS BIGINT) AS ps2
  FROM yu_vg
  WINDOW w AS (PARTITION BY grp ORDER BY c
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
yu_tot AS (
  SELECT grp, CAST(sum(cnt) AS BIGINT) AS n,
         CAST(sum(s) AS BIGINT) AS st, CAST(sum(s2) AS BIGINT) AS st2,
         CAST(sum(cnt) // {YUEN_TRIM_DEN} AS BIGINT) AS g
  FROM yu_vg GROUP BY 1
),
yu_lu AS (
  SELECT p.grp,
         min(CASE WHEN p.cum >= t.g + 1 THEN p.c END) AS lv,
         min(CASE WHEN p.cum >= t.n - t.g THEN p.c END) AS uv
  FROM yu_pre p JOIN yu_tot t USING (grp) GROUP BY 1
),
yu_l AS (
  SELECT p.grp, u.lv, p.pcnt AS lcnt, p.ps AS ls, p.ps2 AS ls2
  FROM yu_pre p JOIN yu_lu u ON u.grp = p.grp AND p.c = u.lv
),
yu_u AS (
  SELECT p.grp, u.uv, p.cum AS ucum, p.cs AS ucs, p.cs2 AS ucs2
  FROM yu_pre p JOIN yu_lu u ON u.grp = p.grp AND p.c = u.uv
),
yu_m AS (
  SELECT t.grp, t.n, t.g, t.n - 2 * t.g AS h,
         t.st - (l.ls + (t.g - l.lcnt) * l.lv)
              - (t.st - u.ucs + (t.g - (t.n - u.ucum)) * u.uv)
           AS trim_sum,
         t.st2 - (l.ls2 + (t.g - l.lcnt) * l.lv * l.lv)
               - (t.st2 - u.ucs2
                  + (t.g - (t.n - u.ucum)) * u.uv * u.uv)
           AS trim_sum2,
         l.lv, u.uv
  FROM yu_tot t JOIN yu_l l USING (grp) JOIN yu_u u USING (grp)
),
yu_d AS (
  SELECT grp, n, g, h,
         CAST(trim_sum AS DOUBLE) / h AS mt,
         ((CAST(trim_sum2 + g * (lv * lv + uv * uv) AS DOUBLE)
           - CAST(trim_sum + g * (lv + uv) AS DOUBLE)
             * CAST(trim_sum + g * (lv + uv) AS DOUBLE)
             / CAST(n AS DOUBLE))
          / (CAST(n AS DOUBLE) - 1))
         * (CAST(n AS DOUBLE) - 1)
         / (CAST(h AS DOUBLE) * (CAST(h AS DOUBLE) - 1)) AS d
  FROM yu_m
),
events_yuen AS (
  SELECT x.n AS n1, y.n AS n2, x.g AS g1, y.g AS g2,
         x.h AS h1, y.h AS h2,
         round(x.mt / 100, 6) AS tm1, round(y.mt / 100, 6) AS tm2,
         round((x.mt - y.mt) / sqrt(x.d + y.d), 6) AS t_stat,
         round((x.d + y.d) * (x.d + y.d)
               / (x.d * x.d / (CAST(x.h AS DOUBLE) - 1)
                  + y.d * y.d / (CAST(y.h AS DOUBLE) - 1)), 6) AS df,
         abs(round((x.mt - y.mt) / sqrt(x.d + y.d), 6)) > 1.96
           AS significant
  FROM (SELECT * FROM yu_d WHERE grp = 'x') x,
       (SELECT * FROM yu_d WHERE grp = 'y') y
)
"""


# ---------------------------------------------------------------------------
# Bass diffusion model fit (round 8)
# ---------------------------------------------------------------------------


def bass_model(orders: DataFrame) -> DataFrame:
    """Bass (1969) diffusion fit over the customer ADOPTION series
    (first order per customer, daily, calendar-gap-filled): the OLS
    discretization a_t = c0 + c1 N_{t-1} + c2 N_{t-1}^2, from which
    the market size M (positive root of c0 + c1 M + c2 M^2 = 0),
    innovation coefficient p = c0/M, imitation coefficient q = -c2 M,
    and the closed-form adoption-peak time ln(q/p)/(p+q) — the
    "when does growth saturate and how large is the market" readout a
    growth team fits on signup curves. On the fixture the recovered M
    lands within ~0.3% of the true adopter count.

    Protocol: adopters/day and cumulative N are exact BIGINTs; the 7
    normal-equation sums (sum N^k, sum a N^k) fold over the PACKED
    day-sorted array with a running-N accumulator — each term is
    CAST(bigint AS DOUBLE) then multiplied, added sequentially in day
    order in both engines (the record-days protocol; N^4 sums overflow
    BIGINT past ~30k customers, so the mirrored double fold IS the
    scale-correct form). Cramer's rule for the 3x3 solve is one
    mirrored double chain; M/p/q/peak guard on disc >= 0 and c2 != 0.

    Scale: one customer-grain min() agg, one day-grain agg, then a
    t-days-bounded packed fold (SCALE.md bounded-grain argument — the
    calendar does not grow with row count). Output (1 row): t_days,
    n_adopters, c0, c1, c2, m_hat, p_hat, q_hat, peak_t.
    """
    fo = orders.groupBy("o_custkey").agg(
        F.min(F.to_date("o_orderdate")).alias("day")
    )
    ad = fo.groupBy("day").agg(F.count("*").alias("a"))
    bounds = ad.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    cal = bounds.select(
        F.explode(F.expr("sequence(d0, d1)")).alias("day"), "d0"
    )
    daily = cal.join(ad, "day", "left").select(
        F.datediff("day", "d0").cast("bigint").alias("d"),
        F.coalesce("a", F.lit(0)).cast("bigint").alias("a"),
    )
    packed = daily.agg(
        F.sort_array(F.collect_list(F.struct("d", "a"))).alias("s"),
        F.count("*").alias("t"),
        F.sum("a").alias("n_adopters"),
    )

    def _fold(term: str) -> F.Column:
        """Sequential day-order fold of ``term`` (over fields x.a and
        the running cumulative np, both exact BIGINTs cast to double
        inside the term) — one accumulator per sum, no window."""
        return F.expr(
            "aggregate(s,"
            " named_struct('acc', cast(0.0 as double),"
            "              'np', cast(0 as bigint)),"
            f" (ac, x) -> named_struct('acc', ac.acc + ({term}),"
            "             'np', ac.np + x.a),"
            " ac -> ac.acc)"
        )

    nd = "cast(ac.np as double)"
    ad_ = "cast(x.a as double)"
    sums = packed.select(
        "t",
        "n_adopters",
        _fold(f"{nd}").alias("s1"),
        _fold(f"{nd} * {nd}").alias("s2"),
        _fold(f"{nd} * {nd} * {nd}").alias("s3"),
        _fold(f"{nd} * {nd} * {nd} * {nd}").alias("s4"),
        _fold(f"{ad_}").alias("sy"),
        _fold(f"{ad_} * {nd}").alias("s1y"),
        _fold(f"{ad_} * {nd} * {nd}").alias("s2y"),
    )
    t = F.col("t").cast("double")
    s1, s2, s3, s4 = (F.col(c) for c in ("s1", "s2", "s3", "s4"))
    sy, s1y, s2y = (F.col(c) for c in ("sy", "s1y", "s2y"))
    det = (
        t * (s2 * s4 - s3 * s3)
        - s1 * (s1 * s4 - s3 * s2)
        + s2 * (s1 * s3 - s2 * s2)
    )
    c0 = (
        sy * (s2 * s4 - s3 * s3)
        - s1 * (s1y * s4 - s3 * s2y)
        + s2 * (s1y * s3 - s2 * s2y)
    ) / det
    c1 = (
        t * (s1y * s4 - s3 * s2y)
        - sy * (s1 * s4 - s3 * s2)
        + s2 * (s1 * s2y - s1y * s2)
    ) / det
    c2 = (
        t * (s2 * s2y - s1y * s3)
        - s1 * (s1 * s2y - s1y * s2)
        + sy * (s1 * s3 - s2 * s2)
    ) / det
    coef = sums.select(
        "t", "n_adopters", c0.alias("c0"), c1.alias("c1"), c2.alias("c2")
    )
    disc = F.col("c1") * F.col("c1") - 4 * F.col("c2") * F.col("c0")
    ok = (disc >= 0) & (F.col("c2") != 0)
    m = F.when(
        ok,
        (-F.col("c1") - F.sqrt(disc)) / (2 * F.col("c2")),
    )
    p = F.col("c0") / m
    q = -F.col("c2") * m
    peak = F.when(
        (p > 0) & (q > 0), F.log(q / p) / (p + q)
    )
    return coef.select(
        F.col("t").alias("t_days"),
        "n_adopters",
        F.round("c0", 6).alias("c0"),
        F.round(F.col("c1"), 8).alias("c1"),
        F.round(F.col("c2"), 12).alias("c2"),
        F.round(m, 4).alias("m_hat"),
        F.round(p, 8).alias("p_hat"),
        F.round(q, 8).alias("q_hat"),
        F.round(peak, 4).alias("peak_t"),
    )


ORACLE_BASS = """
bs_fo AS (
  SELECT o_custkey, min(CAST(o_orderdate AS DATE)) AS day
  FROM orders GROUP BY 1
),
bs_ad AS (SELECT day, CAST(count(*) AS BIGINT) AS a
          FROM bs_fo GROUP BY 1),
bs_b AS (SELECT min(day) AS d0, max(day) AS d1 FROM bs_ad),
bs_cal AS (
  SELECT CAST(u.day AS DATE) AS day, b.d0
  FROM bs_b b, unnest(generate_series(CAST(b.d0 AS TIMESTAMP),
                                      CAST(b.d1 AS TIMESTAMP),
                                      INTERVAL 1 DAY)) AS u(day)
),
bs_daily AS (
  SELECT CAST(date_diff('day', c.d0, c.day) AS BIGINT) AS d,
         CAST(coalesce(a.a, 0) AS BIGINT) AS a
  FROM bs_cal c LEFT JOIN bs_ad a USING (day)
),
bs_np AS (
  SELECT d, a,
         CAST(sum(a) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED
                           PRECEDING AND CURRENT ROW) - a AS BIGINT)
           AS np
  FROM bs_daily
),
bs_pack AS (SELECT list({'a': a, 'np': np} ORDER BY d) AS s,
                   CAST(count(*) AS BIGINT) AS t,
                   CAST(sum(a) AS BIGINT) AS n_adopters
            FROM bs_np),
bs_sums AS (
  SELECT t, n_adopters,
   list_aggregate(list_transform(s,
     x -> CAST(x.np AS DOUBLE)), 'sum') AS s1,
   list_aggregate(list_transform(s,
     x -> CAST(x.np AS DOUBLE) * CAST(x.np AS DOUBLE)), 'sum') AS s2,
   list_aggregate(list_transform(s,
     x -> CAST(x.np AS DOUBLE) * CAST(x.np AS DOUBLE)
          * CAST(x.np AS DOUBLE)), 'sum') AS s3,
   list_aggregate(list_transform(s,
     x -> CAST(x.np AS DOUBLE) * CAST(x.np AS DOUBLE)
          * CAST(x.np AS DOUBLE) * CAST(x.np AS DOUBLE)), 'sum') AS s4,
   list_aggregate(list_transform(s,
     x -> CAST(x.a AS DOUBLE)), 'sum') AS sy,
   list_aggregate(list_transform(s,
     x -> CAST(x.a AS DOUBLE) * CAST(x.np AS DOUBLE)), 'sum') AS s1y,
   list_aggregate(list_transform(s,
     x -> CAST(x.a AS DOUBLE) * CAST(x.np AS DOUBLE)
          * CAST(x.np AS DOUBLE)), 'sum') AS s2y
  FROM bs_pack
),
bs_c AS (
  SELECT t, n_adopters,
    (sy * (s2 * s4 - s3 * s3) - s1 * (s1y * s4 - s3 * s2y)
       + s2 * (s1y * s3 - s2 * s2y))
      / (CAST(t AS DOUBLE) * (s2 * s4 - s3 * s3)
         - s1 * (s1 * s4 - s3 * s2)
         + s2 * (s1 * s3 - s2 * s2)) AS c0,
    (CAST(t AS DOUBLE) * (s1y * s4 - s3 * s2y)
       - sy * (s1 * s4 - s3 * s2)
       + s2 * (s1 * s2y - s1y * s2))
      / (CAST(t AS DOUBLE) * (s2 * s4 - s3 * s3)
         - s1 * (s1 * s4 - s3 * s2)
         + s2 * (s1 * s3 - s2 * s2)) AS c1,
    (CAST(t AS DOUBLE) * (s2 * s2y - s1y * s3)
       - s1 * (s1 * s2y - s1y * s2)
       + sy * (s1 * s3 - s2 * s2))
      / (CAST(t AS DOUBLE) * (s2 * s4 - s3 * s3)
         - s1 * (s1 * s4 - s3 * s2)
         + s2 * (s1 * s3 - s2 * s2)) AS c2
  FROM bs_sums
),
bs_m AS (
  SELECT t, n_adopters, c0, c1, c2,
         CASE WHEN c1 * c1 - 4 * c2 * c0 >= 0 AND c2 <> 0
              THEN (-c1 - sqrt(c1 * c1 - 4 * c2 * c0)) / (2 * c2)
         END AS m
  FROM bs_c
),
orders_bass_model AS (
  SELECT t AS t_days, n_adopters,
         round(c0, 6) AS c0, round(c1, 8) AS c1, round(c2, 12) AS c2,
         round(m, 4) AS m_hat,
         round(c0 / m, 8) AS p_hat,
         round(-c2 * m, 8) AS q_hat,
         round(CASE WHEN c0 / m > 0 AND -c2 * m > 0
                    THEN ln((-c2 * m) / (c0 / m))
                         / (c0 / m + (-c2 * m)) END, 4) AS peak_t
  FROM bs_m
)
"""


# ---------------------------------------------------------------------------
# negative-binomial method-of-moments fit (round 8)
# ---------------------------------------------------------------------------


def nb_fit(events: DataFrame) -> DataFrame:
    """Negative-binomial method-of-moments fit of the per-user
    purchase-count distribution — the FIT companion to the
    overdispersion TEST (``events_overdispersion``): once the VMR says
    counts are overdispersed, the modeling question is "which NB", and
    the MoM answer is closed-form: r = m^2/(v - m), p = m/v (NULL when
    v <= m — under/equi-dispersed data has no NB fit, exactly the case
    the test flags). r is the heterogeneity readout a growth model
    (NBD, gamma-Poisson mixtures) consumes directly.

    Counts and both raw moments are exact BIGINTs from one user-grain
    hash-agg (users with zero purchases INCLUDED via the left join —
    dropping them biases m upward, the classic NBD mistake); mean,
    variance (n-1 denominator), VMR, r, p are one mirrored double
    chain rounded 6 dp. Output (1 row): n_users, mean_purchases,
    var_purchases, vmr, nb_r, nb_p.
    """
    users = events.select("user_id").distinct()
    pc = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count("*").alias("k"))
    )
    counts = users.join(pc, "user_id", "left").select(
        F.coalesce("k", F.lit(0)).cast("bigint").alias("k")
    )
    m = counts.agg(
        F.count("*").alias("n"),
        F.sum("k").alias("s"),
        F.sum(F.col("k") * F.col("k")).alias("s2"),
    )
    n = F.col("n").cast("double")
    mean = F.col("s").cast("double") / n
    var = (
        F.col("s2").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double") / n
    ) / (n - 1)
    r = F.when(var > mean, mean * mean / (var - mean))
    p = F.when(var > mean, mean / var)
    return m.select(
        F.col("n").alias("n_users"),
        F.round(mean, 6).alias("mean_purchases"),
        F.round(var, 6).alias("var_purchases"),
        F.round(var / mean, 6).alias("vmr"),
        F.round(r, 6).alias("nb_r"),
        F.round(p, 6).alias("nb_p"),
    )


ORACLE_NB_FIT = """
nbf_u AS (SELECT DISTINCT user_id FROM events),
nbf_p AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS k
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
nbf_c AS (
  SELECT CAST(coalesce(p.k, 0) AS BIGINT) AS k
  FROM nbf_u u LEFT JOIN nbf_p p USING (user_id)
),
nbf_m AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(k) AS BIGINT) AS s,
         CAST(sum(k * k) AS BIGINT) AS s2
  FROM nbf_c
),
events_nb_fit AS (
  SELECT n AS n_users,
         round(CAST(s AS DOUBLE) / n, 6) AS mean_purchases,
         round((CAST(s2 AS DOUBLE)
                - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                  / CAST(n AS DOUBLE))
               / (CAST(n AS DOUBLE) - 1), 6) AS var_purchases,
         round(((CAST(s2 AS DOUBLE)
                 - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                   / CAST(n AS DOUBLE))
                / (CAST(n AS DOUBLE) - 1))
               / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS vmr,
         round(CASE WHEN (CAST(s2 AS DOUBLE)
                 - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                   / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1)
                 > CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
               THEN (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                    / ((CAST(s2 AS DOUBLE)
                        - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                          / CAST(n AS DOUBLE))
                       / (CAST(n AS DOUBLE) - 1)
                       - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
               END, 6) AS nb_r,
         round(CASE WHEN (CAST(s2 AS DOUBLE)
                 - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                   / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1)
                 > CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
               THEN (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                    / ((CAST(s2 AS DOUBLE)
                        - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                          / CAST(n AS DOUBLE))
                       / (CAST(n AS DOUBLE) - 1))
               END, 6) AS nb_p
  FROM nbf_m
)
"""


# ---------------------------------------------------------------------------
# EWMA control chart (round 8)
# ---------------------------------------------------------------------------

EWMA_CHART_LAMBDA = 0.2
EWMA_CHART_L = 3.0


def ewma_chart(events: DataFrame) -> DataFrame:
    """EWMA control chart over the gap-filled daily purchase-revenue
    series (Roberts 1959 / the SPC standard for SMALL mean shifts —
    the p-chart catches proportion jumps, Shewhart-style MAD/z flags
    single spikes; the EWMA chart is the one that fires on a slow
    drift no single day trips): z_t = 0.2 x_t + 0.8 z_{t-1} seeded at
    the series mean, with time-varying limits mu ± 3 sigma
    sqrt(lam/(2-lam) (1-(1-lam)^{2t})).

    Cross-engine protocol: x_t are exact integers (floor-scaled cents
    sums; zero-revenue days are real observations via the calendar
    spine), mu/sigma come from exact moment sums, and BOTH recursions
    — the EWMA itself and the (1-lam)^{2t} power (carried as w_t =
    0.64 w_{t-1}, never pow(), whose last-ulp behavior differs across
    libm implementations) — replay as the same literal multiply-add
    chain: a packed day-sorted array fold here, a depth-T recursive
    CTE in the oracle.

    Scale: one day-grain hash-agg + a calendar-bounded fold (the
    periodogram/Bass argument). Output per day: d, x, z, ucl, lcl,
    out_of_control.
    """
    pd_ = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(
                F.expr(
                    f"CAST(floor(value * {AR2_VAL_SCALE}) AS BIGINT)"
                )
            ).alias("x")
        )
    )
    bounds = pd_.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    cal = bounds.select(
        F.explode(F.expr("sequence(d0, d1)")).alias("day"), "d0"
    )
    daily = cal.join(pd_, "day", "left").select(
        F.datediff("day", "d0").cast("bigint").alias("d"),
        F.coalesce("x", F.lit(0)).cast("bigint").alias("x"),
    )
    packed = daily.agg(
        F.sort_array(F.collect_list(F.struct("d", "x"))).alias("s"),
        F.count("*").alias("t"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sx2"),
    )
    tn = F.col("t").cast("double")
    mu = F.col("sx").cast("double") / tn
    sig = F.sqrt(
        (
            F.col("sx2").cast("double")
            - F.col("sx").cast("double")
            * F.col("sx").cast("double")
            / tn
        )
        / (tn - 1)
    )
    lam, om = EWMA_CHART_LAMBDA, 1 - EWMA_CHART_LAMBDA
    om2 = om * om
    base = packed.select(
        "s", mu.alias("mu"), sig.alias("sig")
    )
    rows = base.select(
        "mu",
        "sig",
        F.explode(
            F.expr(
                "aggregate(s,"
                " named_struct('z', mu, 'w', cast(1.0 as double),"
                "  'arr', cast(array() as"
                "   array<struct<d:bigint,x:bigint,z:double,w:double>>)),"
                f" (acc, e) -> named_struct("
                f"  'z', {lam}D * e.x + {om}D * acc.z,"
                f"  'w', acc.w * {om2}D,"
                "   'arr', concat(acc.arr, array(named_struct("
                "    'd', e.d, 'x', e.x,"
                f"   'z', {lam}D * e.x + {om}D * acc.z,"
                f"   'w', acc.w * {om2}D)))),"
                " acc -> acc.arr)"
            )
        ).alias("r"),
    )
    half = (
        F.lit(EWMA_CHART_L)
        * F.col("sig")
        * F.sqrt(
            F.lit(lam / (2 - lam)) * (F.lit(1.0) - F.col("r.w"))
        )
    )
    z6 = F.round("r.z", 6)
    ucl = F.round(F.col("mu") + half, 6)
    lcl = F.round(F.col("mu") - half, 6)
    return rows.select(
        F.col("r.d").alias("d"),
        F.col("r.x").alias("x"),
        z6.alias("z"),
        ucl.alias("ucl"),
        lcl.alias("lcl"),
        ((z6 > ucl) | (z6 < lcl)).alias("out_of_control"),
    )


ORACLE_EWMA_CHART = f"""
ewc_d AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(sum(CAST(floor(value * {AR2_VAL_SCALE}) AS BIGINT))
              AS BIGINT) AS x
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
ewc_b AS (SELECT min(day) AS d0, max(day) AS d1 FROM ewc_d),
ewc_cal AS (
  SELECT CAST(u.day AS DATE) AS day, b.d0
  FROM ewc_b b, unnest(generate_series(CAST(b.d0 AS TIMESTAMP),
                                       CAST(b.d1 AS TIMESTAMP),
                                       INTERVAL 1 DAY)) AS u(day)
),
ewc_daily AS (
  SELECT CAST(date_diff('day', c.d0, c.day) AS BIGINT) AS d,
         CAST(coalesce(p.x, 0) AS BIGINT) AS x
  FROM ewc_cal c LEFT JOIN ewc_d p USING (day)
),
ewc_m AS (
  SELECT CAST(count(*) AS BIGINT) AS t, CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(x * x) AS BIGINT) AS sx2
  FROM ewc_daily
),
ewc_mu AS (
  SELECT CAST(sx AS DOUBLE) / t AS mu,
         sqrt((CAST(sx2 AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                 / CAST(t AS DOUBLE))
              / (CAST(t AS DOUBLE) - 1)) AS sig
  FROM ewc_m
),
ewc_rec AS (
  SELECT CAST(-1 AS BIGINT) AS d, CAST(0 AS BIGINT) AS x,
         mu AS z, CAST(1.0 AS DOUBLE) AS w
  FROM ewc_mu
  UNION ALL
  SELECT e.d, e.x,
         CAST({EWMA_CHART_LAMBDA} AS DOUBLE) * e.x
           + CAST({1 - EWMA_CHART_LAMBDA} AS DOUBLE) * r.z,
         r.w * CAST({(1 - EWMA_CHART_LAMBDA) ** 2} AS DOUBLE)
  FROM ewc_rec r JOIN ewc_daily e ON e.d = r.d + 1
),
events_ewma_chart AS (
  SELECT r.d, r.x, round(r.z, 6) AS z,
         round(m.mu + {EWMA_CHART_L} * m.sig
               * sqrt({EWMA_CHART_LAMBDA / (2 - EWMA_CHART_LAMBDA)}
                      * (CAST(1.0 AS DOUBLE) - r.w)), 6) AS ucl,
         round(m.mu - {EWMA_CHART_L} * m.sig
               * sqrt({EWMA_CHART_LAMBDA / (2 - EWMA_CHART_LAMBDA)}
                      * (CAST(1.0 AS DOUBLE) - r.w)), 6) AS lcl,
         round(r.z, 6) > round(m.mu + {EWMA_CHART_L} * m.sig
               * sqrt({EWMA_CHART_LAMBDA / (2 - EWMA_CHART_LAMBDA)}
                      * (CAST(1.0 AS DOUBLE) - r.w)), 6)
         OR round(r.z, 6) < round(m.mu - {EWMA_CHART_L} * m.sig
               * sqrt({EWMA_CHART_LAMBDA / (2 - EWMA_CHART_LAMBDA)}
                      * (CAST(1.0 AS DOUBLE) - r.w)), 6)
           AS out_of_control
  FROM ewc_rec r CROSS JOIN ewc_mu m
  WHERE r.d >= 0
)
"""


# ---------------------------------------------------------------------------
# seasonal Mann-Kendall (Hirsch-Slack) trend test (round 8)
# ---------------------------------------------------------------------------


def seasonal_mann_kendall(events: DataFrame) -> DataFrame:
    """Hirsch-Slack seasonal Mann-Kendall over the daily revenue
    series with day-of-week seasons: the trend statistic S and its
    tie-corrected variance are computed WITHIN each weekday's
    sub-series and summed — so a strong weekly cycle (which inflates
    plain MK's variance and can mask or fake a trend) never enters the
    comparison; only same-weekday pairs are ordered. This is the
    seasonal leg of the trend ladder (plain MK pairs + Sen slope in
    ``events_robust_trend``, record counts, turning points).

    S_s = sum sign(v_j - v_i) over same-season day pairs (i earlier) —
    exact integers from one within-season pair join (day-grain
    quadratic per season: calendar-bounded, ~((T/7) choose 2) x 7
    pairs, never corpus-sized); var_s = [n(n-1)(2n+5) -
    sum t(t-1)(2t+5)]/18 with per-(season, value) tie counts t. The
    only doubles are the final z = (S -/+ 1)/sqrt(V) continuity
    chain, rounded 6 dp. Output (1 row): n_days, n_seasons, s_total,
    var_x18 (the exact 18*variance integer), z, trend.
    """
    daily = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(
                F.expr(
                    f"CAST(floor(value * {AR2_VAL_SCALE}) AS BIGINT)"
                )
            ).alias("v")
        )
        .select("day", F.dayofweek("day").alias("season"), "v")
    )
    a = daily.select(
        "season", F.col("day").alias("di"), F.col("v").alias("vi")
    )
    b = daily.select(
        "season", F.col("day").alias("dj"), F.col("v").alias("vj")
    )
    pairs = a.join(b, "season").filter(F.col("di") < F.col("dj"))
    s_tot = pairs.agg(
        (
            F.sum(F.when(F.col("vj") > F.col("vi"), 1).otherwise(0))
            - F.sum(F.when(F.col("vj") < F.col("vi"), 1).otherwise(0))
        ).alias("s"),
    )
    n_per = daily.groupBy("season").agg(F.count("*").alias("n"))
    ties = daily.groupBy("season", "v").agg(F.count("*").alias("tt"))
    var18 = (
        n_per.agg(
            F.sum(
                F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
            ).alias("a")
        )
        .crossJoin(
            F.broadcast(
                ties.agg(
                    F.sum(
                        F.col("tt")
                        * (F.col("tt") - 1)
                        * (2 * F.col("tt") + 5)
                    ).alias("b"),
                )
            )
        )
        .select((F.col("a") - F.col("b")).alias("v18"))
    )
    meta = daily.agg(
        F.count("*").alias("n_days"),
        F.countDistinct("season").alias("n_seasons"),
    )
    m = s_tot.crossJoin(F.broadcast(var18)).crossJoin(
        F.broadcast(meta)
    )
    s = F.col("s")
    vd = F.col("v18").cast("double") / 18
    z = (
        F.when(s > 0, (s - 1).cast("double") / F.sqrt(vd))
        .when(s < 0, (s + 1).cast("double") / F.sqrt(vd))
        .otherwise(F.lit(0.0))
    )
    z6 = F.round(z, 6)
    return m.select(
        "n_days",
        "n_seasons",
        s.alias("s_total"),
        F.col("v18").alias("var_x18"),
        z6.alias("z"),
        F.when(z6 > 1.96, F.lit("increasing"))
        .when(z6 < -1.96, F.lit("decreasing"))
        .otherwise(F.lit("none"))
        .alias("trend"),
    )


ORACLE_SEASONAL_MK = f"""
smk_d AS (
  SELECT day, dayofweek(day) + 1 AS season, v FROM (
    SELECT CAST(ts AS DATE) AS day,
           CAST(sum(CAST(floor(value * {AR2_VAL_SCALE}) AS BIGINT))
                AS BIGINT) AS v
    FROM events WHERE event_type = 'purchase' GROUP BY 1
  )
),
smk_s AS (
  SELECT CAST(sum(CASE WHEN b.v > a.v THEN 1 ELSE 0 END)
              - sum(CASE WHEN b.v < a.v THEN 1 ELSE 0 END)
              AS BIGINT) AS s
  FROM smk_d a JOIN smk_d b
    ON a.season = b.season AND a.day < b.day
),
smk_v AS (
  SELECT CAST((SELECT sum(n * (n - 1) * (2 * n + 5)) FROM (
                 SELECT CAST(count(*) AS BIGINT) AS n
                 FROM smk_d GROUP BY season))
              - (SELECT sum(tt * (tt - 1) * (2 * tt + 5)) FROM (
                   SELECT CAST(count(*) AS BIGINT) AS tt
                   FROM smk_d GROUP BY season, v))
              AS BIGINT) AS v18
),
smk_meta AS (
  SELECT CAST(count(*) AS BIGINT) AS n_days,
         CAST(count(DISTINCT season) AS BIGINT) AS n_seasons
  FROM smk_d
),
events_mk_seasonal AS (
  SELECT m.n_days, m.n_seasons, s.s AS s_total, v.v18 AS var_x18,
         round(CASE WHEN s.s > 0
                    THEN (s.s - 1) / sqrt(CAST(v.v18 AS DOUBLE) / 18)
                    WHEN s.s < 0
                    THEN (s.s + 1) / sqrt(CAST(v.v18 AS DOUBLE) / 18)
                    ELSE CAST(0.0 AS DOUBLE) END, 6) AS z,
         CASE WHEN round(CASE WHEN s.s > 0
                    THEN (s.s - 1) / sqrt(CAST(v.v18 AS DOUBLE) / 18)
                    WHEN s.s < 0
                    THEN (s.s + 1) / sqrt(CAST(v.v18 AS DOUBLE) / 18)
                    ELSE CAST(0.0 AS DOUBLE) END, 6) > 1.96
              THEN 'increasing'
              WHEN round(CASE WHEN s.s > 0
                    THEN (s.s - 1) / sqrt(CAST(v.v18 AS DOUBLE) / 18)
                    WHEN s.s < 0
                    THEN (s.s + 1) / sqrt(CAST(v.v18 AS DOUBLE) / 18)
                    ELSE CAST(0.0 AS DOUBLE) END, 6) < -1.96
              THEN 'decreasing' ELSE 'none' END AS trend
  FROM smk_s s CROSS JOIN smk_v v CROSS JOIN smk_meta m
)
"""


# ---------------------------------------------------------------------------
# Wilson score confidence intervals (round 8)
# ---------------------------------------------------------------------------

WILSON_Z = 1.96


def wilson_ci(events: DataFrame) -> DataFrame:
    """Wilson 95% score interval for each event type's user-reach
    proportion (share of users with >= 1 event of the type) — the
    binomial CI that behaves at the extremes where the Wald interval
    collapses (p near 0/1, small k), which is exactly where reach
    metrics live; the companion of the normal-approx conversion z-test
    and the median CI in the inference family.

    n (users) and k (reached users) are exact BIGINTs from one
    user-grain distinct + one type-grain agg; the Wilson chain
    (center (p + z^2/2n)/(1 + z^2/n), halfwidth z sqrt(p(1-p)/n +
    z^2/4n^2)/(1 + z^2/n)) is one mirrored double expression per
    type row, rounded 6 dp. Output per type: event_type, n_users,
    k_users, p_hat, wilson_lo, wilson_hi.
    """
    nu = events.agg(F.countDistinct("user_id").alias("n"))
    k = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("k")
    )
    z = WILSON_Z
    j = k.crossJoin(F.broadcast(nu))
    nd = F.col("n").cast("double")
    p = F.col("k").cast("double") / nd
    denom = 1 + F.lit(z * z) / nd
    center = (p + F.lit(z * z) / (2 * nd)) / denom
    half = (
        F.lit(z)
        * F.sqrt(
            p * (1 - p) / nd
            + F.lit(z * z) / (4 * nd * nd)
        )
        / denom
    )
    return j.select(
        "event_type",
        F.col("n").alias("n_users"),
        F.col("k").alias("k_users"),
        F.round(p, 6).alias("p_hat"),
        F.round(center - half, 6).alias("wilson_lo"),
        F.round(center + half, 6).alias("wilson_hi"),
    )


ORACLE_WILSON = f"""
wci_n AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n
          FROM events),
wci_k AS (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS k
  FROM events GROUP BY 1
),
events_wilson_ci AS (
  SELECT k.event_type, n.n AS n_users, k.k AS k_users,
         round(CAST(k.k AS DOUBLE) / n.n, 6) AS p_hat,
         round((CAST(k.k AS DOUBLE) / n.n
                + {WILSON_Z * WILSON_Z} / (2 * CAST(n.n AS DOUBLE)))
               / (1 + {WILSON_Z * WILSON_Z} / CAST(n.n AS DOUBLE))
               - {WILSON_Z}
                 * sqrt(CAST(k.k AS DOUBLE) / n.n
                        * (1 - CAST(k.k AS DOUBLE) / n.n)
                        / CAST(n.n AS DOUBLE)
                        + {WILSON_Z * WILSON_Z}
                          / (4 * CAST(n.n AS DOUBLE)
                             * CAST(n.n AS DOUBLE)))
                 / (1 + {WILSON_Z * WILSON_Z} / CAST(n.n AS DOUBLE)),
               6) AS wilson_lo,
         round((CAST(k.k AS DOUBLE) / n.n
                + {WILSON_Z * WILSON_Z} / (2 * CAST(n.n AS DOUBLE)))
               / (1 + {WILSON_Z * WILSON_Z} / CAST(n.n AS DOUBLE))
               + {WILSON_Z}
                 * sqrt(CAST(k.k AS DOUBLE) / n.n
                        * (1 - CAST(k.k AS DOUBLE) / n.n)
                        / CAST(n.n AS DOUBLE)
                        + {WILSON_Z * WILSON_Z}
                          / (4 * CAST(n.n AS DOUBLE)
                             * CAST(n.n AS DOUBLE)))
                 / (1 + {WILSON_Z * WILSON_Z} / CAST(n.n AS DOUBLE)),
               6) AS wilson_hi
  FROM wci_k k CROSS JOIN wci_n n
)
"""


# ---------------------------------------------------------------------------
# gamma method-of-moments fit per order priority (round 8)
# ---------------------------------------------------------------------------


def gamma_fit(orders: DataFrame) -> DataFrame:
    """Gamma method-of-moments fit of order totals per priority class
    — the positive-continuous member of the distribution-fitting shelf
    (Weibull for lifetimes, Gumbel for extremes, NB for counts): shape
    k = m^2/v, scale theta = v/m, closed-form from two exact moments.
    Basket/order totals are the canonical gamma-shaped metric, and
    (k, theta) feed straight into Erlang/newsvendor-style downstream
    models; k < 1 vs k > 1 distinguishes hyper-exponential from
    bell-shaped spend in one number.

    Totals quantize to exact cents (floor, BIGINT) so both raw moments
    are exact integer sums at any partitioning; mean/variance convert
    back to the price scale at the edge (/100, /100^2) in one mirrored
    double chain, rounded 6 dp. NULL fit when a class has < 2 orders
    or zero variance. One priority-grain hash-agg; 5-row output:
    priority, n_orders, mean_total, var_total, gamma_shape,
    gamma_scale.
    """
    c = F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)")
    m = orders.groupBy(
        F.col("o_orderpriority").alias("priority")
    ).agg(
        F.count("*").alias("n"),
        F.sum(c).alias("s"),
        F.sum(c * c).alias("s2"),
    )
    nd = F.col("n").cast("double")
    mean_c = F.col("s").cast("double") / nd
    var_c = (
        F.col("s2").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double") / nd
    ) / (nd - 1)
    mean_p = mean_c / 100
    var_p = var_c / 10000
    ok = (F.col("n") > 1) & (var_c > 0)
    return m.select(
        "priority",
        F.col("n").alias("n_orders"),
        F.round(mean_p, 6).alias("mean_total"),
        F.round(var_p, 6).alias("var_total"),
        F.round(
            F.when(ok, mean_p * mean_p / var_p), 6
        ).alias("gamma_shape"),
        F.round(F.when(ok, var_p / mean_p), 6).alias("gamma_scale"),
    )


ORACLE_GAMMA_FIT = """
gmf AS (
  SELECT o_orderpriority AS priority,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
              AS BIGINT) AS s,
         CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)
                  * CAST(floor(o_totalprice * 100) AS BIGINT))
              AS BIGINT) AS s2
  FROM orders GROUP BY 1
),
orders_gamma_fit AS (
  SELECT priority, n AS n_orders,
         round(CAST(s AS DOUBLE) / n / 100, 6) AS mean_total,
         round((CAST(s2 AS DOUBLE)
                - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                  / CAST(n AS DOUBLE))
               / (CAST(n AS DOUBLE) - 1) / 10000, 6) AS var_total,
         round(CASE WHEN n > 1 AND (CAST(s2 AS DOUBLE)
                - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                  / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1) > 0
               THEN (CAST(s AS DOUBLE) / n / 100)
                    * (CAST(s AS DOUBLE) / n / 100)
                    / ((CAST(s2 AS DOUBLE)
                        - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                          / CAST(n AS DOUBLE))
                       / (CAST(n AS DOUBLE) - 1) / 10000)
               END, 6) AS gamma_shape,
         round(CASE WHEN n > 1 AND (CAST(s2 AS DOUBLE)
                - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                  / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1) > 0
               THEN ((CAST(s2 AS DOUBLE)
                      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                        / CAST(n AS DOUBLE))
                     / (CAST(n AS DOUBLE) - 1) / 10000)
                    / (CAST(s AS DOUBLE) / n / 100)
               END, 6) AS gamma_scale
  FROM gmf
)
"""
