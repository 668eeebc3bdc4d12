"""[EXT] Calendar-grain aggregates: rollups, cohorts, gapfill, OHLC, TWAP, concurrency, retention, decomposition.

Split from the monolithic ``operators/temporal.py`` (r8 verdict task 2); see the package ``__init__`` for provenance. All docstring citations to the reference (F.py) are preserved on the operators themselves.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from big_data_instacart_market_basket_analysis_spark.operators import (
    ranking as _rank,
)



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

