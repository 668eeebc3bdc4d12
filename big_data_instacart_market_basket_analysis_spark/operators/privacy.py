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


# ---------------------------------------------------------------------------
# differentially-private noisy counts (deterministic inverse-CDF noise)
# ---------------------------------------------------------------------------

DP_EPSILON = 0.5


def dp_noisy_counts(
    events: DataFrame,
    eps: float = DP_EPSILON,
    insecure_deterministic_noise: bool = False,
) -> DataFrame:
    """Laplace-mechanism counts per event_type: count + Lap(1/eps)
    noise, the standard (eps)-DP release for a count query with
    sensitivity 1.

    REQUIRES ``insecure_deterministic_noise=True`` (same explicit gate
    as the multimodal ``fake=True`` codec): the noise here is derived
    from md5 of the released group key and ``n_true`` rides along, so
    this release carries ZERO differential privacy — it exists to make
    the mechanism's arithmetic oracle-replayable. A production release
    draws u from a secure RNG, drops n_true, and must not pass this
    flag's deterministic path.

    The noise draw is the inverse-CDF transform of a DETERMINISTIC
    md5-dyadic uniform (same trick as the samplers): x = -b *
    sign(u-1/2) * ln(1 - 2|u-1/2|). That keeps the release
    oracle-replayable — the differential harness checks the exact
    noisy values — while the production swap is one line (draw u from
    a secure RNG instead of the key hash; everything else identical).
    ``n_true`` is emitted for the harness only; a real DP release
    drops it and this plan's privacy guarantee is the textbook one
    only with secret randomness.

    Scale: one count-agg; noise is a map expression on the
    |event_type|-sized aggregate. Output: event_type, n_true, scale_b,
    n_noisy.
    """
    if not insecure_deterministic_noise:
        raise NotImplementedError(
            "dp_noisy_counts' md5-derived noise is NOT private; pass "
            "insecure_deterministic_noise=True to run the "
            "oracle-replayable demo path (production needs a secure "
            "RNG and must drop n_true)"
        )
    b = 1.0 / eps
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("dp:"), F.col("event_type"))), 1, 13
            ),
            16,
            10,
        ).cast("bigint")
        + F.lit(1)
    ).cast("double") / F.lit(float(1 << 52))
    noise = (
        F.lit(-b)
        * F.signum(u - F.lit(0.5))
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u - F.lit(0.5)))
    )
    return (
        events.groupBy("event_type")
        .agg(F.count("*").alias("n_true"))
        .select(
            "event_type",
            "n_true",
            F.lit(b).alias("scale_b"),
            F.round(F.col("n_true") + noise, 4).alias("n_noisy"),
        )
    )


def oracle_dp_noisy_counts(eps: float = DP_EPSILON) -> str:
    b = 1.0 / eps
    return f"""
dp_u AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_true,
         (CAST(('0x' || substr(md5('dp:' || event_type), 1, 13))
               AS BIGINT) + 1) / {float(1 << 52)!r} AS u
  FROM events GROUP BY 1
),
dp_noisy_counts AS (
  SELECT event_type, n_true,
         CAST({b!r} AS DOUBLE) AS scale_b,
         round(n_true + (-{b!r}) * sign(u - 0.5)
               * ln(1.0 - 2.0 * abs(u - 0.5)), 4) AS n_noisy
  FROM dp_u
)
"""


# ---------------------------------------------------------------------------
# erasure-impact audit (right-to-be-forgotten propagation)
# ---------------------------------------------------------------------------

ERASE_MOD = 97
ERASE_REM = 3


def erasure_audit(
    events: DataFrame, orders: DataFrame, customer: DataFrame
) -> DataFrame:
    """Right-to-be-forgotten impact audit: for a deletion cohort (the
    deterministic pseudo-request set ``user_id % ERASE_MOD ==
    ERASE_REM``), count the rows each table would lose — the scoping
    query every GDPR/CCPA erasure pipeline runs before issuing
    deletes, and the audit trail it keeps after. Completes the
    privacy family: pseudonymize (minimize), k-anonymity (assess),
    DP (release), erasure (delete).

    One filtered count per table (the cohort predicate is a pure
    pushdown filter); the per-table pieces union into the report.
    Output: table_name, n_subjects, n_rows.
    """
    cohort = F.col("uid") % ERASE_MOD == ERASE_REM
    parts = [
        events.select(F.col("user_id").alias("uid"))
        .filter(cohort)
        .agg(
            F.lit("events").alias("table_name"),
            F.countDistinct("uid").alias("n_subjects"),
            F.count("*").alias("n_rows"),
        ),
        orders.select(F.col("o_custkey").alias("uid"))
        .filter(cohort)
        .agg(
            F.lit("orders").alias("table_name"),
            F.countDistinct("uid").alias("n_subjects"),
            F.count("*").alias("n_rows"),
        ),
        customer.select(F.col("c_custkey").alias("uid"))
        .filter(cohort)
        .agg(
            F.lit("customer").alias("table_name"),
            F.countDistinct("uid").alias("n_subjects"),
            F.count("*").alias("n_rows"),
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


ORACLE_ERASURE_AUDIT = f"""
erasure_audit AS (
  SELECT 'events' AS table_name,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_subjects,
         CAST(count(*) AS BIGINT) AS n_rows
  FROM events WHERE user_id % {ERASE_MOD} = {ERASE_REM}
  UNION ALL
  SELECT 'orders', CAST(count(DISTINCT o_custkey) AS BIGINT),
         CAST(count(*) AS BIGINT)
  FROM orders WHERE o_custkey % {ERASE_MOD} = {ERASE_REM}
  UNION ALL
  SELECT 'customer', CAST(count(DISTINCT c_custkey) AS BIGINT),
         CAST(count(*) AS BIGINT)
  FROM customer WHERE c_custkey % {ERASE_MOD} = {ERASE_REM}
)
"""


# ---------------------------------------------------------------------------
# l-diversity audit (sensitive-attribute diversity inside QI groups)
# ---------------------------------------------------------------------------

L_DIVERSITY = 3


def l_diversity_audit(
    events: DataFrame, l_min: int = L_DIVERSITY
) -> DataFrame:
    """l-diversity (Machanavajjhala et al. 2007) — the audit
    k-anonymity alone cannot provide: a size-k group whose rows all
    share one sensitive value still leaks it. Quasi-identifiers here
    are the published (hour band, value band) grid; the sensitive
    attribute is event_type. Per QI group: distinct l-diversity
    (distinct sensitive values >= l) and entropy l-diversity
    (entropy >= ln l — robust to one value dominating).

    Entropy folds in one pass via H = ln(n) - (sum c*ln c)/n over the
    per-(QI, sensitive) counts: two stacked hash-aggs, both bounded by
    the generalization grid x sensitive domain, never the data.
    Float enters only in ln (fold-order absorbed at round 4).
    """
    qi = events.select(
        (
            F.floor(F.hour("ts") / HOUR_BAND_WIDTH) * HOUR_BAND_WIDTH
        ).alias("hour_band"),
        (
            F.floor(F.col("value") / VALUE_BAND_WIDTH) * VALUE_BAND_WIDTH
        ).alias("value_band"),
        F.col("event_type").alias("sensitive"),
    )
    per_sv = qi.groupBy("hour_band", "value_band", "sensitive").agg(
        F.count("*").alias("c")
    )
    h = F.log(F.sum("c")) - F.sum(F.col("c") * F.log("c")) / F.sum("c")
    return (
        per_sv.groupBy("hour_band", "value_band")
        .agg(
            F.sum("c").alias("n_rows"),
            F.count("*").alias("n_sensitive"),
            F.round(h, 4).alias("entropy"),
        )
        .select(
            "hour_band",
            "value_band",
            "n_rows",
            "n_sensitive",
            "entropy",
            (F.col("n_sensitive") >= l_min).alias("distinct_l_ok"),
            (F.col("entropy") >= F.round(F.log(F.lit(float(l_min))), 4)).alias(
                "entropy_l_ok"
            ),
        )
    )


ORACLE_L_DIVERSITY = f"""
ld_sv AS (
  SELECT CAST(floor(hour(ts) / {HOUR_BAND_WIDTH})
              * {HOUR_BAND_WIDTH} AS BIGINT) AS hour_band,
         CAST(floor(value / {VALUE_BAND_WIDTH})
              * {VALUE_BAND_WIDTH} AS BIGINT) AS value_band,
         event_type AS sensitive,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2, 3
),
l_diversity_audit AS (
  SELECT hour_band, value_band,
         CAST(sum(c) AS BIGINT) AS n_rows,
         CAST(count(*) AS BIGINT) AS n_sensitive,
         round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 4) AS entropy,
         count(*) >= {L_DIVERSITY} AS distinct_l_ok,
         round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 4)
           >= round(ln(CAST({float(L_DIVERSITY)!r} AS DOUBLE)), 4)
           AS entropy_l_ok
  FROM ld_sv GROUP BY 1, 2
)
"""


# ---------------------------------------------------------------------------
# t-closeness audit
# ---------------------------------------------------------------------------

#: t-closeness threshold as an exact rational (1/5): a QI group passes
#: if the variational distance between its sensitive distribution and
#: the global one is <= 0.2, compared cross-multiplied in integers.
T_CLOSE_NUM, T_CLOSE_DEN = 1, 5


def t_closeness_audit(events: DataFrame) -> DataFrame:
    """t-closeness (Li et al. 2007) — the audit l-diversity cannot
    provide: a group can be diverse yet still skewed far from the
    population (e.g. 90% one sensitive value vs 20% globally), which
    leaks probabilistic information. Same published QI grid as the
    k-anonymity/l-diversity audits; distance is the total variational
    distance (categorical EMD) between group and global sensitive
    distributions:

        tvd = 1/2 * sum_s |c_gs/n_g - C_s/N|
            = [ sum_present |c_gs*N - C_s*n_g| + (N - sum_present C_s)*n_g ]
              / (2*n_g*N)

    where the second numerator term accounts for sensitive values
    ABSENT from the group (their |0 - C_s*n_g| mass — dropping them
    understates the distance, the classic implementation bug). All
    numerators are BIGINT, so the audit flag is an exact
    cross-multiplied comparison and the reported tvd one rounded
    division. Two grid-bounded hash-aggs + a |sensitive|-row
    broadcast.

    Output: (hour_band, value_band, n_rows, tvd, t_ok).
    """
    qi = events.select(
        (
            F.floor(F.hour("ts") / HOUR_BAND_WIDTH) * HOUR_BAND_WIDTH
        ).alias("hour_band"),
        (
            F.floor(F.col("value") / VALUE_BAND_WIDTH) * VALUE_BAND_WIDTH
        ).alias("value_band"),
        F.col("event_type").alias("sensitive"),
    )
    per_sv = qi.groupBy("hour_band", "value_band", "sensitive").agg(
        F.count("*").alias("c")
    )
    glob = qi.groupBy("sensitive").agg(F.count("*").alias("cs"))
    ntot = qi.agg(F.count("*").alias("n_all"))
    ng = per_sv.groupBy("hour_band", "value_band").agg(
        F.sum("c").alias("n_g")
    )
    joined = (
        per_sv.join(ng, ["hour_band", "value_band"])
        .join(F.broadcast(glob), "sensitive")
        .crossJoin(F.broadcast(ntot))
    )
    grp = joined.groupBy("hour_band", "value_band").agg(
        F.first("n_g").alias("n_g"),
        F.first("n_all").alias("n_all"),
        F.sum(
            F.abs(
                F.col("c") * F.col("n_all") - F.col("cs") * F.col("n_g")
            )
        ).alias("present_num"),
        F.sum("cs").alias("present_cs"),
    )
    dist_num = F.col("present_num") + (
        F.col("n_all") - F.col("present_cs")
    ) * F.col("n_g")
    return grp.select(
        "hour_band",
        "value_band",
        F.col("n_g").alias("n_rows"),
        F.round(
            dist_num
            / (F.lit(2.0) * F.col("n_g") * F.col("n_all")),
            6,
        ).alias("tvd"),
        (
            dist_num * F.lit(T_CLOSE_DEN)
            <= F.lit(2 * T_CLOSE_NUM) * F.col("n_g") * F.col("n_all")
        )
        .cast("int")
        .alias("t_ok"),
    )


ORACLE_T_CLOSENESS = f"""
tc_sv AS (
  SELECT CAST(floor(hour(ts) / {HOUR_BAND_WIDTH})
              * {HOUR_BAND_WIDTH} AS BIGINT) AS hour_band,
         CAST(floor(value / {VALUE_BAND_WIDTH})
              * {VALUE_BAND_WIDTH} AS BIGINT) AS value_band,
         event_type AS sensitive,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2, 3
),
tc_ng AS (
  SELECT hour_band, value_band, CAST(sum(c) AS BIGINT) AS n_g
  FROM tc_sv GROUP BY 1, 2
),
tc_glob AS (
  SELECT sensitive, CAST(sum(c) AS BIGINT) AS cs FROM tc_sv GROUP BY 1
),
tc_tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_all FROM tc_sv),
tc_grp AS (
  SELECT s.hour_band, s.value_band,
         CAST(max(g.n_g) AS BIGINT) AS n_g,
         CAST(max(t.n_all) AS BIGINT) AS n_all,
         CAST(sum(abs(s.c * t.n_all - gl.cs * g.n_g)) AS BIGINT)
           AS present_num,
         CAST(sum(gl.cs) AS BIGINT) AS present_cs
  FROM tc_sv s
  JOIN tc_ng g USING (hour_band, value_band)
  JOIN tc_glob gl USING (sensitive)
  CROSS JOIN tc_tot t
  GROUP BY 1, 2
),
t_closeness_audit AS (
  SELECT hour_band, value_band, n_g AS n_rows,
         round((present_num + (n_all - present_cs) * n_g)
               / (CAST(2 AS DOUBLE) * n_g * n_all), 6) AS tvd,
         CAST((present_num + (n_all - present_cs) * n_g) * {T_CLOSE_DEN}
              <= 2 * {T_CLOSE_NUM} * n_g * n_all AS INT) AS t_ok
  FROM tc_grp
)
"""


# ---------------------------------------------------------------------------
# randomized response (Warner's mechanism, derandomized coin)
# ---------------------------------------------------------------------------

#: flip probability as an exact rational 1/RR_FLIP_MOD: a user's
#: reported bit is inverted iff md5(user) mod RR_FLIP_MOD == 0.
#: 4 -> p = 0.25, well inside the (p < 0.5) identifiable regime.
RR_FLIP_MOD = 4


def randomized_response(events: DataFrame) -> DataFrame:
    """Warner's randomized response over the per-user "is a purchaser"
    bit: each user reports their true bit XOR a p=1/RR_FLIP_MOD coin,
    and the population rate is recovered by the standard debias
    pi_hat = (obs_rate - p) / (1 - 2p) — the local-DP primitive under
    every telemetry opt-in design (the collector never sees a
    trustworthy individual bit, only a recoverable aggregate).

    The coin is the md5-derandomized stand-in this repo uses wherever
    production would draw real randomness (negative sampling,
    permutation tests): deterministic coins make the mechanism
    oracle-replayable and the debias identity EXACTLY checkable —
    with real coins the test would only hold in expectation. In
    production, swap the md5 coin for a secure RNG per report; the
    aggregation shape is unchanged (one user-grain hash-agg; the
    debias algebra runs on a 1-row frame). Counts are integers;
    division happens once at the rounded edge; epsilon = ln((1-p)/p)
    is reported from the SAME rounded rational both engines compute.

    Output (1 row): n_users, n_true, n_reported, true_rate, est_rate,
    epsilon (round 6).
    """
    per_user = events.groupBy("user_id").agg(
        (
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            > 0
        )
        .cast("int")
        .alias("truth")
    )
    coin = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 13), 16, 10)
        .cast("bigint")
        % RR_FLIP_MOD
        == 0
    ).cast("int")
    reported = per_user.select(
        "truth",
        (F.col("truth") != coin).cast("int").alias("rep"),
    )
    p = 1.0 / RR_FLIP_MOD
    agg = reported.agg(
        F.count("*").alias("n_users"),
        F.sum("truth").alias("n_true"),
        F.sum("rep").alias("n_reported"),
    )
    return agg.select(
        "n_users",
        "n_true",
        "n_reported",
        F.round(F.col("n_true") / F.col("n_users").cast("double"), 6).alias(
            "true_rate"
        ),
        F.round(
            (
                F.col("n_reported") / F.col("n_users").cast("double")
                - F.lit(p)
            )
            / F.lit(1.0 - 2 * p),
            6,
        ).alias("est_rate"),
        F.round(F.log(F.lit((1.0 - p) / p)), 6).alias("epsilon"),
    )


ORACLE_RANDOMIZED_RESPONSE = f"""
rr_u AS (
  SELECT user_id,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              > 0 AS INT) AS truth,
         CAST(CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13))
              AS BIGINT) % {RR_FLIP_MOD} = 0 AS INT) AS coin
  FROM events GROUP BY 1
),
rr_r AS (
  SELECT truth, CAST(truth <> coin AS INT) AS rep FROM rr_u
),
rr_a AS (
  SELECT CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(truth) AS BIGINT) AS n_true,
         CAST(sum(rep) AS BIGINT) AS n_reported
  FROM rr_r
),
privacy_randomized_response AS (
  SELECT n_users, n_true, n_reported,
         round(n_true / CAST(n_users AS DOUBLE), 6) AS true_rate,
         round((n_reported / CAST(n_users AS DOUBLE)
                - CAST({1.0 / RR_FLIP_MOD} AS DOUBLE))
               / CAST({1.0 - 2.0 / RR_FLIP_MOD} AS DOUBLE), 6)
           AS est_rate,
         round(ln(CAST({(RR_FLIP_MOD - 1.0)} AS DOUBLE)), 6) AS epsilon
  FROM rr_a
)
"""
