"""Round-8 operator tests: planted-structure checks for the two
deferred-ledger resolutions (oracle parity runs in the differential
board; here we verify the MATH finds what we planted)."""

from __future__ import annotations

import datetime as dt
import json

from big_data_instacart_market_basket_analysis_spark.operators import (
    temporal,
)


def _events(spark, rows):
    """rows: (user_id, ts, event_type, item)."""
    return spark.createDataFrame(
        [
            (i, ts, uid, et, 1.0, json.dumps({"k": item}))
            for i, (uid, ts, et, item) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def test_periodogram_finds_planted_weekly_cycle(spark):
    """28-day purchase series with a clean 7-day spike pattern (and one
    zero-purchase day that only the calendar gap-fill can represent):
    the period-7 bin must be the unique peak."""
    base = dt.datetime(2024, 1, 1)
    rows = []
    for d in range(28):
        if d == 5:
            continue  # planted gap day: 0 purchases
        n = 15 if d % 7 == 0 else 10
        for i in range(n):
            rows.append((1, base + dt.timedelta(days=d, minutes=i),
                         "purchase", 1))
    df = temporal.periodogram_daily(_events(spark, rows))
    got = {r["period"]: (r["power"], r["is_peak"]) for r in df.collect()}
    assert set(got) == set(range(2, 15))
    peaks = [p for p, (_, ispk) in got.items() if ispk]
    assert peaks == [7]
    # the planted gap day adds broadband power; the 7-day line must
    # still dominate every other bin by a wide margin
    assert got[7][0] > 1.5 * max(
        pw for p, (pw, _) in got.items() if p != 7
    )


def test_lru_hitrate_hand_worked_trace(spark):
    """Single user accessing [1,2,1,3,1,2]: hits are 0 (k=1), 2 (k=2),
    3 (k=4 and k=8) — worked by hand against the LRU definition."""
    base = dt.datetime(2024, 1, 1)
    trace = [1, 2, 1, 3, 1, 2]
    rows = [
        (7, base + dt.timedelta(minutes=i), "view", item)
        for i, item in enumerate(trace)
    ]
    df = temporal.lru_hitrate(_events(spark, rows))
    got = {r["capacity"]: (r["n_refs"], r["hits"], r["hit_rate"])
           for r in df.collect()}
    assert got == {
        1: (6, 0, 0.0),
        2: (6, 2, round(2 / 6, 6)),
        4: (6, 3, 0.5),
        8: (6, 3, 0.5),
    }


def test_lru_hitrate_monotone_in_capacity(spark):
    """On any trace, hits are monotone non-decreasing in capacity
    (LRU's inclusion property)."""
    base = dt.datetime(2024, 1, 1)
    rows = []
    for u in range(3):
        for i in range(40):
            rows.append(
                (u, base + dt.timedelta(minutes=i), "view",
                 (i * (u + 3)) % 7)
            )
    got = {
        r["capacity"]: r["hits"]
        for r in temporal.lru_hitrate(_events(spark, rows)).collect()
    }
    assert got[1] <= got[2] <= got[4] <= got[8]
    assert got[8] > 0


def test_hbos_flags_planted_rare_event(spark):
    """One event in a rare hour/dow/value-octave corner vs 200 events
    in one dense corner: the planted event must rank first with a
    strictly higher score."""
    base = dt.datetime(2024, 1, 1, 12, 0)  # Monday noon
    rows = [
        (
            i,
            base + dt.timedelta(seconds=i),
            1,
            "view",
            10.0 + (i % 3) * 0.01,
            "{}",
        )
        for i in range(200)
    ]
    rows.append((999, dt.datetime(2024, 1, 6, 3, 0), 2, "view",
                 90000.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    top = temporal.hbos_outliers(df).collect()
    assert top[0]["event_id"] == 999
    assert top[0]["score"] > top[1]["score"]


def test_yuen_detects_planted_shift_despite_outliers(spark):
    """Two groups separated by 5 units in their central mass, each
    polluted with 10% wild outliers pointing the WRONG way: the
    trimmed test must still call the shift significant and report
    trimmed means near the central values."""
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for i in range(100):
        rows.append((eid, base, 1, "purchase", 10.0 + (i % 11) * 0.1,
                     "{}")); eid += 1
        rows.append((eid, base, 1, "click", 5.0 + (i % 11) * 0.1,
                     "{}")); eid += 1
    for i in range(10):  # anti-shift outliers
        rows.append((eid, base, 1, "purchase", -500.0, "{}")); eid += 1
        rows.append((eid, base, 1, "click", 500.0, "{}")); eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    r = temporal.yuen_trimmed_test(df).collect()[0]
    assert r["n1"] == 110 and r["g1"] == 22 and r["h1"] == 66
    assert 9.5 < r["tm1"] < 11.0 and 4.5 < r["tm2"] < 6.0
    assert r["significant"] and r["t_stat"] > 0
    # a plain mean would be dragged to ~-36 vs ~50 — sign-flipped


def test_bass_recovers_planted_diffusion(spark):
    """Customers adopting along an exact Bass curve (p=.03, q=.3,
    M=200): the OLS fit must recover the market size within ~10% and
    an imitation-dominant q > p."""
    import math

    p, q, M = 0.03, 0.3, 200
    base = dt.datetime(2020, 1, 1)

    def cum(t):
        e = math.exp(-(p + q) * t)
        return M * (1 - e) / (1 + (q / p) * e)

    rows, cust = [], 0
    for t in range(1, 61):
        new = int(round(cum(t))) - int(round(cum(t - 1)))
        for _ in range(new):
            cust += 1
            rows.append((cust * 10, cust, "P", 1.0,
                         base + dt.timedelta(days=t), "1-URGENT"))
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    )
    r = temporal.bass_model(df).collect()[0]
    assert abs(r["m_hat"] - M) / M < 0.10
    assert r["q_hat"] > r["p_hat"] > 0
    assert r["peak_t"] is not None and r["peak_t"] > 0


def test_brier_decomposition_identity(spark):
    """On the oracle fixture corpus: the reported residual must close
    the Murphy identity exactly (BS = REL - RES + UNC + residual at
    reported precision) and every component must be in range."""
    from big_data_instacart_market_basket_analysis_spark.operators import (
        textstats,
    )
    from tests.conftest import SF_ORACLE

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    r = textstats.brier_decomposition(docs).collect()[0]
    assert 0 <= r["brier"] <= 1
    assert r["reliability"] >= 0 and r["resolution"] >= 0
    assert 0 <= r["uncertainty"] <= 0.25
    lhs = r["brier"]
    rhs = r["reliability"] - r["resolution"] + r["uncertainty"] \
        + r["residual"]
    assert abs(lhs - rhs) < 5e-6


def test_ivf_probe_sweep_monotone(spark):
    """Recall@k is non-decreasing in nprobe (more cells probed can
    only add candidates) and the scan fraction is nprobe/n_cells."""
    from big_data_instacart_market_basket_analysis_spark.operators import (
        similarity,
    )
    from tests.conftest import SF_ORACLE

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    rows = {r["nprobe"]: r for r in similarity.ivf_probe_sweep(emb).collect()}
    assert sorted(rows) == [1, 2, 4]
    assert rows[1]["recall_at_k"] <= rows[2]["recall_at_k"] \
        <= rows[4]["recall_at_k"]
    for p, r in rows.items():
        assert r["scan_frac"] == round(p / r["n_cells"], 4)
    assert rows[4]["recall_at_k"] > 0


def test_stream_hbos_equals_batch_filter(spark):
    """The streaming alert set over a bounded input equals the batch
    HBOS filter (stateless model-apply duality)."""
    from big_data_instacart_market_basket_analysis_spark.streaming import (
        events as sev,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        (r["event_id"], r["score"])
        for r in sev.run_stream_hbos_alerts(
            spark, sf, name="stream_hbos_t8"
        ).collect()
    }
    assert all(s > sev.HBOS_ALERT_MIN for _, s in got)
    # replay the batch filter through the same scoring law
    ev = spark.read.parquet(f"{sf}/events.parquet")
    full = temporal.hbos_outliers(ev)  # top-20 of the same scores
    top = {(r["event_id"], r["score"]) for r in full.collect()
           if r["score"] > sev.HBOS_ALERT_MIN}
    assert top <= got  # every above-threshold top-20 event is alerted


def test_pack_sweep_capacity_laws(spark):
    """Bigger budgets can only reduce batch count; token totals are
    budget-invariant; fills are positive."""
    from big_data_instacart_market_basket_analysis_spark.operators import (
        textstats,
    )
    from tests.conftest import SF_ORACLE

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    rows = {r["budget"]: r for r in textstats.pack_sweep(docs).collect()}
    assert sorted(rows) == [512, 1024, 2048, 4096]
    assert len({r["total_tokens"] for r in rows.values()}) == 1
    bs = [rows[b]["n_batches"] for b in sorted(rows)]
    assert bs == sorted(bs, reverse=True)
    assert all(r["mean_fill"] > 0 for r in rows.values())


def test_nb_fit_planted_mixture(spark):
    """A 2-component Poisson-like mixture (half the users at rate 1,
    half at rate 9) is overdispersed: VMR > 1, r/p defined, and the
    MoM identities hold (m = r(1-p)/p within rounding)."""
    base = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    for u in range(40):
        k = 1 if u % 2 == 0 else 9
        for i in range(k):
            rows.append((eid, base + dt.timedelta(minutes=eid), u,
                         "purchase", 1.0, "{}")); eid += 1
        rows.append((eid, base + dt.timedelta(minutes=eid), u,
                     "view", 1.0, "{}")); eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    r = temporal.nb_fit(df).collect()[0]
    assert r["n_users"] == 40 and r["mean_purchases"] == 5.0
    assert r["vmr"] > 1 and r["nb_r"] is not None
    m_back = r["nb_r"] * (1 - r["nb_p"]) / r["nb_p"]
    assert abs(m_back - r["mean_purchases"]) < 1e-3


def test_bpe_fertility_converges_on_tiny_vocab(spark):
    """Two-word corpus: 6 merges fully fuse both words, so fertility
    is exactly 1.0 and chars_per_token equals the mean word length."""
    from big_data_instacart_market_basket_analysis_spark.operators import (
        textstats,
    )

    docs = spark.createDataFrame(
        [(i, "the cat the cat the", "en", "s") for i in range(5)],
        "doc_id long, text string, lang string, source string",
    )
    r = {x["lang"]: x for x in textstats.bpe_fertility(docs).collect()}
    en = r["en"]
    assert en["n_word_types"] == 2
    assert en["total_words"] == 25  # 5 docs x (3 the + 2 cat)
    assert en["fertility"] == 1.0
    assert en["total_tokens"] == 25
    assert en["chars_per_token"] == 3.0


def _purchase_days(spark, day_values):
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for d, cents_total in enumerate(day_values):
        # one purchase carrying the whole day's value
        rows.append((eid, base + dt.timedelta(days=d), 1, "purchase",
                     cents_total / 100.0, "{}")); eid += 1
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def test_ewma_chart_fires_on_planted_shift(spark):
    """Flat level for 20 days then a sustained +30% shift: the EWMA
    crosses the UCL inside the shifted region (and never before); the
    first z equals 0.2 x_0 + 0.8 mu by hand."""
    vals = [10000] * 20 + [13000] * 10
    df = temporal.ewma_chart(_purchase_days(spark, vals))
    rows = {r["d"]: r for r in df.collect()}
    assert len(rows) == 30
    mu = sum(vals) / 30
    assert abs(rows[0]["z"] - round(0.2 * vals[0] + 0.8 * mu, 6)) < 1e-6
    pre = [rows[d]["out_of_control"] for d in range(20)]
    post = [rows[d]["out_of_control"] for d in range(20, 30)]
    assert not any(pre[1:])  # stable region stays in control
    assert any(post)  # the drift trips the chart


def test_mk_seasonal_sees_through_weekly_cycle(spark):
    """A huge weekly cycle plus a small steady upward drift: plain
    visual variance is cycle-dominated, but same-weekday pairs are
    monotone -> 'increasing'. The pure cycle alone -> 'none'."""
    cycle = [100000, 200, 300, 400, 500, 600, 70000]
    trended = [cycle[d % 7] + d * 10 for d in range(56)]
    r1 = temporal.seasonal_mann_kendall(
        _purchase_days(spark, trended)
    ).collect()[0]
    assert r1["trend"] == "increasing" and r1["z"] > 1.96
    # every same-season pair increases: S = 7 * C(8,2) = 196
    assert r1["s_total"] == 196
    flat = [cycle[d % 7] for d in range(56)]
    r2 = temporal.seasonal_mann_kendall(
        _purchase_days(spark, flat)
    ).collect()[0]
    assert r2["trend"] == "none" and r2["s_total"] == 0


def test_wilson_ci_hand_worked(spark):
    """k=10 of n=100 users: the Wilson interval matches the textbook
    formula and brackets p_hat."""
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(100):
        rows.append((eid, base, u, "view", 1.0, "{}")); eid += 1
        if u < 10:
            rows.append((eid, base, u, "purchase", 1.0, "{}")); eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    got = {r["event_type"]: r for r in temporal.wilson_ci(df).collect()}
    r = got["purchase"]
    assert (r["n_users"], r["k_users"], r["p_hat"]) == (100, 10, 0.1)
    z, n, p = 1.96, 100.0, 0.1
    denom = 1 + z * z / n
    center = (p + z * z / (2 * n)) / denom
    half = z * ((p * (1 - p) / n + z * z / (4 * n * n)) ** 0.5) / denom
    assert abs(r["wilson_lo"] - round(center - half, 6)) < 1e-9
    assert abs(r["wilson_hi"] - round(center + half, 6)) < 1e-9
    assert r["wilson_lo"] < 0.1 < r["wilson_hi"]
    # at p_hat = 1 the Wilson UPPER bound is exactly 1 (algebraic
    # identity); the LOWER bound pulls properly below 1 — the behavior
    # the Wald interval (width 0 at p=1) gets wrong
    assert got["view"]["p_hat"] == 1.0
    assert got["view"]["wilson_hi"] == 1.0
    assert got["view"]["wilson_lo"] < 1.0


def test_gamma_fit_recovers_planted_shape(spark):
    """Deterministic gamma-ish sample via inverse-CDF-free planting:
    an exponential grid (gamma k=1) must fit k near 1; a sum-of-two
    grid (k=2 shape) must fit a clearly larger k."""
    import math

    base = dt.datetime(2024, 1, 1)
    rows = []
    # exponential (k=1, theta=100): quantile grid x_i = -100 ln(1-u)
    for i in range(1, 200):
        u = i / 200
        rows.append((i, i, "1-EXP", -100.0 * math.log(1 - u),
                     base, "x"))
    # Erlang-2 (k=2): sum of two staggered exponential quantiles
    for i in range(1, 200):
        u1, u2 = i / 200, ((i * 101) % 199 + 0.5) / 200
        x = -100.0 * (math.log(1 - u1) + math.log(1 - u2))
        rows.append((1000 + i, i, "2-ERL", x, base, "x"))
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderpriority string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderstatus string",
    )
    got = {r["priority"]: r for r in temporal.gamma_fit(df).collect()}
    k1 = got["1-EXP"]["gamma_shape"]
    k2 = got["2-ERL"]["gamma_shape"]
    assert 0.7 < k1 < 1.3
    assert k2 > 1.5
    # MoM identity: mean = k * theta within rounding
    for r in got.values():
        assert abs(r["gamma_shape"] * r["gamma_scale"]
                   - r["mean_total"]) < 1e-2
