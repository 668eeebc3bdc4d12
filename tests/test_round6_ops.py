"""Hand-worked invariant pins for the round-6 rank/queue operators:
Kendall tau-b pair counts, tie-corrected Kruskal-Wallis H, Levene's W
from exact integer deviations, and the Erlang-C wait curve against the
textbook C(3, 2) value."""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F

from big_data_instacart_market_basket_analysis_spark.operators import (
    temporal,
)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "ts timestamp, event_type string, value double"
    )


def _day(i):
    return datetime.datetime(2024, 1, i, 12, 0, 0)


def test_kendall_pair_counts_and_tau(spark):
    """Daily revs 10, 20, 20, 5 over 4 days: of the 6 ordered day
    pairs, 2 are concordant (10<20 twice), 3 discordant (10>5,
    20>5 twice), 1 revenue-tied (20=20); tau_b = -1/sqrt(6*5)."""
    ev = _events(
        spark,
        [
            (_day(1), "purchase", 10.0),
            (_day(2), "purchase", 20.0),
            (_day(3), "purchase", 20.0),
            (_day(4), "purchase", 5.0),
        ],
    )
    r = temporal.kendall_tau_daily(ev).collect()[0]
    assert (r["n_days"], r["concordant"], r["discordant"]) == (4, 2, 3)
    assert r["tied_pairs"] == 1
    assert abs(r["tau_b"] - (-1 / (30 ** 0.5))) < 1e-6
    assert not r["trending"]


def test_kendall_perfect_trend(spark):
    """Strictly increasing daily revenue => tau_b = 1 exactly."""
    ev = _events(
        spark,
        [(_day(i), "purchase", float(i)) for i in range(1, 9)],
    )
    r = temporal.kendall_tau_daily(ev).collect()[0]
    assert r["tau_b"] == 1.0
    assert r["discordant"] == 0 and r["tied_pairs"] == 0
    assert r["trending"]


def test_kruskal_no_ties_hand_value(spark):
    """A={1c,2c}, B={3c,4c}: ranks 1..4, R_A=3, R_B=7,
    H = 12/20*(9/2+49/2) - 15 = 2.4, no tie correction."""
    ev = _events(
        spark,
        [
            (_day(1), "A", 0.01),
            (_day(1), "A", 0.02),
            (_day(1), "B", 0.03),
            (_day(1), "B", 0.04),
        ],
    )
    r = temporal.kruskal_wallis(ev).collect()[0]
    assert (r["k"], r["n"]) == (2, 4)
    assert abs(r["h_stat"] - 2.4) < 1e-9
    assert abs(r["h_tie_adj"] - 2.4) < 1e-9


def test_kruskal_mid_rank_ties_hand_value(spark):
    """A={1c,1c}, B={1c,2c}: the three 1c values share mid-rank 2,
    R_A=4, R_B=6, raw H = 0.6, tie term T = 3^3-3 = 24 gives
    correction 1 - 24/60 = 0.6 and H_adj = 1.0 exactly."""
    ev = _events(
        spark,
        [
            (_day(1), "A", 0.01),
            (_day(1), "A", 0.01),
            (_day(1), "B", 0.01),
            (_day(1), "B", 0.02),
        ],
    )
    r = temporal.kruskal_wallis(ev).collect()[0]
    assert abs(r["h_stat"] - 0.6) < 1e-9
    assert abs(r["h_tie_adj"] - 1.0) < 1e-9


def test_levene_hand_value(spark):
    """A={0,1,2}$ (deviations 1,0,1 from mean 1) vs B={0,0,3}$
    (deviations 1,1,2 from mean 1): SSB = 6666.67 cents^2,
    SSW = 13333.33, W = (SSB/1)/(SSW/4) = 2.0 exactly."""
    ev = _events(
        spark,
        [
            (_day(1), "A", 0.0),
            (_day(1), "A", 1.0),
            (_day(1), "A", 2.0),
            (_day(1), "B", 0.0),
            (_day(1), "B", 0.0),
            (_day(1), "B", 3.0),
        ],
    )
    r = temporal.levene_test(ev).collect()[0]
    assert (r["k"], r["n"]) == (2, 6)
    assert abs(r["w_stat"] - 2.0) < 1e-6
    assert r["homogeneous"]  # 2.0 < F crit


def _orders_at_load(spark, n, day="1995-01-01"):
    return spark.createDataFrame(
        [(i, day) for i in range(n)], "o_orderkey long, o_orderdate string"
    ).select("o_orderkey", F.col("o_orderdate").cast("date"))


def test_erlang_wait_textbook_value(spark):
    """48 orders on one day => a = ceil(48/24) = 2 erlangs.
    Textbook Erlang-C at a=2, s=3: J(3)=38, P_wait = 24/54 =
    0.444444; s<=2 is the unstable branch (wait prob 1, no finite
    mean wait); the curve is non-increasing in s."""
    out = {
        r["servers"]: r
        for r in temporal.erlang_wait_curve(
            _orders_at_load(spark, 48)
        ).collect()
    }
    assert out[3]["offered_load"] == 2 and out[3]["capped"] == 0
    assert out[1]["wait_ppm"] == 1_000_000
    assert out[2]["wait_ppm"] == 1_000_000
    assert out[1]["wq_micro_hours"] is None
    assert out[3]["wait_ppm"] == 444_444
    assert out[3]["wq_micro_hours"] == 444_444
    ppm = [out[s]["wait_ppm"] for s in range(1, 13)]
    assert ppm == sorted(ppm, reverse=True)
    assert out[12]["wait_ppm"] < 100  # deep overprovision ~ 0


def test_erlang_wait_cap_flag(spark):
    """A load above the C-cap (8) is clamped and flagged; every
    s <= 8 is then reported as the saturated unstable branch."""
    out = {
        r["servers"]: r
        for r in temporal.erlang_wait_curve(
            _orders_at_load(spark, 24 * 50)
        ).collect()
    }
    assert out[1]["offered_load"] == 8 and out[1]["capped"] == 1
    assert all(out[s]["wait_ppm"] == 1_000_000 for s in range(1, 9))
    assert out[9]["wait_ppm"] < 1_000_000


def test_friedman_hand_value(spark):
    """2 days x 3 types, counts (3,1,2) then (2,1,3): rank sums
    A=5, B=2, C=5 with no ties => classic chi2_F = 12/(bk(k+1)) *
    sum R^2 - 3b(k+1) = 27 - 24 = 3.0; the all-integer Conover form
    must reproduce it exactly."""
    rows = []
    for day, counts in [(1, {"A": 3, "B": 1, "C": 2}),
                        (2, {"A": 2, "B": 1, "C": 3})]:
        for ty, n in counts.items():
            rows += [(_day(day), ty, 1.0)] * n
    r = temporal.friedman_test(_events(spark, rows)).collect()[0]
    assert (r["n_days"], r["k"]) == (2, 3)
    assert abs(r["chi2_f"] - 3.0) < 1e-9


def test_friedman_degenerate_null(spark):
    """Every type equally active every day => zero rank variance,
    the denominator vanishes, chi2_f must be NULL (not a crash or
    a divide-by-zero Infinity)."""
    rows = []
    for day in (1, 2):
        for ty in ("A", "B", "C"):
            rows += [(_day(day), ty, 1.0)] * 2
    r = temporal.friedman_test(_events(spark, rows)).collect()[0]
    assert r["chi2_f"] is None


def test_tukey_hand_value(spark):
    """A={0,200}c, B={100,300}c: means differ by 100, MSW = 20000,
    se = sqrt(20000/2 * (1/2+1/2)) = 100 => q = 1.0, not
    significant at the k=5 studentized-range cutoff."""
    ev = _events(
        spark,
        [
            (_day(1), "A", 0.0),
            (_day(1), "A", 2.0),
            (_day(1), "B", 1.0),
            (_day(1), "B", 3.0),
        ],
    )
    r = temporal.tukey_hsd(ev).collect()
    assert len(r) == 1
    row = r[0]
    assert (row["type_a"], row["type_b"]) == ("A", "B")
    assert abs(row["mean_diff_cents"] - 100.0) < 1e-9
    assert abs(row["q_stat"] - 1.0) < 1e-9
    assert not row["significant"]


def _monthly_orders(spark, counts):
    rows = []
    oid = 0
    for mi, n in enumerate(counts, start=1):
        for _ in range(n):
            rows.append((oid, f"1995-{mi:02d}-15"))
            oid += 1
    return spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate string"
    ).select("o_orderkey", F.col("o_orderdate").cast("date"))


def test_lot_sizing_hand_frontier(spark):
    """Demand 10/10/10 with K=5000, h=1: f(1)=5000 (one order),
    f(2)=5010 (batch month 2 into month 1: 10 unit-months held),
    f(3)=5030 (one batch covers all three: 10 + 2*10 held) — the
    single-batch plan beats any split by nearly K."""
    out = temporal.lot_sizing_frontier(
        _monthly_orders(spark, [10, 10, 10])
    ).collect()
    got = {r["month_idx"]: r["opt_cost_cents"] for r in out}
    assert got == {1: 5000, 2: 5010, 3: 5030}


def test_lot_sizing_split_beats_batch(spark):
    """Demand 1/5001: holding 5001 units one month (5001c) costs
    more than a second setup (5000c), so the optimum orders twice:
    f(2) = 10000, not 10001 — the DP must pick the split."""
    out = temporal.lot_sizing_frontier(
        _monthly_orders(spark, [1, 5001])
    ).collect()
    got = {r["month_idx"]: r["opt_cost_cents"] for r in out}
    assert got == {1: 5000, 2: 10000}


def test_lot_sizing_frontier_monotone(spark):
    """The frontier is nondecreasing in t (covering more months
    can never get cheaper) and each step adds at most K + h*d_t
    (ordering the new month alone is always feasible)."""
    out = sorted(
        temporal.lot_sizing_frontier(
            _monthly_orders(spark, [7, 0, 13, 2, 40, 1])
        ).collect(),
        key=lambda r: r["month_idx"],
    )
    costs = [r["opt_cost_cents"] for r in out]
    assert all(b >= a for a, b in zip(costs, costs[1:]))
    for prev, cur in zip(out, out[1:]):
        assert (
            cur["opt_cost_cents"]
            <= prev["opt_cost_cents"] + 5000 + cur["demand"]
        )


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_novelty_attribution_hand(spark):
    """doc1 introduces both its trigrams; doc2 shares 'a b c' (owned
    by the lower doc_id) and introduces only 'b c x'; a 2-token doc
    has no trigrams and is excluded by construction."""
    from big_data_instacart_market_basket_analysis_spark.operators import (
        textstats,
    )

    out = {
        r["doc_id"]: r
        for r in textstats.novelty_attribution(
            _docs(
                spark,
                [(1, "a b c d"), (2, "a b c x"), (3, "a b")],
            )
        ).collect()
    }
    assert set(out) == {1, 2}
    assert (out[1]["n_distinct_trigrams"], out[1]["n_introduced"]) == (2, 2)
    assert out[1]["novelty_pct"] == 100.0
    assert (out[2]["n_distinct_trigrams"], out[2]["n_introduced"]) == (2, 1)
    assert out[2]["novelty_pct"] == 50.0


def test_gumbel_hand_value(spark):
    """Daily hourly-revenue maxima 100/200/300 cents: m=200, s=100,
    beta = 100*sqrt(6)/pi, mu = m - gamma*beta, and the 30-block
    return level follows the closed form."""
    import math

    rows = [
        (datetime.datetime(2024, 1, 1, 10), "purchase", 1.00),
        (datetime.datetime(2024, 1, 1, 11), "purchase", 0.50),
        (datetime.datetime(2024, 1, 2, 10), "purchase", 2.00),
        (datetime.datetime(2024, 1, 3, 10), "purchase", 3.00),
        (datetime.datetime(2024, 1, 3, 11), "purchase", 1.00),
    ]
    r = temporal.gumbel_maxima(_events(spark, rows)).collect()[0]
    beta = 100 * math.sqrt(6) / math.pi
    mu = 200 - 0.5772156649015329 * beta
    ret = mu - beta * math.log(-math.log(1 - 1 / 30))
    assert r["n_blocks"] == 3
    assert abs(r["mean_max_cents"] - 200.0) < 1e-9
    assert abs(r["sd_max_cents"] - 100.0) < 1e-9
    assert abs(r["beta"] - beta) < 1e-3
    assert abs(r["mu"] - mu) < 1e-3
    assert abs(r["ret30_cents"] - ret) < 1e-3


def _click_purchase_days(spark, clicks, purchases):
    rows = []
    for day, n in enumerate(clicks, start=1):
        rows += [(_day(day), "click", 1.0)] * n
    for day, n in enumerate(purchases, start=1):
        rows += [(_day(day), "purchase", 1.0)] * n
    return _events(spark, rows)


def test_dtw_identical_series_zero(spark):
    """Identical daily shapes warp at zero cost."""
    ev = _click_purchase_days(spark, [3, 1, 4, 1], [3, 1, 4, 1])
    r = temporal.dtw_alignment(ev).collect()[0]
    assert (r["n_a"], r["n_b"], r["dtw_cost"]) == (4, 4, 0)


def test_dtw_shift_absorbed(spark):
    """A one-day lag of the same spike costs 0 under DTW (the whole
    point vs fixed-lag distance: the warp path absorbs the shift)."""
    ev = _click_purchase_days(spark, [1, 5, 1, 1], [1, 1, 5, 1])
    r = temporal.dtw_alignment(ev).collect()[0]
    assert r["dtw_cost"] == 0


def test_dtw_hand_value(spark):
    """a=[2,4], b=[3]: every cell pays |a_i-3|, the only path is
    (1,1)->(2,1): cost 1 + 1 = 2."""
    ev = _click_purchase_days(spark, [2, 4], [3])
    r = temporal.dtw_alignment(ev).collect()[0]
    assert (r["n_a"], r["n_b"], r["dtw_cost"]) == (2, 1, 2)


def test_nw_alignment_hand_values(spark):
    """'a b c' vs 'a x c': match + mismatch + match = 2-1+2 = 3;
    'a b' vs 'a x b': the optimal path opens one gap: 2-1+2 = 3."""
    from big_data_instacart_market_basket_analysis_spark.operators import (
        textstats,
    )

    r = textstats.nw_alignment(
        _docs(spark, [(1, "a b c"), (2, "a x c")])
    ).collect()[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert (r["n_a"], r["n_b"], r["align_score"]) == (3, 3, 3)

    r = textstats.nw_alignment(
        _docs(spark, [(1, "a b"), (2, "a x b")])
    ).collect()[0]
    assert (r["n_a"], r["n_b"], r["align_score"]) == (2, 3, 3)


def test_nw_alignment_identical_prefix_cap(spark):
    """Identical 100-token docs: score = 2 * CAP (64) — the cap
    bounds the DP, not the documents."""
    from big_data_instacart_market_basket_analysis_spark.operators import (
        textstats,
    )

    text = " ".join(f"w{i}" for i in range(100))
    r = textstats.nw_alignment(
        _docs(spark, [(1, text), (2, text)])
    ).collect()[0]
    assert (r["n_a"], r["n_b"]) == (64, 64)
    assert r["align_score"] == 128


def test_jaro_winkler_textbook_value(spark):
    """'x martha' vs 'x marhta' (sharing the 'x' block): all 8 chars
    match, the t/h swap is 1 transposition => jaro = (1+1+7/8)/3,
    prefix capped at 4 => jw = 0.975 (the classic MARTHA/MARHTA pair
    with a shared block prefix)."""
    from big_data_instacart_market_basket_analysis_spark.operators import (
        dedup,
    )

    parts = spark.createDataFrame(
        [(1, "x martha"), (2, "x marhta")],
        "p_partkey long, p_name string",
    )
    r = dedup.jaro_winkler_pairs(parts).collect()
    assert len(r) == 1
    row = r[0]
    assert (row["name_a"], row["name_b"]) == ("x marhta", "x martha")
    assert (row["n_matches"], row["transpositions"]) == (8, 1)
    assert abs(row["jw_sim"] - 0.975) < 1e-6


def test_jaro_winkler_disjoint_strings(spark):
    """No common chars => m=0 => similarity exactly 0."""
    from big_data_instacart_market_basket_analysis_spark.operators import (
        dedup,
    )

    parts = spark.createDataFrame(
        [(1, "q abc"), (2, "q xyz")], "p_partkey long, p_name string"
    )
    # shared block 'q' but the q/space DO match; use fully disjoint
    # second words and check the score reflects only block overlap
    r = dedup.jaro_winkler_pairs(parts).collect()[0]
    assert 0.0 < r["jw_sim"] < 1.0


def test_energy_distance_hand_value(spark):
    """X={0c,2c} (purchases), Y={1c} (clicks): A=|0-1|+|2-1|=2,
    B=|0-2|+|2-0|=4, C=0 => E = 2*2/2 - 4/4 = 1.0 and
    e_stat = (2*1/3)*1 = 2/3."""
    ev = _events(
        spark,
        [
            (_day(1), "purchase", 0.00),
            (_day(1), "purchase", 0.02),
            (_day(1), "click", 0.01),
        ],
    )
    r = temporal.energy_distance(ev).collect()[0]
    assert (r["n_x"], r["n_y"]) == (2, 1)
    assert (int(r["a_cross"]), int(r["b_within_x"]),
            int(r["c_within_y"])) == (2, 4, 0)
    assert abs(r["energy_dist"] - 1.0) < 1e-9
    assert abs(r["e_stat"] - 2 / 3) < 1e-6


def test_energy_distance_identical_is_zero(spark):
    """Identical samples => energy distance exactly 0 (the metric
    property E >= 0 with equality iff same distribution)."""
    ev = _events(
        spark,
        [
            (_day(1), "purchase", 0.01),
            (_day(1), "purchase", 0.02),
            (_day(1), "click", 0.01),
            (_day(1), "click", 0.02),
        ],
    )
    r = temporal.energy_distance(ev).collect()[0]
    assert r["energy_dist"] == 0.0
    assert r["e_stat"] == 0.0


def test_seasonality_strength_weekly_cycle(spark):
    """A hard weekly cycle (one busy day per week, flat otherwise)
    over 5 weeks => F_seasonal close to 1 and far above F_trend."""
    rows = []
    for day in range(1, 31):
        n = 12 if day % 7 == 1 else 1
        if day == 17:
            n += 5  # one irregular day so the remainder is nonzero
        rows += [(_day(day), "view", 1.0)] * n
    r = temporal.seasonality_strength(_events(spark, rows)).collect()[0]
    assert r["n_days"] == 24  # full 7-day-window days only
    assert r["f_seasonal"] > 0.9
    assert r["seasonal_is_real"]
    assert 0.0 <= r["f_trend"] < r["f_seasonal"]


def test_ppl_buckets_cumulative_and_share(spark):
    """Cumulative counts are monotone in the bucket order, the last
    cumulative row equals the totals, and the share ends at 100%."""
    from big_data_instacart_market_basket_analysis_spark.operators import (
        textstats,
    )

    docs = _docs(
        spark,
        [
            (1, "the the the the"),
            (2, "the of and to"),
            (3, "rare unique words here"),
        ],
    )
    rows = sorted(
        textstats.ppl_bucket_report(docs).collect(),
        key=lambda r: r["ppl_bucket"],
    )
    cd = [r["cum_docs"] for r in rows]
    assert cd == sorted(cd)
    assert cd[-1] == 3
    assert abs(rows[-1]["doc_share_pct"] - 100.0) < 1e-9
    assert rows[-1]["cum_tokens"] == 12


def test_mood_median_hand_table(spark):
    """Values A={1,2,3}, B={4,5}c: grand median (rank 3 of 5) = 3c;
    above = {4,5} (both B), below = {1,2} (both A), the single tie
    (3c) drops. Perfect separation of a 2x2 table with margins
    2/2 => chi2 = T = 4."""
    ev = _events(
        spark,
        [
            (_day(1), "A", 0.01),
            (_day(1), "A", 0.02),
            (_day(1), "A", 0.03),
            (_day(1), "B", 0.04),
            (_day(1), "B", 0.05),
        ],
    )
    r = temporal.mood_median_test(ev).collect()[0]
    assert (r["k"], r["n_used"], r["n_ties_dropped"]) == (2, 4, 1)
    assert r["grand_median_cents"] == 3
    assert abs(r["chi2"] - 4.0) < 1e-9


def test_burstiness_clumped_beats_even(spark):
    """'zz' appears 30 times in one doc (clumped), 'qq' once in each
    of 30 docs (even): VMR(zz) >> VMR(qq) ~ just under 1."""
    from big_data_instacart_market_basket_analysis_spark.operators import (
        textstats,
    )

    rows = [(1, " ".join(["zz"] * 30) + " qq")]
    rows += [(i, "qq filler") for i in range(2, 31)]
    out = {
        r["term"]: r["vmr"]
        for r in textstats.term_burstiness(_docs(spark, rows)).collect()
    }
    assert out["zz"] > 25  # var dominated by the single clump
    assert out["qq"] < 1.01


def test_collocations_fixed_pair_tops(spark):
    """A bigram that ALWAYS occurs together ('san francisco' 6x)
    out-scores one whose parts also roam free."""
    from big_data_instacart_market_basket_analysis_spark.operators import (
        textstats,
    )

    docs = _docs(
        spark,
        [
            (1, "san francisco " * 6 + "new york " * 6
                + "new car new day york here big york now"),
        ],
    )
    rows = textstats.collocations_llr(docs).collect()
    by = {(r["w1"], r["w2"]): r["g2"] for r in rows}
    assert ("san", "francisco") in by and ("new", "york") in by
    assert by[("san", "francisco")] > by[("new", "york")]
    assert by[("san", "francisco")] > 0


def test_record_days_hand_count(spark):
    """Revs 10, 5, 20, 20, 30: records at days 1, 3, 5 (day 4 ties
    the max, not a record) => 3 records; H_5 = 2.283333."""
    ev = _events(
        spark,
        [
            (_day(1), "purchase", 10.0),
            (_day(2), "purchase", 5.0),
            (_day(3), "purchase", 20.0),
            (_day(4), "purchase", 20.0),
            (_day(5), "purchase", 30.0),
        ],
    )
    r = temporal.record_days_test(ev).collect()[0]
    assert (r["n_days"], r["n_records"]) == (5, 3)
    assert abs(r["expected"] - (1 + 1 / 2 + 1 / 3 + 1 / 4 + 1 / 5)) < 1e-6


def test_record_days_monotone_all_records(spark):
    """Strictly rising series: every day is a record."""
    ev = _events(
        spark, [(_day(i), "purchase", float(i)) for i in range(1, 11)]
    )
    r = temporal.record_days_test(ev).collect()[0]
    assert r["n_records"] == 10
    assert r["trending"]


def test_turning_points_hand_count(spark):
    """Revs 1, 3, 2, 2, 4, 1: interior days 2..5 — day2 peak (1<3>2),
    day3 no (plateau right), day4 no (plateau left), day5 peak
    (2<4>1) => T = 2; E[T] = 2*(6-2)/3 = 8/3."""
    ev = _events(
        spark,
        [
            (_day(1), "purchase", 1.0),
            (_day(2), "purchase", 3.0),
            (_day(3), "purchase", 2.0),
            (_day(4), "purchase", 2.0),
            (_day(5), "purchase", 4.0),
            (_day(6), "purchase", 1.0),
        ],
    )
    r = temporal.turning_points_test(ev).collect()[0]
    assert (r["n_days"], r["n_turning"]) == (6, 2)
    assert abs(r["expected"] - 8 / 3) < 1e-6


def test_turning_points_sawtooth_everything_turns(spark):
    """A strict sawtooth turns at every interior day: T = n - 2,
    far above 2(n-2)/3 => nonrandom (oscillation detected)."""
    vals = [1.0 if i % 2 else 9.0 for i in range(20)]
    ev = _events(
        spark,
        [(_day(i + 1), "purchase", v) for i, v in enumerate(vals)],
    )
    r = temporal.turning_points_test(ev).collect()[0]
    assert r["n_turning"] == 18
    assert r["nonrandom"]


def test_potwo_policy_vs_optimum(spark):
    """Demand 10/10/10: WW optimum = 5030 (one batch). Power-of-two
    policies: L=1 orders thrice (15000), L=2 twice (5000+10 +
    5000 = 10010), L=4+ once covering all three = 5030 — which IS
    the optimum, so the best power-of-two gap is exactly 0%."""
    out = {
        r["interval_months"]: r
        for r in temporal.potwo_policy_eval(
            _monthly_orders(spark, [10, 10, 10])
        ).collect()
    }
    assert len(out) == 8
    assert out[1]["total_cost_cents"] == 15000
    assert out[2]["total_cost_cents"] == 10010
    assert out[4]["total_cost_cents"] == 5030
    assert out[4]["optimal_cost_cents"] == 5030
    assert out[4]["is_best"] and not out[1]["is_best"]
    assert abs(out[4]["vs_optimal_pct"] - 100.0) < 1e-9
    # empty later cycles are skipped: L=1 places 3 orders, L=4 one
    assert out[1]["n_orders_placed"] == 3
    assert out[4]["n_orders_placed"] == 1


def test_jarque_bera_symmetric_light_tails(spark):
    """Symmetric two-point-ish sample {1,2,3}c repeated: skewness
    exactly 0; kurtosis of the discrete uniform on 3 points is
    -1.5 => JB = n/6 * (0 + 1.5^2/4)."""
    rows = [(_day(1), "purchase", v) for v in (0.01, 0.02, 0.03)] * 4
    r = temporal.jarque_bera_test(_events(spark, rows)).collect()[0]
    assert r["n"] == 12
    assert r["skewness"] == 0.0
    assert abs(r["kurtosis_excess"] - (-1.5)) < 1e-9
    assert abs(r["jb_stat"] - 12 / 6 * (1.5 ** 2 / 4)) < 1e-6


def test_quartile_skew_hand_values(spark):
    """Values 1..8c: ranks ceil(k*8/4) pick Q1=2, Q2=4, Q3=6 =>
    symmetric, Bowley = 0; right-stretched {1,2,3,100}c skews
    positive."""
    ev = _events(
        spark,
        [(_day(1), "purchase", i / 100) for i in range(1, 9)],
    )
    r = temporal.quartile_skew(ev).collect()[0]
    assert (r["q1_cents"], r["q2_cents"], r["q3_cents"]) == (2, 4, 6)
    assert r["bowley_skew"] == 0.0

    ev2 = _events(
        spark,
        [
            (_day(1), "purchase", v)
            for v in (0.01, 0.02, 0.03, 0.04, 1.00, 1.01)
        ],
    )
    r2 = temporal.quartile_skew(ev2).collect()[0]
    # n=6: Q1 = 2c, Q2 = 3c, Q3 = 100c -> (100+2-6)/98
    assert (r2["q1_cents"], r2["q2_cents"], r2["q3_cents"]) == (2, 3, 100)
    assert r2["bowley_skew"] > 0.9


def test_ansari_bradley_hand_scores(spark):
    """X={10,40}c (the extremes), Y={20,30}c (the middle) with no
    ties: N=4 scores are 1,2,2,1 so AB(X) = 2 (2s sum = 4);
    E[AB] = n(N+2)/4 = 3 => squeezed-X scores BELOW expectation
    (z < 0: X is the more spread sample)."""
    ev = _events(
        spark,
        [
            (_day(1), "purchase", 0.10),
            (_day(1), "purchase", 0.40),
            (_day(1), "click", 0.20),
            (_day(1), "click", 0.30),
        ],
    )
    r = temporal.ansari_bradley(ev).collect()[0]
    assert (r["n_x"], r["n_y"]) == (2, 2)
    assert r["ab2_score"] == 4
    assert r["z"] < 0


# --- round-6 code-review regression pins -------------------------------


def test_collocations_single_token_doc_survives(spark):
    """A 1-token doc used to crash the bigram transform with
    INVALID_INDEX_OF_ZERO (sequence(0,-1) descends through i=-1);
    it must simply contribute no bigrams (review finding)."""
    from big_data_instacart_market_basket_analysis_spark.operators import (
        textstats,
    )

    docs = _docs(
        spark, [(1, "solo"), (2, ("a b " * 6).strip())]
    )
    rows = textstats.collocations_llr(docs).collect()
    assert {(r["w1"], r["w2"]) for r in rows} == {("a", "b"), ("b", "a")}


def test_dtw_empty_series_yields_no_rows(spark):
    """No purchase events => the purchase series is empty; the DP
    must yield 0 rows, not an element_at(bv, 0) crash (review
    finding; matches the oracle's empty final diagonal)."""
    ev = _events(spark, [(_day(1), "click", 1.0)])
    assert temporal.dtw_alignment(ev).count() == 0


def test_jaro_winkler_empty_window_matches_reference(spark):
    """When the longer name's tail positions have i - w > l2 the
    legal window is EMPTY; the pre-fix kernel scanned Spark's
    descending sequence and matched s2's unused 't' from outside
    the window (m=4). Textbook greedy matching says m=3, base jaro
    0.638889 (review finding). Round 7 gates the Winkler boost at
    jaro > 0.7 (the Apache Commons convention — r6 advice), so this
    below-threshold pair now keeps its bare jaro instead of the
    formerly-boosted 0.747222."""
    from big_data_instacart_market_basket_analysis_spark.operators import (
        dedup,
    )

    parts = spark.createDataFrame(
        [(1, "ab azzzzzzzzzzzzzt"), (2, "ab t")],
        "p_partkey long, p_name string",
    )
    r = dedup.jaro_winkler_pairs(parts).collect()[0]
    assert r["n_matches"] == 3
    assert abs(r["jw_sim"] - 0.638889) < 1e-6


def test_kernel_rank_queries_ignore_null_values(spark):
    """A NULL-valued event must not shift N or the ranks: the Spark
    kernel would silently drop it at the bucket join while the
    DuckDB oracle's window counted it (review finding) — both sides
    now filter, so adding a NULL row changes nothing."""
    base = [
        (_day(1), "A", 0.01),
        (_day(1), "A", 0.02),
        (_day(1), "B", 0.03),
        (_day(1), "B", 0.04),
    ]
    with_null = base + [(_day(1), "B", None)]
    a = temporal.kruskal_wallis(_events(spark, base)).collect()[0]
    b = temporal.kruskal_wallis(_events(spark, with_null)).collect()[0]
    assert a == b
    qa = temporal.quartile_skew(
        _events(spark, [(_day(1), "purchase", v) for v in
                        (0.01, 0.02, 0.03, 0.04)] )
    ).collect()[0]
    qb = temporal.quartile_skew(
        _events(spark, [(_day(1), "purchase", v) for v in
                        (0.01, 0.02, 0.03, 0.04)]
                + [(_day(1), "purchase", None)])
    ).collect()[0]
    assert qa == qb


def test_partial_corr_deconfounds_common_driver(spark):
    """Clicks and purchases both scale with daily views (the common
    driver) but are perfectly ANTI-correlated within each traffic
    level: raw r_xy is strongly positive, yet controlling views
    flips the sign to r_partial = -1 — the textbook Simpson-style
    reversal the confounded flag exists to catch."""
    import itertools

    rows = []
    # views v drive both: x ~ v + noise_a, y ~ v + noise_b where the
    # noises alternate out of phase (conditionally unrelated)
    pattern = [(10, 3, 1), (10, 1, 3), (20, 6, 4), (20, 4, 6),
               (30, 9, 7), (30, 7, 9), (40, 12, 10), (40, 10, 12)]
    for day, (v, x, y) in enumerate(
        itertools.chain.from_iterable([pattern] * 2), start=1
    ):
        rows += [(_day(day), "view", 1.0)] * v
        rows += [(_day(day), "click", 1.0)] * x
        rows += [(_day(day), "purchase", 1.0)] * y
    r = temporal.partial_correlation(_events(spark, rows)).collect()[0]
    assert r["r_xy"] > 0.8           # confounded raw correlation
    assert r["r_partial"] < -0.9     # sign flips once views enter
    assert r["confounded"]
