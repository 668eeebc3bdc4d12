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
