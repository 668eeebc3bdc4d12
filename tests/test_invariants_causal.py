"""Structural invariants for the causal / econometrics / survival
ladder (round-3 verdict #6): these operators were verified by DuckDB
hash only; here their outputs are checked against the MATH they claim
to implement — endpoint identities, cross-estimator consistency,
monotonicity — on the oracle fixture, independent of any oracle SQL.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from big_data_instacart_market_basket_analysis_spark.operators import (
    analytics as A,
    temporal as T,
)
from big_data_instacart_market_basket_analysis_spark.sources.loaders import (
    load_table,
)
from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF_ORACLE, "events")


@pytest.fixture(scope="module")
def lineitem(spark):
    return load_table(spark, SF_ORACLE, "lineitem")


def test_qini_endpoint_equals_overall_uplift(events):
    """The Qini curve's defining endpoint identity: at the last
    decile the cumulative statistic covers the WHOLE population, so
    qini_cum must equal CONV_T − CONV_C · N_T/N_C on the grand
    totals; per-row uplift must re-derive from the row's own cells;
    arm sizes must add up to the user population."""
    rows = sorted(
        T.qini_uplift(events).collect(), key=lambda r: r["decile"]
    )
    n_t = sum(r["n_t"] for r in rows)
    n_c = sum(r["n_c"] for r in rows)
    conv_t = sum(r["conv_t"] for r in rows)
    conv_c = sum(r["conv_c"] for r in rows)
    assert n_t + n_c == events.select("user_id").distinct().count()
    want_end = round(conv_t - conv_c * n_t / n_c, 6)
    assert abs(rows[-1]["qini_cum"] - want_end) <= 1e-9
    for r in rows:
        if r["n_t"] > 0 and r["n_c"] > 0:
            assert (
                abs(
                    r["uplift"]
                    - round(
                        r["conv_t"] / r["n_t"] - r["conv_c"] / r["n_c"],
                        6,
                    )
                )
                <= 1e-9
            )
        else:  # empty arm in a sparse decile: uplift is null, not 0
            assert r["uplift"] is None
        assert 0 <= r["conv_t"] <= r["n_t"]
        assert 0 <= r["conv_c"] <= r["n_c"]


def test_survival_estimators_share_risk_sets(events):
    """KM, Nelson-Aalen, and the log-rank test are three readouts of
    ONE censored-lifetime table: KM and NA must agree exactly on
    (t_days, n_risk, n_churned); NA's hazard/variance/survival columns
    must be monotone the way hazards are; the log-rank o1 (arm-1
    churn) can never exceed the pooled churn total, and its n_times
    equals the number of churn times both estimators report."""
    km = {
        r["t_days"]: (r["n_risk"], r["n_churned"])
        for r in T.km_survival(events).collect()
    }
    na_rows = sorted(
        T.nelson_aalen(events).collect(), key=lambda r: r["t_days"]
    )
    na = {r["t_days"]: (r["n_risk"], r["n_churned"]) for r in na_rows}
    assert km == na
    prev_h, prev_v, prev_s, prev_risk = -1.0, -1.0, 2.0, None
    for r in na_rows:
        assert r["cum_hazard"] >= prev_h
        assert r["var_hazard"] >= prev_v
        assert r["fh_survival"] <= prev_s + 1e-9
        # FH survival is exp(-H) of the UNROUNDED hazard; compare at
        # a tolerance that absorbs the 6-dp rounding of both columns
        assert abs(r["fh_survival"] - math.exp(-r["cum_hazard"])) < 1e-5
        if prev_risk is not None:
            assert r["n_risk"] < prev_risk
        prev_h, prev_v, prev_s = (
            r["cum_hazard"],
            r["var_hazard"],
            r["fh_survival"],
        )
        prev_risk = r["n_risk"]
    lr = T.logrank_test(events).collect()[0]
    pooled_churn = sum(v[1] for v in na.values())
    if lr["o1"] is None:  # fully censored fixture: no churn times
        assert pooled_churn == 0
    else:
        assert 0 <= lr["o1"] <= pooled_churn
    assert lr["n_times"] == sum(1 for v in na.values() if v[1] > 0)


def test_price_index_identities(lineitem):
    """Index-number theory on the report itself: the base month is 1
    by definition on all three indices; Fisher is the geometric mean
    of Laspeyres and Paasche everywhere; all indices are positive and
    no month matches more parts than the base basket has."""
    rows = sorted(
        A.price_index_report(lineitem).collect(),
        key=lambda r: r["month"],
    )
    base = rows[0]
    assert base["laspeyres"] == 1.0
    assert base["paasche"] == 1.0
    assert base["fisher"] == 1.0
    for r in rows:
        assert r["laspeyres"] > 0 and r["paasche"] > 0
        assert (
            abs(r["fisher"] - math.sqrt(r["laspeyres"] * r["paasche"]))
            < 5e-6
        )
        assert r["n_parts"] <= base["n_parts"]


def test_ipf_margins_converge_to_targets(events):
    """IPF's entire purpose: after the unrolled rounds the WEIGHTED
    margins match the targets (uniform over event types, 50/50 over
    variants). The variant dimension is scaled last, so its margins
    are exact to floor-division slack; the type margins must be
    within 1% relative error (2-dim IPF converges geometrically)."""
    rows = T.ipf_raking(events).collect()
    n = sum(r["n_obs"] for r in rows)
    types = {r["event_type"] for r in rows}
    w_tot = {}
    v_tot = {}
    for r in rows:
        wc = r["w_mill"] * r["n_obs"] / T.IPF_SCALE
        w_tot[r["event_type"]] = w_tot.get(r["event_type"], 0.0) + wc
        v_tot[r["variant"]] = v_tot.get(r["variant"], 0.0) + wc
    for v, tot in v_tot.items():
        assert abs(tot - n / 2) / (n / 2) < 1e-4, (v, tot, n / 2)
    for t, tot in w_tot.items():
        assert abs(tot - n / len(types)) / (n / len(types)) < 1e-2, (
            t,
            tot,
        )


def test_isotonic_fit_is_the_pav_solution(events):
    """PAV contract on the minimax-form fit: the calibrated rates are
    nondecreasing in the score bin, live in [0,1], preserve the total
    positive mass (the L2-projection property Σw·iso == Σw·y), and
    never pool ABOVE the running best raw rate prefix max... the
    simplest sharp check: iso equals raw rate wherever the raw curve
    is already locally monotone against both neighbors."""
    from big_data_instacart_market_basket_analysis_spark.operators import (
        glm as G,
    )

    rows = sorted(
        G.isotonic_calibration(events).collect(),
        key=lambda r: r["bin"],
    )
    assert rows, "empty calibration table"
    prev = -1.0
    for r in rows:
        assert 0.0 <= r["iso_rate"] <= 1.0
        assert r["iso_rate"] >= prev - 1e-9
        prev = r["iso_rate"]
    mass = sum(r["n_users"] * r["iso_rate"] for r in rows)
    pos = sum(r["n_pos"] for r in rows)
    assert abs(mass - pos) / max(pos, 1) < 1e-4
    # where raw is already isotone vs both neighbors AND iso agrees
    # with raw at the neighbors, the projection must keep the point
    for a, b, c in zip(rows, rows[1:], rows[2:]):
        if (
            a["rate"] <= b["rate"] <= c["rate"]
            and a["iso_rate"] == a["rate"]
            and c["iso_rate"] == c["rate"]
        ):
            assert abs(b["iso_rate"] - b["rate"]) < 1e-9


def test_obf_bounds_monotone_and_crossings_consistent(events):
    """O'Brien-Fleming boundaries SHRINK with information (that is
    what makes early peeks conservative); cumulative sample size is
    nondecreasing; the crossed flag is exactly |z| > bound; all
    looks are present."""
    rows = sorted(
        T.group_sequential_test(events).collect(),
        key=lambda r: r["look"],
    )
    assert [r["look"] for r in rows] == list(range(1, T.GS_LOOKS + 1))
    for a, b in zip(rows, rows[1:]):
        assert b["obf_bound"] < a["obf_bound"]
        assert b["n_cum"] >= a["n_cum"]
    for r in rows:
        assert r["crossed"] == (abs(r["z"]) > r["obf_bound"])
