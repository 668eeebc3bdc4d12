"""Regression pins for the round-6 advice fixes: the Jaro-Winkler
boost-threshold gate (boost only when base Jaro > 0.7), the
`value IS NOT NULL` filters on levene/tukey/jarque-bera, and the
mood-median upper-median convention for even n."""

from __future__ import annotations

import pyspark.sql.functions as F

from big_data_instacart_market_basket_analysis_spark.operators import (
    dedup,
    temporal,
)


def _part(spark, names):
    return spark.createDataFrame([(n,) for n in names], "p_name string")


def _events(spark, rows):
    """rows: (event_type, value) — the minimal shape the shape/scale
    test family reads."""
    return spark.createDataFrame(rows, "event_type string, value double")


def test_jw_boost_not_applied_below_threshold(spark):
    """'aa bcd' vs 'aa xyz': m=3 in-order matches, jaro = 2/3 <= 0.7,
    common prefix 'aa ' (3 chars). The pre-fix unconditional boost
    gave 0.766667; the gated textbook convention must return the
    bare jaro 0.666667."""
    out = {
        (r["name_a"], r["name_b"]): r["jw_sim"]
        for r in dedup.jaro_winkler_pairs(
            _part(spark, ["aa bcd", "aa xyz"])
        ).collect()
    }
    assert out[("aa bcd", "aa xyz")] == 0.666667


def test_jw_boost_applied_above_threshold(spark):
    """'aa bcde' vs 'aa bcdx': m=6, jaro = (6/7+6/7+1)/3 = 0.904762
    > 0.7, prefix 6 capped at 4 -> jw = jaro + 0.4*(1-jaro) =
    0.942857."""
    out = {
        (r["name_a"], r["name_b"]): r["jw_sim"]
        for r in dedup.jaro_winkler_pairs(
            _part(spark, ["aa bcde", "aa bcdx"])
        ).collect()
    }
    assert out[("aa bcde", "aa bcdx")] == 0.942857


def test_levene_ignores_null_values(spark):
    """Two NULL values must not inflate n/ng: n = 6, and the W stat
    equals the 6-row answer (NULLs previously biased the group
    means via count(*))."""
    rows = [
        ("view", 1.0),
        ("view", 2.0),
        ("view", 3.0),
        ("view", None),
        ("purchase", 10.0),
        ("purchase", 20.0),
        ("purchase", 30.0),
        ("purchase", None),
    ]
    got = temporal.levene_test(_events(spark, rows)).collect()[0]
    clean = temporal.levene_test(
        _events(spark, [r for r in rows if r[1] is not None])
    ).collect()[0]
    assert got["n"] == 6
    assert got.asDict() == clean.asDict()


def test_tukey_ignores_null_values(spark):
    rows = [
        ("view", 1.0),
        ("view", 2.0),
        ("view", None),
        ("purchase", 5.0),
        ("purchase", 9.0),
        ("purchase", None),
    ]
    got = temporal.tukey_hsd(_events(spark, rows)).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["n_a"], r["n_b"]) == (2, 2)
    # means from non-null rows only: |700 - 150| = 550 cents
    assert r["mean_diff_cents"] == 550.0


def test_jarque_bera_ignores_null_values(spark):
    rows = [
        ("purchase", 1.0),
        ("purchase", 2.0),
        ("purchase", 3.0),
        ("purchase", 10.0),
        ("purchase", None),
        ("view", 99.0),
    ]
    got = temporal.jarque_bera_test(_events(spark, rows)).collect()[0]
    clean = temporal.jarque_bera_test(
        _events(spark, [r for r in rows if r[1] is not None])
    ).collect()[0]
    assert got["n"] == 4
    assert got.asDict() == clean.asDict()


def test_mood_median_upper_median_for_even_n(spark):
    """Values {1,2,3,4}: the documented convention is the UPPER
    median for even n — the smallest value whose inclusive
    cumulative count reaches (n+1)/2 = 2.5, i.e. 3 (300 cents)."""
    rows = [
        ("view", 1.0),
        ("view", 2.0),
        ("purchase", 3.0),
        ("purchase", 4.0),
    ]
    got = temporal.mood_median_test(_events(spark, rows)).collect()[0]
    assert got["grand_median_cents"] == 300
    # the median row itself is tie-dropped
    assert got["n_ties_dropped"] == 1
    assert got["n_used"] == 3


def test_changepoint_boundary_magnitude(spark):
    """SCALE.md round-7 envelope pin: day sums ~3.6e18 cents push
    p = sum_l^2*n_r + sum_r^2*n_l to ~5.2e37 — the same decade as
    the DECIMAL(38,0) ceiling. The split must stay EXACT (argmax
    matches a Python-fractions brute force), not NULL-saturate."""
    from datetime import datetime
    from fractions import Fraction

    c = 100 * (1 << 52)  # cents per row: 25*2^54, double-exact
    val = float(1 << 52)  # dollars per row
    rows = []
    per_day = {1: 4, 2: 4, 3: 1, 4: 1}  # mean shift after day 2
    for day, k in per_day.items():
        for i in range(k):
            rows.append(
                (datetime(2024, 1, day, 8 + i), "purchase", val)
            )
    ev = spark.createDataFrame(
        rows, "ts timestamp, event_type string, value double"
    )
    got = temporal.changepoint_split(ev).collect()[0]

    sums = [per_day[d] * c for d in sorted(per_day)]
    n = len(sums)
    best_day, best_f = None, None
    for i in range(1, n):
        sl, sr = sum(sums[:i]), sum(sums[i:])
        nl, nr = i, n - i
        f = Fraction(sl * sl * nr + sr * sr * nl, nl * nr)
        if best_f is None or f > best_f:
            best_day, best_f = i, f
    assert got["split_day"].day == best_day
    assert got["sum_left_cents"] == sum(sums[:best_day])
    assert got["sum_right_cents"] == sum(sums[best_day:])
    # magnitude check: p ~ 2.8e37 (envelope decade), and the former
    # round-6 quotient q = p div nn ~ 6.9e36 is far past the 1e32
    # Spark decimal-division cap that NULLed it
    sl, sr = sum(sums[:2]), sum(sums[2:])
    p = sl * sl * 2 + sr * sr * 2
    assert p > 10**37
    assert p // 4 > 10**32


def test_ktruss_rounds3_e2e_matches_oracle_recount(spark):
    """r6 verdict task 4: the r5 double-subtraction bug was a
    rounds>=3 latent defect with only hand-worked unit pins — this
    runs the full incremental peel at rounds=3 against the oracle's
    per-round full RECOUNT on real fixture data, so any exactly-once
    retraction error at any round breaks the hash."""
    from big_data_instacart_market_basket_analysis_spark.operators import (
        graph,
    )
    from big_data_instacart_market_basket_analysis_spark.sources.loaders import (
        load_table,
    )
    from tests.oracle_harness import compare

    sf = "/root/testdata/sf0.001"
    li = load_table(spark, sf, "lineitem")
    df = graph.ktruss_edges(li, rounds=3)
    sql = (
        "WITH "
        + graph.oracle_ktruss(rounds=3)
        + "\nSELECT * FROM ktruss_edges"
    )
    res = compare(df, sql, sf)
    assert res["hash_match"], res


def test_bench_diff_gate_planted_regressions(tmp_path):
    """r6 verdict task 1 pin: a >1.5x AND >0.5s drift whose PLANBOARD
    stats are unchanged stays a named jitter FLAG (gate PASS); the
    same drift with a plan-stat change escalates to gate FAIL; small
    drifts are not flagged at all."""
    import json as _json

    import bench

    prev = tmp_path / "BENCH_DETAIL_r99.json"
    prev.write_text(
        _json.dumps(
            {"queries": {"q_jit": 1.0, "q_plan": 1.0, "q_ok": 1.0}}
        )
    )
    plans_old = {
        "plans": {
            "q_jit": {"rules": {}, "global_windows": 0, "shuffles": 3},
            "q_plan": {"rules": {}, "global_windows": 0, "shuffles": 3},
            "q_ok": {"rules": {}, "global_windows": 0, "shuffles": 3},
        }
    }
    plans_new = _json.loads(_json.dumps(plans_old))
    plans_new["plans"]["q_plan"]["shuffles"] = 9  # the plan regression

    cur = {"q_jit": 2.1, "q_plan": 2.1, "q_ok": 1.2}
    d = bench.bench_diff(
        cur,
        prev_path=str(prev),
        cur_board=plans_new,
        prev_board=plans_old,
    )
    assert d["gate"] == "FAIL"
    assert d["failed"] == ["q_plan"]
    assert d["flagged"]["q_jit"]["verdict"] == "jitter-flag"
    assert d["flagged"]["q_plan"]["verdict"] == "plan-regression"
    assert "q_ok" not in d["flagged"]

    # identical plans -> same drifts are flags only, gate PASS
    d2 = bench.bench_diff(
        cur,
        prev_path=str(prev),
        cur_board=plans_old,
        prev_board=plans_old,
    )
    assert d2["gate"] == "PASS"
    assert sorted(d2["flagged"]) == ["q_jit", "q_plan"]


def test_grubbs_tie_pair_consistency(spark):
    """Two days tie on |x*n - S| with values on opposite sides of the
    mean: the emitted (extreme_day, extreme_cents) must be ONE row's
    pair — day 1 with ITS OWN 500 cents, not day 2's smaller value
    (review finding: independent min(day)/min(x) mixed rows)."""
    from datetime import datetime

    from big_data_instacart_market_basket_analysis_spark.operators import (
        temporal,
    )

    ev = spark.createDataFrame(
        [
            (datetime(2024, 1, 1, 9), "purchase", 5.0),
            (datetime(2024, 1, 2, 9), "purchase", 1.0),
        ],
        "ts timestamp, event_type string, value double",
    )
    r = temporal.grubbs_extreme(ev).collect()[0]
    assert r["extreme_day"].day == 1
    assert r["extreme_cents"] == 500


def test_weibull_empty_series_returns_null_row(spark):
    """No purchase rows: the fold must not index element_at(s, 0)
    (Spark's sequence(1, 0) descends — review finding); the query
    returns a degenerate row instead of raising."""
    from datetime import datetime

    from big_data_instacart_market_basket_analysis_spark.operators import (
        temporal,
    )

    ev = spark.createDataFrame(
        [(datetime(2024, 1, 1, 9), "view", 1.0)],
        "ts timestamp, event_type string, value double",
    )
    rows = temporal.weibull_fit(ev).collect()
    assert len(rows) == 1
    assert rows[0]["n_days"] == 0
    assert rows[0]["shape"] is None


def test_ad_harmonic_closed_form_and_em_branch(spark):
    """g's closed form H2_N - 2*H_{N-1}/N - 1/N^2 equals the direct
    double sum (machine precision), and the operator crosses the
    512 exact/EM switch without a discontinuity visible at 6 dp:
    rank-invariance (scale both samples) holds on the EM branch
    (pooled N = 700 > 512)."""
    import math

    for N in (5, 17, 100, 700):
        H = [0.0] * N
        for i in range(1, N):
            H[i] = H[i - 1] + 1.0 / i
        direct = sum((H[N - 1] - H[i]) / (N - i) for i in range(1, N - 1))
        h2 = sum(1.0 / (i * i) for i in range(1, N + 1))
        hn1 = H[N - 1]
        closed = h2 - 2 * hn1 / N - 1.0 / (N * N)
        assert abs(direct - closed) < 1e-12, N

    from datetime import datetime, timedelta

    from big_data_instacart_market_basket_analysis_spark.operators import (
        temporal,
    )

    d0 = datetime(2024, 1, 1)

    def ev(xs, ys):
        rows = [
            (d0 + timedelta(minutes=i), "purchase", float(v))
            for i, v in enumerate(xs)
        ] + [
            (d0 + timedelta(minutes=i), "click", float(v))
            for i, v in enumerate(ys)
        ]
        return spark.createDataFrame(
            rows, "ts timestamp, event_type string, value double"
        )

    xs = [float(v % 31) for v in range(350)]
    ys = [float((v * 11) % 31) + 0.25 for v in range(350)]
    a = temporal.anderson_darling_2s(ev(xs, ys)).collect()[0]
    b = temporal.anderson_darling_2s(
        ev([2 * v for v in xs], [2 * v for v in ys])
    ).collect()[0]
    assert (a["n1"] + a["n2"]) == 700  # EM branch
    assert a["t_std"] == b["t_std"]
    assert a["t_std"] is not None


def test_bench_geomean_skips_zero_timings(tmp_path):
    """A zero-timed query must not dilute the geomean divisor
    (review finding): 2 real 2x drifts + 1 zero-timed -> geomean 2.0,
    not 1.59."""
    import json as _json

    import bench

    prev = tmp_path / "BENCH_DETAIL_r98.json"
    prev.write_text(
        _json.dumps({"queries": {"a": 1.0, "b": 1.0, "z": 0.0}})
    )
    d = bench.bench_diff(
        {"a": 2.0, "b": 2.0, "z": 0.5},
        prev_path=str(prev),
        cur_board={"plans": {}},
        prev_board={"plans": {}},
    )
    assert d["geomean_ratio"] == 2.0
