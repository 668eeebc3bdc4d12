"""Regression pins for the round-5 advice fixes: multi-round
incremental k-truss (newly-dead retraction, not cumulative
re-subtraction), the changepoint two-tier exact quotient split,
the source-JSD rounded-share guard, and the betweenness-stability
small-graph guards (actual top-list sizes, null Pearson on zero
variance)."""

from __future__ import annotations

import pyspark.sql.functions as F

from big_data_instacart_market_basket_analysis_spark.operators import (
    dedup,
    glm,
    graph,
    profiling,
    sampling,
    temporal,
    textstats,
)


def _li(spark, rows):
    return spark.createDataFrame(rows, "l_orderkey long, l_partkey long")


def _clique_orders(spark, orders):
    rows = [(ok, p) for ok, parts in orders for p in parts]
    return _li(spark, rows)


def test_ktruss_multi_round_does_not_double_subtract(spark):
    """K4 {1,2,3,4} + pendant triangle {1,2,5}, k=4 (min_sup=2),
    rounds=3: round 1 peels 1-5/2-5 (support 1), killing triangle
    (1,2,5) and dropping edge 1-2 from 3 to 2; round 2 peels NOTHING
    — the pre-fix code re-subtracted the already-dead triangle's
    credit each later round, wrongly peeling 1-2 at round 2. The K4
    must survive intact (r5 advice, graph.py incremental peel)."""
    li = _clique_orders(spark, [(10, [1, 2, 3, 4]), (11, [1, 2, 5])])
    out = {
        (r["a"], r["b"]): (r["support0"], r["support_final"], r["in_truss"])
        for r in graph.ktruss_edges(li, k=4, rounds=3).collect()
    }
    assert out[(1, 2)] == (3, 2, 1)  # the double-subtraction victim
    for e in [(1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]:
        assert out[e] == (2, 2, 1)
    assert out[(1, 5)] == (1, 0, 0)
    assert out[(2, 5)] == (1, 0, 0)


def test_ktruss_cascade_peel_matches_recount(spark):
    """Triangle strip (1,2,3)(2,3,4)(3,4,5)(4,5,6), k=4, rounds=3:
    every edge dies — round 1 peels the support-1 boundary edges,
    which kills all four triangles, so round 2's recount support of
    the spine edges (23, 34, 45) is 0. The incremental retraction
    must reproduce the full cascade."""
    li = _clique_orders(
        spark,
        [(1, [1, 2, 3]), (2, [2, 3, 4]), (3, [3, 4, 5]), (4, [4, 5, 6])],
    )
    rows = graph.ktruss_edges(li, k=4, rounds=3).collect()
    assert all(r["in_truss"] == 0 for r in rows)
    sup0 = {(r["a"], r["b"]): r["support0"] for r in rows}
    assert sup0[(2, 3)] == 2 and sup0[(3, 4)] == 2 and sup0[(4, 5)] == 2


def test_changepoint_two_tier_decimal_split_is_exact(spark):
    """Decimal quotient/remainder (q = p div nn, r = p mod nn) is
    exact WHILE q fits 32 integral digits — p near 1e35 with an
    awkward modulus. (Round 7 found q NULLs past q ~ 1e32 — Spark
    decimal division keeps 32 integral digits — so changepoint's
    dominance test no longer divides by a column at all; see
    test_round7_fixes.test_changepoint_boundary_magnitude. This pin
    documents the semantics inside that cap.)"""
    df = spark.createDataFrame(
        [
            ("99999999999999999999999999999999999", "333333337"),
            ("10000000000000000000000000000000000", "999999999"),
            ("123456789012345678901234567890", "1048576"),
        ],
        "p string, nn string",
    ).select(
        F.col("p").cast("decimal(38,0)").alias("p"),
        F.col("nn").cast("decimal(38,0)").alias("nn"),
    )
    out = df.select(
        "p",
        "nn",
        (F.col("p") % F.col("nn")).alias("r"),
        ((F.col("p") - F.col("p") % F.col("nn")) / F.col("nn"))
        .cast("decimal(38,0)")
        .alias("q"),
    ).collect()
    for row in out:
        p, nn, q, r = int(row["p"]), int(row["nn"]), int(row["q"]), int(row["r"])
        assert q == p // nn and r == p % nn
        assert 0 <= r < nn


def test_source_jsd_sub_rounding_share_stays_finite(spark):
    """A source whose half-share is below 5e-7 rounds to p = 0.0
    while n > 0; the term must be exactly 0.0 (the 0*ln(0)
    convention), not null/-inf — the guard reads the ROUNDED share,
    which is what ln actually sees (r5 advice, textstats.py)."""
    docs = spark.range(5_000_002).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 2, F.lit("rare"))
        .otherwise(F.lit("common"))
        .alias("source"),
    )
    out = {
        r["source"]: r
        for r in textstats.source_jsd_report(docs).collect()
    }
    rare = out["rare"]
    # one doc per parity half -> share 4e-7 -> rounds to 0.0
    assert rare["n_ref"] == 1 and rare["n_cur"] == 1
    assert rare["p_ref"] == 0.0 and rare["p_cur"] == 0.0
    assert rare["jsd_term"] == 0.0  # finite, not null
    assert out["common"]["jsd_term"] is not None


def test_planboard_diff_gate_trips_on_global_window_regression():
    """The round-over-round ratchet (r5 verdict #2): reverting
    nb_pr_curve's bucketed prefix-sum back to an unpartitioned window
    (global_windows 0 -> 2) must FAIL the gate; a +3 shuffle jump is
    named but does not fail; decreases, removals and new queries
    pass."""
    old = {
        "nb_pr_curve": {"global_windows": 0, "shuffles": 4},
        "stratified_ate": {"global_windows": 0, "shuffles": 3},
        "parts_abc": {"global_windows": 1, "shuffles": 2},
        "gone_query": {"global_windows": 0, "shuffles": 1},
    }
    new = {
        "nb_pr_curve": {"global_windows": 2, "shuffles": 4},  # revert!
        "stratified_ate": {"global_windows": 0, "shuffles": 6},  # +3
        "parts_abc": {"global_windows": 0, "shuffles": 2},  # improved
        "new_query": {"global_windows": 0, "shuffles": 9},
    }
    d = profiling.planboard_diff(old, new)
    assert d["gate"] == "FAIL"
    assert d["global_window_increases"] == {"nb_pr_curve": [0, 2]}
    assert d["shuffle_jumps_flagged"] == {"stratified_ate": [3, 6]}
    assert d["added"] == ["new_query"] and d["removed"] == ["gone_query"]
    assert d["notes"]["global_windows_down"] == {"parts_abc": [1, 0]}

    # undo the revert -> the same board passes (jump still named)
    new["nb_pr_curve"]["global_windows"] = 0
    d2 = profiling.planboard_diff(old, new)
    assert d2["gate"] == "PASS"
    assert d2["shuffle_jumps_flagged"] == {"stratified_ate": [3, 6]}


def test_planboard_diff_gate_trips_on_new_error():
    """A query that starts erroring at plan-build time is a gate
    failure; one whose prior error is FIXED passes."""
    old = {
        "q_ok": {"global_windows": 0, "shuffles": 1},
        "q_was_broken": {"err": "AnalysisException: x"},
    }
    new_break = {
        "q_ok": {"err": "PySparkValueError: boom"},
        "q_was_broken": {"err": "AnalysisException: x"},
    }
    assert profiling.planboard_diff(old, new_break)["gate"] == "FAIL"
    new_fixed = {
        "q_ok": {"global_windows": 0, "shuffles": 1},
        "q_was_broken": {"global_windows": 0, "shuffles": 2},
    }
    d = profiling.planboard_diff(old, new_fixed)
    assert d["gate"] == "PASS"
    assert d["err_changes"] == {
        "q_was_broken": ["AnalysisException: x", None]
    }


def test_betweenness_pivot_policy_growth_law():
    """The documented K = max(4, ceil(4*log2|V|)) policy as code:
    fixture scale stays cheap, 100x scale grows logarithmically."""
    assert graph.recommended_pivots(1) == 4
    assert graph.recommended_pivots(16) == 16
    assert graph.recommended_pivots(2_000) == 44  # sf0.01 |V|
    assert graph.recommended_pivots(200_000) == 71  # 100x |V|
    assert graph.recommended_pivots(2_000_000) == 84


def test_betweenness_stability_clears_floor_on_structured_graph(spark):
    """Barbell (two 12-cliques joined through a bridge node): real
    brokerage structure. The two disjoint pivot runs must agree on
    the brokers — jaccard_topk above the trust floor (here exactly
    1.0: both top lists are precisely the three bridge-path nodes),
    demonstrating the floor is clearable when structure exists."""
    rows = (
        [(1, p) for p in range(1, 13)]
        + [(2, p) for p in range(101, 113)]
        + [(3, 12), (3, 50), (4, 50), (4, 101)]
    )
    li = _li(spark, rows)
    r = graph.betweenness_stability_eval(li).collect()[0]
    assert r["jaccard_topk"] >= graph.BETW_JACCARD_FLOOR
    assert r["n_top_overlap"] == 3  # nodes 12, 50, 101 — the bridge


def test_betweenness_stability_flags_flat_fixture_graph(spark):
    """The fixtures' co-purchase graph is uniform-random (flat
    betweenness truth): the eval must report agreement BELOW the
    trust floor — the honest 'do not act on this ranking at K=4'
    signal the scaling policy keys on."""
    from big_data_instacart_market_basket_analysis_spark.sources.loaders import (
        load_table,
    )

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    r = graph.betweenness_stability_eval(li).collect()[0]
    assert r["jaccard_topk"] is not None
    assert r["jaccard_topk"] < graph.BETW_JACCARD_FLOOR


def test_betweenness_stability_small_graph_guards(spark):
    """Path of 3 (only 3 nodes): set B's pivot ranks (K+1..2K) are
    empty, so the top-B list has 0 rows — Jaccard must use the
    ACTUAL list sizes (|A|+|B|-overlap = 1, not 2k), and Pearson
    must be null (no common scored nodes -> no defined correlation),
    not a division by zero (r5 advice, graph.py)."""
    li = _li(spark, [(1, 101), (1, 102), (2, 102), (2, 103)])
    r = graph.betweenness_stability_eval(li).collect()[0]
    assert r["n_common"] == 0
    assert r["n_top_overlap"] == 0
    assert r["jaccard_topk"] == 0.0  # 0 / (1 + 0 - 0), not 0/(2k-0)
    assert r["pearson_r"] is None


def test_retention_report_accounting_identities(spark):
    """Per source: kept + dropped == total for both docs and bytes;
    every cluster keeps exactly one member, so total kept across
    sources == number of clusters. Near-dup pair: doc 1 and 2 are
    95%-overlapping long texts (same source); doc 3 is unique."""
    base = " ".join("tok%d" % i for i in range(40))
    near = " ".join("tok%d" % i for i in range(38)) + " zzz yyy"
    uniq = " ".join("u%d" % i for i in range(40))
    docs = spark.createDataFrame(
        [
            (1, base, "en", "web", len(base)),
            (2, near, "en", "web", len(near)),
            (3, uniq, "en", "books", len(uniq)),
        ],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    rows = {r["source"]: r for r in dedup.retention_report(docs).collect()}
    for r in rows.values():
        assert r["n_kept"] + r["n_dropped"] == r["n_docs"]
        assert r["bytes_kept"] + r["bytes_dropped"] == r["bytes_total"]
        assert abs(r["keep_rate"] - r["n_kept"] / r["n_docs"]) < 1e-9
    assert rows["books"]["n_kept"] == 1 and rows["books"]["n_dropped"] == 0
    assert rows["web"]["n_docs"] == 2
    # docs 1 and 2 are near-dups -> one keeper, one dropped
    assert rows["web"]["n_kept"] == 1 and rows["web"]["n_dropped"] == 1


def test_erlang_blocking_hand_worked_and_monotone(spark):
    """48 orders on one day -> offered load a = 2 erlangs. Hand-worked
    J recursion: J0=1, J1=2+1=3, J2=4+2*3=10, J3=8+3*10=38 ->
    B = 2/3, 4/10, 8/38 -> 666666, 400000, 210526 ppm. Blocking must
    be strictly decreasing in servers (more agents, fewer lost
    calls)."""
    orders = spark.createDataFrame(
        [(i, "1995-01-01") for i in range(48)],
        "o_orderkey long, o_orderdate string",
    )
    rows = sorted(
        temporal.erlang_blocking_curve(orders).collect(),
        key=lambda r: r["servers"],
    )
    assert all(r["offered_load"] == 2 and r["capped"] == 0 for r in rows)
    ppm = [r["blocking_ppm"] for r in rows]
    assert ppm[0] == 666666 and ppm[1] == 400000 and ppm[2] == 210526
    assert all(a > b for a, b in zip(ppm, ppm[1:]))


def test_erlang_blocking_caps_and_flags_huge_load(spark):
    """12000 orders on one day -> a_raw = 500 > cap 400: the curve
    saturates at the cap and says so."""
    orders = spark.createDataFrame(
        [(i, "1995-01-01") for i in range(12_000)],
        "o_orderkey long, o_orderdate string",
    )
    rows = temporal.erlang_blocking_curve(orders).collect()
    assert all(r["offered_load"] == 400 and r["capped"] == 1 for r in rows)
    # at a=400 with <= 12 servers virtually everything blocks
    assert all(r["blocking_ppm"] > 900_000 for r in rows)


def test_wasserstein_hand_worked_shift(spark):
    """First half values {1.00, 2.00}, second half {2.00, 3.00}: the
    CDFs differ by 0.5 on [1,2) and 0.5 on [2,3) -> W1 = 1.00
    dollars exactly (a pure +1.00 location shift)."""
    rows = [
        ("2024-01-01 00:00:00", 1.0),
        ("2024-01-01 01:00:00", 2.0),
        ("2024-01-01 23:00:00", 2.0),
        ("2024-01-02 00:00:00", 3.0),
    ]
    events = spark.createDataFrame(
        rows, "ts string, value double"
    ).select(F.col("ts").cast("timestamp").alias("ts"), "value")
    r = temporal.wasserstein_drift(events).collect()[0]
    assert (r["n1"], r["n2"]) == (2, 2)
    assert r["w1_dollars"] == 1.0


def test_wasserstein_identical_halves_is_zero(spark):
    """Same distribution in both halves -> zero transport cost."""
    rows = [
        ("2024-01-01 00:00:00", 5.0),
        ("2024-01-01 01:00:00", 9.0),
        ("2024-01-01 23:00:00", 5.0),
        ("2024-01-02 00:00:00", 9.0),
    ]
    events = spark.createDataFrame(
        rows, "ts string, value double"
    ).select(F.col("ts").cast("timestamp").alias("ts"), "value")
    assert temporal.wasserstein_drift(events).collect()[0]["w1_dollars"] == 0.0


def test_pps_sample_hits_telescope_to_n(spark):
    """Madow systematic PPS: sum of hit counts telescopes to exactly
    n, and a unit holding > 2 skip intervals of mass is drawn >= 2
    times while tail units get at most ceil(share*n)+1."""
    rows = [(1, 900, 500.0)] + [
        (i, 900 + i, 5.0) for i in range(2, 102)
    ]
    li = spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_extendedprice double"
    )
    out = sampling.pps_systematic_sample(li, n=20).collect()
    assert sum(r["n_hits"] for r in out) == 20
    hits = {r["l_partkey"]: r["n_hits"] for r in out}
    # part 900 holds 50% of revenue -> ~10 of 20 draws
    assert hits[900] >= 9


def test_platt_calibration_is_monotone_and_bounded(spark):
    """Positive-slope fit: platt_rate must be strictly increasing in
    bin (sigmoid of an increasing line) and inside (0, 1)."""
    rows = []
    uid = 0
    # low-engagement users rarely convert, high-engagement often
    for b, (n, pos) in {0: (50, 5), 5: (40, 20), 15: (30, 27)}.items():
        for i in range(n):
            uid += 1
            for _ in range(b):
                rows.append((uid, "view", "2024-01-01 00:00:00"))
            rows.append(
                (uid, "purchase" if i < pos else "click",
                 "2024-01-01 01:00:00")
            )
    events = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string"
    ).select("user_id", "event_type",
             F.col("ts").cast("timestamp").alias("ts"))
    out = sorted(
        glm.platt_calibration(events).collect(), key=lambda r: r["bin"]
    )
    assert [r["bin"] for r in out] == [0, 5, 15]
    assert out[0]["a_hat"] > 0
    rates = [r["platt_rate"] for r in out]
    assert rates == sorted(rates) and rates[0] < rates[-1]
    assert all(0.0 < x < 1.0 for x in rates)


def test_cox_ph_positive_hazard_for_fast_converters(spark):
    """Hand-built survival data: high-engagement users purchase on
    day 1, low-engagement users purchase on day 20 or never
    (censored) -> the engagement coefficient must be positive (higher
    hazard of converting), the Newton score must shrink toward 0, and
    the hazard ratio must equal exp(beta) rounded the same way."""
    import math

    rows = []
    uid = 0
    for _ in range(30):  # fast converters: 7+ views, purchase day 1
        uid += 1
        rows += [(uid, "view", "2024-01-01 00:00:00")] * 7
        rows.append((uid, "purchase", "2024-01-02 00:00:00"))
    for i in range(30):  # slow: no views, purchase day 20 or censored
        uid += 1
        rows.append((uid, "click", "2024-01-01 00:00:00"))
        if i < 10:
            rows.append((uid, "purchase", "2024-01-21 00:00:00"))
        else:
            rows.append((uid, "click", "2024-01-25 00:00:00"))
    events = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string"
    ).select("user_id", "event_type",
             F.col("ts").cast("timestamp").alias("ts"))
    out = sorted(
        temporal.cox_ph_train(events).collect(), key=lambda r: r["round"]
    )
    last = out[-1]
    assert last["beta"] > 0
    assert abs(out[-1]["score_u"]) < abs(out[0]["score_u"])
    assert abs(
        last["hazard_ratio"] - round(math.exp(last["beta"]), 6)
    ) < 1e-9


def test_sprt_monitor_llr_and_boundaries(spark):
    """Day 1: 10 trials, 5 successes -> llr = 5*L1 + 5*L0 exactly;
    cumulative counts telescope across days; decision string follows
    the Wald boundaries."""
    rows = (
        [(i, "purchase", "2024-01-01 00:00:00") for i in range(5)]
        + [(i + 5, "click", "2024-01-01 00:00:00") for i in range(5)]
        + [(i + 10, "purchase", "2024-01-02 00:00:00") for i in range(3)]
    )
    events = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string"
    ).select("user_id", "event_type",
             F.col("ts").cast("timestamp").alias("ts"))
    out = {str(r["day"]): r for r in temporal.sprt_monitor(events).collect()}
    d1 = out["2024-01-01"]
    assert (d1["n_cum"], d1["s_cum"]) == (10, 5)
    expect = round(5 * temporal.SPRT_L1 + 5 * temporal.SPRT_L0, 6)
    assert abs(d1["llr"] - expect) < 1e-9
    d2 = out["2024-01-02"]
    assert (d2["n_cum"], d2["s_cum"]) == (13, 8)
    for r in out.values():
        raw = r["s_cum"] * temporal.SPRT_L1 + (
            r["n_cum"] - r["s_cum"]
        ) * temporal.SPRT_L0
        want = (
            "accept_h1" if raw >= temporal.SPRT_UPPER
            else "accept_h0" if raw <= temporal.SPRT_LOWER
            else "continue"
        )
        assert r["decision"] == want


def test_overdispersion_equidispersed_poisson_like(spark):
    """Counts {0,1,2} balanced: mean 1, variance 2/3 -> D < 1, z < 0,
    not overdispersed. A heavy-tail set {0,0,0,9} -> D >> 1."""
    rows = []
    uid = 0
    for c in (0, 1, 2) * 10:
        uid += 1
        rows.append((uid, "view", "2024-01-01 00:00:00"))
        rows += [(uid, "purchase", "2024-01-01 01:00:00")] * c
    events = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string"
    ).select("user_id", "event_type",
             F.col("ts").cast("timestamp").alias("ts"))
    r = temporal.overdispersion_test(events).collect()[0]
    assert r["n_users"] == 30
    assert abs(r["mean_count"] - 1.0) < 1e-9
    assert abs(r["var_count"] - round(20 / 29, 6)) < 1e-9
    assert not r["overdispersed"]

    rows2 = [(1, "view", "2024-01-01 00:00:00"),
             (2, "view", "2024-01-01 00:00:00"),
             (3, "view", "2024-01-01 00:00:00"),
             (4, "view", "2024-01-01 00:00:00")]
    rows2 += [(4, "purchase", "2024-01-01 01:00:00")] * 9
    events2 = spark.createDataFrame(
        rows2, "user_id long, event_type string, ts string"
    ).select("user_id", "event_type",
             F.col("ts").cast("timestamp").alias("ts"))
    r2 = temporal.overdispersion_test(events2).collect()[0]
    assert r2["dispersion_index"] > 5


def test_krippendorff_perfect_and_chance_agreement(spark):
    """All three raters agreeing on every doc -> alpha = 1 (zero
    observed disagreement). The exact-integer identity is pinned by
    recomputing alpha from the emitted integer tallies."""
    docs = spark.createDataFrame(
        [
            (1, " ".join(["w%d" % i for i in range(120)]), "en",
             "web", 800),
            (2, " ".join(["v%d" % i for i in range(120)]), "en",
             "web", 700),
            (3, "x", "en", "web", 2),
        ],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    r = textstats.krippendorff_alpha(docs).collect()[0]
    n, n1, dis = r["n_docs"], r["n_pos_votes"], r["disagree_pairs"]
    want = round(1.0 - (dis * (3 * n - 1)) / (2 * n1 * (3 * n - n1)), 6)
    assert abs(r["alpha"] - want) < 1e-9


def test_capture_recapture_chapman_identity(spark):
    """The Chapman estimate recomputes exactly from the emitted
    integer tallies, and union <= estimate (coverage <= 1 within
    rounding) whenever both detectors fire."""
    from big_data_instacart_market_basket_analysis_spark.operators import (
        dedup as _dd,
    )
    from big_data_instacart_market_basket_analysis_spark.sources.loaders import (
        load_table,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    r = _dd.capture_recapture_estimate(docs).collect()[0]
    n1, n2, m, u = (
        r["n_minhash"], r["n_simhash"], r["n_overlap"], r["n_union"]
    )
    assert u == n1 + n2 - m
    want = round((n1 + 1) * (n2 + 1) / (m + 1) - 1.0, 6)
    assert abs(r["n_est_total"] - want) < 1e-9
    assert r["n_est_total"] >= u - 1e-9  # can't estimate below seen


def test_abc_xyz_matrix_partitions_all_parts(spark):
    """Cell counts partition the catalog; a steady weekly demand
    series lands in X while a single-spike series lands in Z."""
    from big_data_instacart_market_basket_analysis_spark.operators import (
        analytics as _an,
    )

    li_rows, o_rows = [], []
    # part 1: qty 10 in each of 8 distinct weeks (CV = 0 -> X)
    days = ["1995-01-02", "1995-01-09", "1995-01-16", "1995-01-23",
            "1995-01-30", "1995-02-06", "1995-02-13", "1995-02-20"]
    for w, d in enumerate(days):
        li_rows.append((w, 1, 10, 100.0))
        o_rows.append((w, d))
    # part 2: one giant spike week (CV >> 1 -> Z), higher revenue
    li_rows.append((100, 2, 90, 3_000.0))
    o_rows.append((100, "1995-01-02"))
    li = spark.createDataFrame(
        li_rows,
        "l_orderkey long, l_partkey long, l_quantity long,"
        " l_extendedprice double",
    )
    orders = spark.createDataFrame(
        o_rows, "o_orderkey long, o_orderdate string"
    )
    cells = _an.abc_xyz_matrix(li, orders).collect()
    assert sum(c["n_parts"] for c in cells) == 2
    assert all(
        c["abc_class"] in "ABC" and c["xyz_class"] in "XYZ"
        for c in cells
    )
    by_qty = {c["qty_total"]: c for c in cells}
    assert by_qty[80]["xyz_class"] == "X"   # steady 10 x 8 weeks
    assert by_qty[90]["xyz_class"] == "Z"   # one spike in 8 weeks
    assert by_qty[90]["abc_class"] == "A"   # 79% of revenue
    assert by_qty[80]["abc_class"] == "C"   # the remaining tail


def test_median_ci_brackets_median_hand_worked(spark):
    """101 purchases valued 1..101 dollars: median = 51.00, and the
    normal-approx rank CI (ranks ~41..62) must bracket it with lo <
    med < hi; all ranks clamp inside [1, n]."""
    rows = [(i, "purchase", "2024-01-01 00:00:00", float(i))
            for i in range(1, 102)]
    events = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string, value double"
    ).select("user_id", "event_type",
             F.col("ts").cast("timestamp").alias("ts"), "value")
    r = temporal.median_ci(events).collect()[0]
    assert r["n"] == 101
    assert r["median_cents"] == 5100
    assert r["ci_lo_cents"] < 5100 < r["ci_hi_cents"]
    assert 1_00 <= r["ci_lo_cents"] and r["ci_hi_cents"] <= 101_00


def test_trend_test_detects_monotone_conversion(spark):
    """Conversion rising with engagement (10% at x=0, 90% at x=7)
    -> strongly positive z; flat conversion -> |z| near 0."""
    def mk(rates):
        rows, uid = [], 0
        for x, rate in rates.items():
            for i in range(40):
                uid += 1
                rows += [(uid, "view", "2024-01-01 00:00:00")] * x
                rows.append(
                    (uid,
                     "purchase" if i < int(rate * 40) else "click",
                     "2024-01-01 01:00:00"))
        return spark.createDataFrame(
            rows, "user_id long, event_type string, ts string"
        ).select("user_id", "event_type",
                 F.col("ts").cast("timestamp").alias("ts"))

    up = temporal.trend_test(mk({0: 0.1, 3: 0.5, 7: 0.9})).collect()[0]
    assert up["z_trend"] > 3 and up["increasing"]
    flat = temporal.trend_test(mk({0: 0.5, 3: 0.5, 7: 0.5})).collect()[0]
    assert abs(flat["z_trend"]) < 1


def test_chao1_identity_and_floor(spark):
    """chao1 >= vocab always; with text 'a a b' per doc repeated,
    singletons/doubletons tally exactly."""
    docs = spark.createDataFrame(
        [(1, "alpha alpha beta gamma", "en", "web", 20),
         (2, "alpha delta", "en", "web", 10)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    r = textstats.vocab_chao1(docs).collect()[0]
    # tokens: alpha x3, beta, gamma, delta -> V=4, f1=3, f2=0
    assert (r["n_tokens"], r["vocab"], r["f1"], r["f2"]) == (6, 4, 3, 0)
    assert abs(r["chao1_est"] - (4 + 3 * 2 / 2)) < 1e-9
    assert r["chao1_est"] >= r["vocab"]


def test_clustering_coef_triangle_plus_pendant(spark):
    """Triangle {1,2,3} + pendant edge 3-4: nodes 1,2 have c = 1
    (their 2 neighbors are connected), node 3 has c = 2*1/(3*2) =
    1/3; transitivity = 3*1/W with W = 1+1+3 = 5 wedges -> 0.6."""
    li = _clique_orders(spark, [(1, [1, 2, 3]), (2, [3, 4])])
    rows = {r["node"]: r for r in
            graph.clustering_coefficient(li).collect()}
    assert rows[1]["local_coef"] == 1.0
    assert rows[2]["local_coef"] == 1.0
    assert abs(rows[3]["local_coef"] - round(1 / 3, 6)) < 1e-9
    assert abs(rows[1]["global_transitivity"] - 0.6) < 1e-9
    assert 4 not in rows  # degree-1 pendant bears no triangle


def test_source_overlap_jaccard_hand_worked(spark):
    """web vocab {a,b,c}, books vocab {b,c,d}: shared 2, union 4 ->
    jaccard 0.5."""
    docs = spark.createDataFrame(
        [(1, "a b c", "en", "web", 5),
         (2, "b c d", "en", "books", 5),
         (3, "c b", "en", "books", 3)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    r = textstats.source_vocab_overlap(docs).collect()
    assert len(r) == 1
    row = r[0]
    assert (row["source_1"], row["source_2"]) == ("books", "web")
    assert (row["vocab_1"], row["vocab_2"], row["n_shared"]) == (3, 3, 2)
    assert row["jaccard"] == 0.5


def test_stream_sprt_equals_batch_last_day(spark):
    """Batch==stream duality: the streaming SPRT's final (n, s, llr,
    decision) must equal the batch daily monitor's last row at
    sf0.001."""
    from big_data_instacart_market_basket_analysis_spark.streaming import (
        events as _ev,
    )
    from big_data_instacart_market_basket_analysis_spark.sources.loaders import (
        load_table,
    )

    sf = "/root/testdata/sf0.001"
    st = _ev.run_stream_sprt(spark, sf).collect()[0]
    batch = max(
        temporal.sprt_monitor(load_table(spark, sf, "events")).collect(),
        key=lambda r: r["day"],
    )
    assert st["n_trials"] == batch["n_cum"]
    assert st["n_success"] == batch["s_cum"]
    assert abs(st["llr"] - batch["llr"]) < 1e-9
    assert st["decision"] == batch["decision"]


def test_betweenness_backward_staging_is_shared(spark):
    """r5 verdict #1 pin: the estimator and the stability eval's set
    A must ride the SAME session-staged backward-delta table — a
    second betweenness_approx call returns the cached DataFrame
    object, so the accumulation runs once per session."""
    from big_data_instacart_market_basket_analysis_spark.sources.loaders import (
        load_table,
    )

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    a = graph.betweenness_approx(li)
    b = graph.betweenness_approx(li)
    assert a is b
    assert (
        graph._betweenness_staged(li, graph.BETW_PIVOTS, graph.BETW_HOPS)
        is a
    )
