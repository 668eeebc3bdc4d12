"""Hand-worked invariant tests for the round-7 operator wave."""

from __future__ import annotations

import pyspark.sql.functions as F

from big_data_instacart_market_basket_analysis_spark.operators import (
    sampling,
    similarity,
)


def _emb(spark, vecs):
    """vecs: {vec_id: [floats]} -> embeddings-shaped frame."""
    return spark.createDataFrame(
        [(i, v) for i, v in sorted(vecs.items())],
        "vec_id long, embedding array<double>",
    )


def test_semantic_decontaminate_flags_planted_paraphrase(spark):
    """A training vector nearly parallel to a benchmark vector (the
    embedding of a paraphrased eval question — zero shared n-grams)
    must be flagged with cosine ~1; an orthogonal training vector in
    the same cell must not. All ids < 31 share the single stride
    centroid (vec 0), so cell confinement cannot hide the plant."""
    base = [1.0, 2.0, 3.0, 4.0]
    vecs = {0: [1.0, 0.0, 0.0, 0.0], 3: base}
    # benchmark filler (ids < 20) far from the plant
    for i in range(1, 20):
        if i != 3:
            vecs[i] = [0.0, 0.0, float(i % 3 == 0), 1.0 + i]
    vecs[25] = [1.01, 2.02, 3.03, 4.04]  # paraphrase of benchmark 3
    vecs[26] = [-4.0, 3.0, -2.0, 1.0]  # orthogonal to base
    out = {
        r["vec_id"]: r
        for r in similarity.semantic_decontaminate(
            _emb(spark, vecs), threshold=0.99
        ).collect()
    }
    assert 25 in out
    assert out[25]["max_cosine"] > 0.999
    assert 26 not in out


def test_semantic_decontaminate_excludes_benchmark_side(spark):
    """Benchmark vectors themselves (ids < n_bench) never appear as
    flagged training rows, even though they trivially self-match."""
    vecs = {i: [float(i + 1), 1.0] for i in range(40)}
    out = similarity.semantic_decontaminate(
        _emb(spark, vecs), threshold=0.0
    )
    ids = [r["vec_id"] for r in out.select("vec_id").collect()]
    assert ids and min(ids) >= similarity.N_BENCHMARK_VECS


def test_tablesample_fraction_and_determinism(spark):
    """Bernoulli keeps ~frac of rows (md5 is uniform); both variants
    are identical across reruns and plan shapes (no rand())."""
    n = 512 * 100  # 100 full blocks so the system draw has support
    ev = spark.range(n).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 97).alias("user_id"),
        F.lit("purchase").alias("event_type"),
        (F.col("id") % 13).cast("double").alias("value"),
    )
    out1 = sampling.tablesample_events(ev)
    counts = {
        r["method"]: r["n"]
        for r in out1.groupBy("method").agg(F.count("*").alias("n")).collect()
    }
    frac = sampling.TABLESAMPLE_FRAC
    # bernoulli: 51200 draws, sd ~ 0.13% of n. system: only 100
    # block-level draws, sd ~ 3 blocks -> inherently coarse (the
    # variance cost of page sampling that the docstring names).
    assert abs(counts["bernoulli"] / n - frac) < 0.02
    assert abs(counts["system"] / n - frac) < 0.10
    # system admits whole blocks: every sampled block is complete
    blocks = (
        sampling.tablesample_events(ev)
        .filter(F.col("method") == "system")
        .groupBy(
            F.expr(
                f"event_id div {sampling.TABLESAMPLE_BLOCK_ROWS}"
            ).alias("blk")
        )
        .agg(F.count("*").alias("c"))
        .collect()
    )
    assert blocks and all(
        r["c"] == sampling.TABLESAMPLE_BLOCK_ROWS for r in blocks
    )
    # determinism across a different physical plan (repartition)
    h1 = sorted(
        (r["method"], r["event_id"])
        for r in out1.select("method", "event_id").collect()
    )
    h2 = sorted(
        (r["method"], r["event_id"])
        for r in sampling.tablesample_events(ev.repartition(7))
        .select("method", "event_id")
        .collect()
    )
    assert h1 == h2


def _tev(spark, rows):
    """(ts, event_type, value) frame for the temporal family."""
    return spark.createDataFrame(
        rows, "ts timestamp, event_type string, value double"
    )


def _days(vals, typ="purchase"):
    from datetime import datetime, timedelta

    d0 = datetime(2024, 1, 1, 9)
    return [
        (d0 + timedelta(days=d), typ, float(v))
        for d, v in enumerate(vals)
    ]


def test_durbin_watson_hand_worked(spark):
    from big_data_instacart_market_basket_analysis_spark.operators import (
        temporal,
    )

    # alternating 1,3,1,3 dollars: num = 3*200^2, den = 4*100^2 -> 3.0
    r = temporal.durbin_watson(_tev(spark, _days([1, 3, 1, 3]))).collect()[0]
    assert r["dw"] == 3.0
    assert r["negative_autocorr"] and not r["positive_autocorr"]
    # monotone ramp 1..4: num = 3*100^2 = 30000, den = 50000 -> 0.6
    r = temporal.durbin_watson(_tev(spark, _days([1, 2, 3, 4]))).collect()[0]
    assert r["dw"] == 0.6
    assert r["positive_autocorr"] and not r["negative_autocorr"]


def test_grubbs_hand_worked(spark):
    from big_data_instacart_market_basket_analysis_spark.operators import (
        temporal,
    )

    # [1,1,1,10] dollars: maxdev day 4, g = 675/450 = 1.5
    r = temporal.grubbs_extreme(
        _tev(spark, _days([1, 1, 1, 10]))
    ).collect()[0]
    assert r["extreme_day"].day == 4
    assert r["extreme_cents"] == 1000
    assert r["g_stat"] == 1.5
    assert not r["exceeds_three_sigma"]


def test_brown_forsythe_identical_groups_homogeneous(spark):
    from big_data_instacart_market_basket_analysis_spark.operators import (
        temporal,
    )

    rows = []
    for t in ("view", "purchase"):
        rows += [(t, v) for v in (1.0, 2.0, 3.0, 4.0, 5.0)]
    r = temporal.brown_forsythe(
        spark.createDataFrame(rows, "event_type string, value double")
    ).collect()[0]
    assert r["f_stat"] == 0.0
    assert r["homogeneous"]


def test_brown_forsythe_scale_difference_flagged(spark):
    from big_data_instacart_market_basket_analysis_spark.operators import (
        temporal,
    )

    rows = [("view", float(v)) for v in (10, 10, 10, 10, 11)] + [
        ("purchase", float(v)) for v in (1, 500, 1, 500, 1000)
    ]
    r = temporal.brown_forsythe(
        spark.createDataFrame(rows, "event_type string, value double")
    ).collect()[0]
    assert r["f_stat"] > temporal.ANOVA_F_CRIT_05
    assert not r["homogeneous"]


def test_cliffs_delta_hand_worked(spark):
    from big_data_instacart_market_basket_analysis_spark.operators import (
        temporal,
    )

    def ev(purch, clicks):
        from datetime import datetime

        rows = [
            (datetime(2024, 1, 1, i), "purchase", float(v))
            for i, v in enumerate(purch)
        ] + [
            (datetime(2024, 1, 2, i), "click", float(v))
            for i, v in enumerate(clicks)
        ]
        return _tev(spark, rows)

    # complete separation -> delta 1, large
    r = temporal.cliffs_delta(ev([10, 20], [1, 2])).collect()[0]
    assert (r["n_gt"], r["n_lt"], r["n_tie"]) == (4, 0, 0)
    assert r["delta"] == 1.0 and r["magnitude"] == "large"
    # crossing pairs -> 0, negligible
    r = temporal.cliffs_delta(ev([5, 10], [1, 20])).collect()[0]
    assert (r["n_gt"], r["n_lt"]) == (2, 2)
    assert r["delta"] == 0.0 and r["magnitude"] == "negligible"
    # ties counted, excluded from both directions
    r = temporal.cliffs_delta(ev([5, 7], [5, 3])).collect()[0]
    assert r["n_tie"] == 1 and r["n_gt"] == 3 and r["n_lt"] == 0


def test_cochran_q_hand_worked_and_neutral_rows(spark):
    from datetime import datetime

    from big_data_instacart_market_basket_analysis_spark.operators import (
        temporal,
    )

    def ev(pairs):
        return spark.createDataFrame(
            [
                (datetime(2024, 1, 1, 9), u, t, 1.0)
                for u, t in pairs
            ],
            "ts timestamp, user_id long, event_type string, value double",
        )

    base = [(1, "a"), (1, "b"), (2, "a"), (3, "a"), (4, "b")]
    r = temporal.cochran_q(ev(base)).collect()[0]
    # C=(3,2), N=5, k=2, sumR2=7: Q = 2/6 = 0.333333
    assert r["q_stat"] == 0.333333
    assert (r["k"], r["n_users"], r["n_incidences"]) == (2, 4, 5)
    # an all-treatments user is Q-neutral
    r2 = temporal.cochran_q(
        ev(base + [(9, "a"), (9, "b")])
    ).collect()[0]
    assert r2["q_stat"] == r["q_stat"]


def test_page_trend_detects_monotone_cycle(spark):
    from big_data_instacart_market_basket_analysis_spark.operators import (
        temporal,
    )

    # two complete blocks, values strictly increasing with position:
    # L2 maximal = 560, E2 = 448, z = 112/sqrt(1045.33) = 3.464102
    vals = list(range(1, 8)) * 2
    r = temporal.page_trend(_tev(spark, _days(vals))).collect()[0]
    assert r["n_blocks"] == 2 and r["l2_stat"] == 560
    assert r["z"] > 3.4 and r["increasing"] and not r["decreasing"]
    # reversed cycle -> symmetric negative
    r2 = temporal.page_trend(
        _tev(spark, _days(list(range(7, 0, -1)) * 2))
    ).collect()[0]
    assert r2["z"] < -3.4 and r2["decreasing"]


def test_hurst_alternating_is_antipersistent(spark):
    from big_data_instacart_market_basket_analysis_spark.operators import (
        temporal,
    )

    vals = [1 if d % 2 == 0 else 3 for d in range(64)]
    r = temporal.hurst_exponent(_tev(spark, _days(vals))).collect()[0]
    assert r["n_days"] == 64 and r["n_points"] >= 2
    assert r["hurst"] < 0.5 and not r["persistent"]
    ramp = [float(d + 1) for d in range(64)]
    r2 = temporal.hurst_exponent(_tev(spark, _days(ramp))).collect()[0]
    assert r2["hurst"] > 0.5 and r2["persistent"]


def test_weibull_scale_equivariance(spark):
    from big_data_instacart_market_basket_analysis_spark.operators import (
        temporal,
    )

    vals = [2.0, 3.5, 5.0, 7.5, 11.0, 16.0, 23.0, 31.0]
    a = temporal.weibull_fit(_tev(spark, _days(vals))).collect()[0]
    b = temporal.weibull_fit(
        _tev(spark, _days([v * 3 for v in vals]))
    ).collect()[0]
    # multiplying the data by c leaves shape invariant, scales scale
    assert abs(a["shape"] - b["shape"]) < 1e-4
    assert abs(b["scale_cents"] / a["scale_cents"] - 3.0) < 1e-3
    assert 0.0 < a["r2"] <= 1.0


def _li(spark, rows):
    return spark.createDataFrame(rows, "l_orderkey long, l_partkey long")


def test_assortativity_star_is_disassortative(spark):
    """A star K1,4 (hub 1 + leaves 2..5, from 4 two-item orders) has
    r < 0 (degree-1 leaves attach only to the degree-4 hub); a clean
    4-cycle-free regular graph (one 4-clique) gives den = 0 -> NULL
    (zero degree variance — Newman's r undefined)."""
    from big_data_instacart_market_basket_analysis_spark.operators import (
        graph,
    )

    star = _li(
        spark, [(o, p) for o, pair in enumerate([(1, 2), (1, 3), (1, 4), (1, 5)]) for p in pair]
    )
    r = graph.degree_assortativity(star).collect()[0]
    assert r["n_edges"] == 8  # 4 undirected edges, both orientations
    assert r["assortativity"] == -1.0 and not r["assortative"]
    clique = _li(spark, [(99, p) for p in (1, 2, 3, 4)])
    r2 = graph.degree_assortativity(clique).collect()[0]
    assert r2["assortativity"] is None


def test_adamic_adar_hand_worked(spark):
    """Path seed(100)-z-cand with deg(z)=2: the seed's only
    non-adjacent 2-hop candidate gets aa = floor(1e6/ln 2) from the
    single common neighbor."""
    import math

    from big_data_instacart_market_basket_analysis_spark.operators import (
        graph,
    )

    li = _li(spark, [(1, 100), (1, 7), (2, 7), (2, 9)])
    out = {
        (r["seed"], r["cand"]): r
        for r in graph.adamic_adar_prediction(li).collect()
    }
    row = out[(100, 9)]
    assert row["cn"] == 1
    assert row["aa_micros"] == math.floor(1_000_000 / math.log(2))


def test_nation_rca_shares_multiply_to_one(spark):
    """Sanity on fixture data: sum over the grid of
    rev_cents == total, and a cell's specialized flag agrees with
    rca > 1 after rounding."""
    from big_data_instacart_market_basket_analysis_spark.operators import (
        analytics,
    )
    from big_data_instacart_market_basket_analysis_spark.sources.loaders import (
        load_table,
    )

    sf = "/root/testdata/sf0.001"
    out = analytics.nation_rca(
        load_table(spark, sf, "lineitem"),
        load_table(spark, sf, "supplier"),
        load_table(spark, sf, "nation"),
        load_table(spark, sf, "part"),
    ).collect()
    assert out
    for r in out:
        if r["rca"] is not None and abs(r["rca"] - 1.0) > 1e-9:
            assert r["specialized"] == (r["rca"] > 1.0), r


def test_systematic_sample_exact_size_and_spacing(spark):
    from big_data_instacart_market_basket_analysis_spark.operators import (
        sampling,
    )

    docs = spark.range(101).select(
        F.col("id").alias("doc_id"), F.lit("t").alias("text")
    )
    out = sampling.systematic_sample(docs).collect()
    # ceil(101/10) = 11 rows, positions 1, 11, ..., 101
    assert len(out) == 11
    assert sorted(r["global_pos"] for r in out) == list(range(1, 102, 10))


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_bleu_hand_worked(spark):
    """ref(0)='a b c d', cand(1)='a b c x': p1=3/4, p2=2/3,
    bp=1 (equal length), bleu2=sqrt(0.5)=0.707107. Identical pair
    (2,3) scores 1.0. Short candidate gets bp<1."""
    import math

    from big_data_instacart_market_basket_analysis_spark.operators import (
        textstats,
    )

    out = {
        (r["ref_id"], r["cand_id"]): r
        for r in textstats.bleu_pairs(
            _docs_df(
                spark,
                ["a b c d", "a b c x", "p q r", "p q r", "m n o p", "m n"],
            )
        ).collect()
    }
    r = out[(0, 1)]
    assert (r["p1"], r["p2"]) == (0.75, 0.666667)
    assert r["bp"] == 1.0
    assert r["bleu2"] == round(math.sqrt(0.75 * (2 / 3)), 6)
    assert out[(2, 3)]["bleu2"] == 1.0
    r = out[(4, 5)]
    assert r["bp"] == round(math.exp(1 - 4 / 2), 6)


def test_lexical_diversity_hand_worked(spark):
    import math

    from big_data_instacart_market_basket_analysis_spark.operators import (
        textstats,
    )

    out = {
        r["doc_id"]: r
        for r in textstats.lexical_diversity(
            _docs_df(spark, ["a b a b a", "x y z", "solo"])
        ).collect()
    }
    assert out[0]["n_tokens"] == 5 and out[0]["n_types"] == 2
    assert out[0]["ttr"] == 0.4
    assert out[0]["rttr"] == round(2 / math.sqrt(5), 6)
    assert out[0]["maas"] == round(
        (math.log(5) - math.log(2)) / math.log(5) ** 2, 6
    )
    assert out[1]["ttr"] == 1.0
    assert out[2]["maas"] is None  # N = 1: ln(1) denominator


def test_pchart_flags_blowup_day(spark):
    from big_data_instacart_market_basket_analysis_spark.operators import (
        temporal,
    )

    # 9 calm days: 1 error in 50; day 10: 30 errors in 50
    rows = []
    from datetime import datetime, timedelta

    d0 = datetime(2024, 3, 1, 8)
    for d in range(10):
        n_err = 30 if d == 9 else 1
        for i in range(50):
            rows.append(
                (
                    d0 + timedelta(days=d, minutes=i),
                    "error" if i < n_err else "view",
                    1.0,
                )
            )
    out = {
        r["day"].day: r
        for r in temporal.error_pchart(_tev(spark, rows)).collect()
    }
    assert not out[1]["out_of_control"]
    assert out[10]["out_of_control"] and out[10]["p"] == 0.6


def test_cluster_sample_admits_whole_sources(spark):
    from big_data_instacart_market_basket_analysis_spark.operators import (
        sampling,
    )

    docs = spark.createDataFrame(
        [(i, "t", f"src{i % 7}") for i in range(70)],
        "doc_id long, text string, source string",
    )
    out = sampling.cluster_sample(docs).collect()
    assert out
    kept = {r["source"] for r in out}
    per_src = {}
    for r in out:
        per_src[r["source"]] = per_src.get(r["source"], 0) + 1
    # every admitted cluster is complete (10 docs per source)
    assert all(v == 10 for v in per_src.values())
    assert 0 < len(kept) < 7


def test_ks_exponential_rejects_constant_gaps(spark):
    """Perfectly regular arrivals (constant gap) are maximally
    non-exponential: the ECDF is a single step at the mean, so
    D = 1 - 1/e at the jump's left side -> reject. n = 200 gaps."""
    from datetime import datetime, timedelta

    from big_data_instacart_market_basket_analysis_spark.operators import (
        temporal,
    )

    d0 = datetime(2024, 1, 1)
    rows = [
        (d0 + timedelta(seconds=10 * i), "view", 1.0, 1, i)
        for i in range(201)
    ]
    ev = spark.createDataFrame(
        rows,
        "ts timestamp, event_type string, value double,"
        " user_id long, event_id long",
    )
    r = temporal.ks_exponential(ev).collect()[0]
    assert r["n_gaps"] == 200
    assert r["mean_gap_ms"] == 10000.0
    # D = max(|1 - (1-e^-1)|, |0 - (1-e^-1)|) = 1 - 1/e = 0.632121
    assert r["d_stat"] == 0.632121
    assert r["reject"]


def test_bartlett_and_welch_on_equal_vs_unequal_groups(spark):
    """Identical groups: Bartlett T = 0, Welch F = 0 (equal means).
    Groups with equal means but wildly different spread: Bartlett
    fires, Welch does not (it tests LOCATION under heteroscedasticity
    — exactly the division of labor the ladder documents)."""
    from big_data_instacart_market_basket_analysis_spark.operators import (
        temporal,
    )

    same = []
    for t in ("view", "purchase"):
        same += [(t, float(v)) for v in (1, 2, 3, 4, 5)]
    df = spark.createDataFrame(same, "event_type string, value double")
    b = temporal.bartlett_test(df).collect()[0]
    w = temporal.welch_anova(df).collect()[0]
    assert b["t_stat"] == 0.0 and not b["significant"]
    assert w["f_stat"] == 0.0 and not w["significant"]

    # equal means (30), very different variances, n = 12 per group
    tight = [("view", 30.0 + 0.1 * ((-1) ** i)) for i in range(12)]
    wide = [("purchase", 30.0 + 25.0 * ((-1) ** i)) for i in range(12)]
    df2 = spark.createDataFrame(
        tight + wide, "event_type string, value double"
    )
    b2 = temporal.bartlett_test(df2).collect()[0]
    w2 = temporal.welch_anova(df2).collect()[0]
    assert b2["significant"]
    assert w2["f_stat"] == 0.0 and not w2["significant"]


def test_rayleigh_concentrated_vs_uniform(spark):
    from datetime import datetime, timedelta

    from big_data_instacart_market_basket_analysis_spark.operators import (
        temporal,
    )

    d0 = datetime(2024, 1, 1, 0)
    # all purchases at hour 14 -> r_bar = 1, mean_hour = 14, reject
    conc = [
        (d0 + timedelta(days=i, hours=14), "purchase", 1.0)
        for i in range(50)
    ]
    r = temporal.rayleigh_hour(_tev(spark, conc)).collect()[0]
    assert r["r_bar"] == 1.0 and r["mean_hour"] == 14.0
    assert r["nonuniform"]
    # perfectly balanced over all 24 hours -> resultant ~0, keep null
    unif = [
        (d0 + timedelta(days=i, hours=h), "purchase", 1.0)
        for i in range(5)
        for h in range(24)
    ]
    r2 = temporal.rayleigh_hour(_tev(spark, unif)).collect()[0]
    assert r2["r_bar"] < 1e-9 and not r2["nonuniform"]


def test_cdc_shift_resistance(spark):
    """The CDC property: prepending a paragraph to a long doc leaves
    the tail chunks identical, so the two versions dedup at the
    chunk level far better than fixed blocks would — here: the
    2-doc corpus's unique chars are well under the total."""
    from big_data_instacart_market_basket_analysis_spark.operators import (
        dedup,
    )

    import random

    rng = random.Random(7)
    body = " ".join(
        "".join(rng.choice("abcdefgh") for _ in range(5))
        for _ in range(400)
    )
    docs = spark.createDataFrame(
        [(0, body), (1, "PREFIX INSERTED HERE " + body)],
        "doc_id long, text string",
    )
    r = dedup.cdc_chunk_report(docs).collect()[0]
    assert r["n_docs"] == 2
    assert r["total_chars"] == len(body) * 2 + len("PREFIX INSERTED HERE ")
    # most of the duplicated body dedups away
    assert r["savings_ratio"] > 0.4


def test_join_order_advisor_ranks_cartesian_last(spark):
    from big_data_instacart_market_basket_analysis_spark.operators import (
        profiling,
    )
    from big_data_instacart_market_basket_analysis_spark.sources.loaders import (
        load_table,
    )

    sf = "/root/testdata/sf0.001"
    out = {
        r["perm"]: r
        for r in profiling.join_order_advisor(
            load_table(spark, sf, "customer"),
            load_table(spark, sf, "orders"),
            load_table(spark, sf, "lineitem"),
        ).collect()
    }
    assert len(out) == 6
    # the two Cartesian-leading plans must be the two worst
    worst = sorted(out.values(), key=lambda r: r["rank"])[-2:]
    assert {r["perm"] for r in worst} == {"C*L*O", "L*C*O"}
    # symmetric first joins tie on cost
    assert out["C*O*L"]["est_cost"] == out["O*C*L"]["est_cost"]


def test_aqp_estimate_close_and_bounded(spark):
    from big_data_instacart_market_basket_analysis_spark.operators import (
        profiling,
    )
    from big_data_instacart_market_basket_analysis_spark.sources.loaders import (
        load_table,
    )

    r = profiling.aqp_revenue(
        load_table(spark, "/root/testdata/sf0.01", "events")
    ).collect()[0]
    assert 0 < r["n_sample"] < r["n_rows"]
    # 10% md5 draw: sample fraction within 3 sd of 0.1
    import math

    sd = math.sqrt(0.1 * 0.9 / r["n_rows"])
    assert abs(r["n_sample"] / r["n_rows"] - 0.1) < 3 * sd + 0.01
    assert abs(r["rel_error"]) < 0.2
    assert r["within_ci"]


def _two_sample_ev(spark, xs, ys):
    from datetime import datetime, timedelta

    d0 = datetime(2024, 1, 1)
    rows = [
        (d0 + timedelta(minutes=i), "purchase", float(v))
        for i, v in enumerate(xs)
    ] + [
        (d0 + timedelta(minutes=i), "click", float(v))
        for i, v in enumerate(ys)
    ]
    return _tev(spark, rows)


def test_cvm_zero_on_identical_rejects_shifted(spark):
    from big_data_instacart_market_basket_analysis_spark.operators import (
        temporal,
    )

    xs = [float(v % 37) for v in range(300)]
    same = temporal.cramer_von_mises(
        _two_sample_ev(spark, xs, xs)
    ).collect()[0]
    assert same["t_stat"] == 0.0 and not same["significant"]
    shifted = temporal.cramer_von_mises(
        _two_sample_ev(spark, xs, [v + 100 for v in xs])
    ).collect()[0]
    assert shifted["significant"] and shifted["t_stat"] > 1


def test_anderson_darling_rank_invariance_and_power(spark):
    from big_data_instacart_market_basket_analysis_spark.operators import (
        temporal,
    )

    xs = [float(v % 41) for v in range(250)]
    ys = [float((v * 7) % 41) + 0.5 for v in range(250)]
    base = temporal.anderson_darling_2s(
        _two_sample_ev(spark, xs, ys)
    ).collect()[0]
    # rank statistic: scaling both samples by 3 changes nothing
    scaled = temporal.anderson_darling_2s(
        _two_sample_ev(
            spark, [3 * v for v in xs], [3 * v for v in ys]
        )
    ).collect()[0]
    assert base["a2_stat"] == scaled["a2_stat"]
    assert base["t_std"] == scaled["t_std"]
    # clear location shift rejects; identical samples do not
    shifted = temporal.anderson_darling_2s(
        _two_sample_ev(spark, xs, [v + 100 for v in xs])
    ).collect()[0]
    assert shifted["significant"]
    same = temporal.anderson_darling_2s(
        _two_sample_ev(spark, xs, xs)
    ).collect()[0]
    assert not same["significant"]


def test_cochran_q_matches_textbook_form(spark):
    """Independent-algebra cross-check: the operator's k-scaled
    integer form must equal the textbook
    Q = k(k-1) sum (C_t - N/k)^2 / (k sum R - sum R^2) computed
    directly in Python floats on a messy synthetic incidence set."""
    from datetime import datetime

    from big_data_instacart_market_basket_analysis_spark.operators import (
        temporal,
    )

    import random

    rng = random.Random(3)
    types = ["a", "b", "c"]
    pairs = set()
    for u in range(40):
        for t in types:
            if rng.random() < (0.2 + 0.2 * types.index(t)):
                pairs.add((u, t))
    pairs = sorted(pairs)
    ev = spark.createDataFrame(
        [(datetime(2024, 1, 1, 8), u, t, 1.0) for u, t in pairs],
        "ts timestamp, user_id long, event_type string, value double",
    )
    got = temporal.cochran_q(ev).collect()[0]

    k = len({t for _, t in pairs})
    cts = {t: sum(1 for _, x in pairs if x == t) for t in types}
    rus = {}
    for u, _ in pairs:
        rus[u] = rus.get(u, 0) + 1
    n = sum(cts.values())
    num = k * (k - 1) * sum((c - n / k) ** 2 for c in cts.values() if c)
    den = k * sum(rus.values()) - sum(r * r for r in rus.values())
    expect = num / den
    assert abs(got["q_stat"] - round(expect, 6)) < 2e-6


def test_weibull_recovers_planted_shape(spark):
    """Statistical validity: day values generated from the exact
    Weibull inverse CDF at the Bernard plotting positions make the
    regression EXACT — shape and scale recovered, r2 = 1."""
    import math

    from big_data_instacart_market_basket_analysis_spark.operators import (
        temporal,
    )

    k_true, lam_cents = 1.7, 50_000.0
    n = 40
    vals = []
    for i in range(1, n + 1):
        f = (i - 0.3) / (n + 0.4)
        x_cents = lam_cents * (-math.log(1 - f)) ** (1 / k_true)
        vals.append(round(x_cents) / 100.0)  # dollars, cent grid
    r = temporal.weibull_fit(_tev(spark, _days(vals))).collect()[0]
    assert abs(r["shape"] - k_true) < 0.02
    assert abs(r["scale_cents"] / lam_cents - 1) < 0.02
    assert r["r2"] > 0.999


def test_durbin_watson_range_and_white_noise(spark):
    """DW lives in [0, 4]; a fixed 'white-ish' series lands in the
    no-autocorrelation band (neither flag fires)."""
    from big_data_instacart_market_basket_analysis_spark.operators import (
        temporal,
    )

    import random

    rng = random.Random(11)
    vals = [rng.uniform(10, 20) for _ in range(80)]
    r = temporal.durbin_watson(_tev(spark, _days(vals))).collect()[0]
    assert 0.0 <= r["dw"] <= 4.0
    assert not r["positive_autocorr"] and not r["negative_autocorr"]


def test_two_sample_family_agrees_on_strong_shift(spark):
    """KS-free coherence check: CvM, AD and Cliff's delta must all
    call a 100-unit location shift (n=m=200) — the family's members
    may disagree on subtle shapes, never on this."""
    from big_data_instacart_market_basket_analysis_spark.operators import (
        temporal,
    )

    xs = [float(v % 29) for v in range(200)]
    ys = [v + 100 for v in xs]
    ev = _two_sample_ev(spark, xs, ys)
    assert temporal.cramer_von_mises(ev).collect()[0]["significant"]
    assert temporal.anderson_darling_2s(ev).collect()[0]["significant"]
    d = temporal.cliffs_delta(ev).collect()[0]
    assert d["delta"] == -1.0 and d["magnitude"] == "large"
