"""Round-9 operator units: the unigram-LM tokenizer family
(r8 verdict task 7) on planted corpora with hand-worked expectations.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_instacart_market_basket_analysis_spark.operators import (
    textstats,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "s") for i, t in enumerate(texts)],
        "doc_id bigint, text string, lang string, source string",
    )


def test_viterbi_prefers_high_probability_pieces(spark):
    words = spark.createDataFrame(
        [("abcd", 1)], "w string, freq bigint"
    )
    vocab = [("ab", 0.3), ("cd", 0.3), ("abc", 0.05),
             ("a", 0.1), ("b", 0.1), ("c", 0.1), ("d", 0.05)]
    segs = textstats._unigram_viterbi_segs(words, vocab).collect()
    # ab|cd (0.09) beats abc|d (0.0025) and all char splits
    assert segs[0]["segs"] == ["ab", "cd"]


def test_viterbi_tiebreak_is_deterministic(spark):
    """'aaa' with p(a)=p(aa): [a,aa] and [aa,a] tie on probability AND
    piece count; the segmentation-string order picks 'a aa'."""
    words = spark.createDataFrame([("aaa", 1)], "w string, freq bigint")
    vocab = [("a", 0.2), ("aa", 0.2)]
    segs = textstats._unigram_viterbi_segs(words, vocab).collect()
    assert segs[0]["segs"] == ["a", "aa"]


def test_viterbi_single_char_coverage(spark):
    """A word with a character that has zero-probability pieces only
    still segments (coverage guarantee: ties broken by count/order)."""
    words = spark.createDataFrame([("xy", 1)], "w string, freq bigint")
    vocab = [("x", 0.0), ("y", 0.5)]
    segs = textstats._unigram_viterbi_segs(words, vocab).collect()
    assert segs[0]["segs"] == ["x", "y"]


def test_unigram_train_planted_corpus(spark):
    """Corpus dominated by 'abab': the trainer must keep 'abab'-family
    pieces; every single char survives pruning; ranks are total."""
    docs = _docs(spark, ["abab abab abab ab", "abab cd cd", "q"])
    out = textstats.unigram_train(docs).collect()
    pieces = {r["piece"]: r for r in out}
    # all chars present in the corpus survive (coverage guarantee)
    for ch in "abcdq":
        assert ch in pieces, ch
    # the dominant word itself is a piece (length <= UNIGRAM_PIECE_MAX)
    assert "abab" in pieces
    # abab segments as one piece -> its recount is >= its word freq (4)
    assert pieces["abab"]["cnt"] >= 4
    ranks = [r["rank"] for r in sorted(out, key=lambda r: r["rank"])]
    assert ranks == list(range(1, len(out) + 1))
    # probs sum to ~1 over the inventory
    assert abs(sum(r["prob"] for r in out) - 1.0) < 1e-3


def test_unigram_fertility_planted(spark):
    """Two languages with different compressibility: the 'en' docs are
    one repeated 4-char word (1 piece/word once learned), the 'xx'
    docs are incompressible 1-char words (1 piece/word, 1 char each)
    — fertility 1.0 for both, chars_per_token 4 vs 1."""
    rows = [(1, "abab abab abab abab", "en", "s"),
            (2, "abab abab", "en", "s"),
            (3, "z z z z", "xx", "s")]
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    )
    out = {r["lang"]: r for r in
           textstats.unigram_fertility(docs).collect()}
    assert out["en"]["total_words"] == 6
    assert out["en"]["fertility"] == 1.0
    assert out["en"]["chars_per_token"] == 4.0
    assert out["xx"]["fertility"] == 1.0
    assert out["xx"]["chars_per_token"] == 1.0


def test_unigram_train_matches_oracle_on_planted(spark, tmp_path):
    """Full engine-vs-DuckDB differential on a tiny planted corpus —
    the same compare the driver runs, but on a corpus small enough to
    hand-audit."""
    import duckdb

    docs = _docs(spark, ["hello hello world", "hell hello he",
                         "world word or ld"])
    pq = str(tmp_path / "documents.parquet")
    docs.coalesce(1).write.mode("overwrite").parquet(pq)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{pq}/*.parquet'"
    )
    import __spark_entry__ as e

    sql = e.oracle_sql()["text_unigram_lm"]
    oracle = con.execute(sql).fetchall()
    got = [
        (r["rank"], r["piece"], r["piece_len"], r["cnt"],
         round(r["prob"], 6))
        for r in textstats.unigram_train(docs).collect()
    ]
    want = [(a, b, c, d, round(p, 6)) for a, b, c, d, p in oracle]
    assert sorted(got) == sorted(want)


# ------------------------------------------------------------------ r9 stats


from datetime import datetime

from big_data_instacart_market_basket_analysis_spark.operators import (
    temporal as T,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, event_type string,"
        " value double"
    )


def test_cramers_v_perfect_association(spark):
    """Each type occurs on exactly one dow -> V = 1.0 (2x2)."""
    mon, tue = datetime(2024, 1, 1, 10), datetime(2024, 1, 2, 10)
    rows = [(i, mon, "click", 1.0) for i in range(20)] + [
        (100 + i, tue, "purchase", 1.0) for i in range(20)
    ]
    r = T.cramers_v(_ev(spark, rows)).collect()[0]
    assert r["cramers_v"] == 1.0 and r["effect"] == "large"
    assert r["n_rows"] == 2 and r["n_cols"] == 2 and r["dof"] == 1


def test_cramers_v_independence(spark):
    """Uniform type x dow grid -> chi2 = 0, V = 0."""
    mon, tue = datetime(2024, 1, 1, 10), datetime(2024, 1, 2, 10)
    rows = []
    i = 0
    for d in (mon, tue):
        for t in ("click", "purchase"):
            for _ in range(10):
                rows.append((i, d, t, 1.0))
                i += 1
    r = T.cramers_v(_ev(spark, rows)).collect()[0]
    assert r["chi2"] == 0.0 and r["cramers_v"] == 0.0
    assert r["effect"] == "negligible"


def test_tost_identical_groups_equivalent(spark):
    mon = datetime(2024, 1, 1, 10)
    rows = [(i, mon, "purchase", 50.0 + (i % 3)) for i in range(200)]
    rows += [(1000 + i, mon, "click", 50.0 + (i % 3))
             for i in range(200)]
    r = T.tost_equivalence(_ev(spark, rows)).collect()[0]
    assert r["equivalent"] is True
    assert r["mean1"] == r["mean2"]


def test_tost_distant_groups_not_equivalent(spark):
    mon = datetime(2024, 1, 1, 10)
    rows = [(i, mon, "purchase", 100.0 + (i % 3)) for i in range(200)]
    rows += [(1000 + i, mon, "click", 50.0 + (i % 3))
             for i in range(200)]
    r = T.tost_equivalence(_ev(spark, rows)).collect()[0]
    assert r["equivalent"] is False
    # the upper test fails (diff >> +margin), the lower passes
    assert r["t_upper"] < 0 < r["t_lower"]


def test_mantel_haenszel_hand_worked(spark):
    """One stratum (hour 0-5): a=10 b=20 c=30 d=40 ->
    OR_MH = (10*40/100)/(20*30/100) = 0.666667."""
    wkend = datetime(2024, 1, 6, 3)   # Saturday, stratum 0
    wkday = datetime(2024, 1, 1, 3)   # Monday, stratum 0
    rows = (
        [(i, wkend, "purchase", 1.0) for i in range(10)]
        + [(100 + i, wkend, "click", 1.0) for i in range(20)]
        + [(200 + i, wkday, "purchase", 1.0) for i in range(30)]
        + [(300 + i, wkday, "click", 1.0) for i in range(40)]
    )
    r = T.mantel_haenszel(_ev(spark, rows)).collect()[0]
    assert r["n_strata"] == 1 and r["n"] == 100 and r["sum_a"] == 10
    assert r["or_mh"] == 0.666667


def test_mantel_haenszel_simpson_safe(spark):
    """Two strata each with OR = 1 -> pooled OR_MH = 1 even though the
    collapsed table's OR != 1 (the Simpson's-paradox construction)."""
    s0w = datetime(2024, 1, 6, 2)    # Sat, stratum 0
    s0d = datetime(2024, 1, 1, 2)    # Mon, stratum 0
    s3w = datetime(2024, 1, 6, 20)   # Sat, stratum 3
    s3d = datetime(2024, 1, 1, 20)   # Mon, stratum 3
    rows, i = [], 0

    def add(ts, typ, k):
        nonlocal i, rows
        rows += [(i + j, ts, typ, 1.0) for j in range(k)]
        i += k

    # stratum 0: exposed 40/40, unexposed 10/10  (OR = 1)
    add(s0w, "purchase", 40); add(s0w, "click", 40)
    add(s0d, "purchase", 10); add(s0d, "click", 10)
    # stratum 3: exposed 5/45, unexposed 20/180  (OR = 1)
    add(s3w, "purchase", 5); add(s3w, "click", 45)
    add(s3d, "purchase", 20); add(s3d, "click", 180)
    r = T.mantel_haenszel(_ev(spark, rows)).collect()[0]
    assert r["n_strata"] == 2
    assert r["or_mh"] == 1.0
    assert r["significant"] is False


# -------------------------------------------------------------- r9 wave 2


def test_perm_entropy_monotone_series_is_zero(spark):
    """Strictly increasing daily counts -> one ordinal pattern,
    entropy 0."""
    rows = [(d * 100 + i, datetime(2024, 1, d, 12), "click", 1.0)
            for d in range(1, 11) for i in range(d)]
    r = T.permutation_entropy(_ev(spark, rows)).collect()[0]
    assert r["n_patterns"] == 1 and r["h"] == 0.0 and r["h_norm"] == 0.0
    # strictly-increasing triple: ranks (0,1,2) -> code 0*9+1*3+2 = 5
    assert r["top_code"] == 5 and r["top_n"] == r["n_windows"]


def test_perm_entropy_alternating_series(spark):
    """Alternating high/low counts -> exactly two patterns, h = ln 2."""
    rows = []
    for d in range(1, 13):
        k = 5 if d % 2 == 0 else 1
        rows += [(d * 100 + i, datetime(2024, 1, d, 12), "click", 1.0)
                 for i in range(k)]
    r = T.permutation_entropy(_ev(spark, rows)).collect()[0]
    assert r["n_patterns"] == 2
    assert abs(r["h"] - 0.693147) < 1e-6


def test_vonmises_concentrated_hours(spark):
    """All purchases at hour 9 -> r_bar = 1, kappa from the high-r
    branch = 1/(1-4+3)... degenerate; use two adjacent hours for a
    finite kappa and r_bar close to 1."""
    rows = [(i, datetime(2024, 1, 1 + i % 5, 9), "purchase", 1.0)
            for i in range(30)]
    rows += [(100 + i, datetime(2024, 1, 1 + i % 5, 10), "purchase", 1.0)
             for i in range(30)]
    r = T.vonmises_fit(_ev(spark, rows)).collect()[0]
    assert r["n"] == 60
    assert r["r_bar"] > 0.99
    assert r["concentrated"] is True
    assert r["kappa"] > 10


def test_vonmises_uniform_hours_flat(spark):
    rows = [(i * 24 + h, datetime(2024, 1, 1 + i % 3, h), "purchase", 1.0)
            for i in range(5) for h in range(24)]
    r = T.vonmises_fit(_ev(spark, rows)).collect()[0]
    assert r["r_bar"] < 1e-6
    assert r["concentrated"] is False


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<float>",
    )


def test_hubness_hub_detected(spark):
    """A near-centroid hub vector appears in every query's top list ->
    max_occ is high and skewness positive."""
    from big_data_instacart_market_basket_analysis_spark.operators import (
        similarity as S,
    )
    import math

    vecs = []
    for i in range(80):
        a = 2 * math.pi * i / 80
        vecs.append([math.cos(a) * 0.1 + 1.0, math.sin(a) * 0.1]
                    + [0.0] * 6)
    r = S.hubness_skew(_emb_df(spark, vecs)).collect()[0]
    assert r["n_points"] == 80
    assert r["max_occ"] >= r["mean_occ"]
    assert r["n_queries"] == S.ID_QUERIES and r["k"] == S.TOP_K


def test_intrinsic_dim_line_is_low(spark):
    """Points IRREGULARLY sampled from a 1-D curve through 8-D space
    -> intrinsic dim well below the ambient 8. (A uniform grid is the
    TwoNN pathological case: both neighbors sit at the same distance,
    mu -> 1, and the estimate diverges — sampling must be uneven, as
    real data is.)"""
    from big_data_instacart_market_basket_analysis_spark.operators import (
        similarity as S,
    )
    import math

    vecs = []
    for i in range(200):
        t = (i * i * 37 % 997) / 997 * math.pi
        vecs.append([math.cos(t), math.sin(t), math.cos(2 * t),
                     math.sin(2 * t), 0.1, 0.1, 0.1, 0.1])
    r = S.intrinsic_dim_twonn(_emb_df(spark, vecs)).collect()[0]
    assert r["n_used"] > 0
    assert 0 < r["intrinsic_dim"] < 4.0


def test_burst_detection_finds_middle_burst(spark):
    """10 quiet days, 5 days at 10x rate, 10 quiet days -> exactly the
    middle run is flagged."""
    rows = []
    for d in range(1, 26):
        k = 50 if 11 <= d <= 15 else 5
        rows += [(d * 1000 + i, datetime(2024, 1, d, 12), "click", 1.0)
                 for i in range(k)]
    out = T.burst_detection(_ev(spark, rows)).collect()
    flags = {r["day"].day: r["in_burst"] for r in out}
    assert len(out) == 25
    for d in range(1, 26):
        assert flags[d] == (11 <= d <= 15), d


def test_burst_detection_flat_series_no_bursts(spark):
    rows = [(d * 100 + i, datetime(2024, 1, d, 12), "click", 1.0)
            for d in range(1, 21) for i in range(7)]
    out = T.burst_detection(_ev(spark, rows)).collect()
    assert all(not r["in_burst"] for r in out)
    assert all(r["n_events"] == 7 for r in out)


def test_sample_entropy_periodic_vs_noisy(spark):
    """A period-2 series has every template matching its same-phase
    templates exactly -> A/B high, SampEn low; hand-check fields."""
    rows = []
    for d in range(1, 21):
        k = 10 if d % 2 == 0 else 2
        rows += [(d * 100 + i, datetime(2024, 1, d, 12), "click", 1.0)
                 for i in range(k)]
    r = T.sample_entropy(_ev(spark, rows)).collect()[0]
    assert r["n_days"] == 20
    # mean = 6, tol = 6 // 5 = 1
    assert r["r_tol"] == 1
    # same-phase windows are identical, cross-phase differ by 8 > 1:
    # perfect regularity -> A == B -> sampen == 0
    assert r["a_pairs"] == r["b_pairs"] > 0
    assert r["sampen"] == 0.0


def test_embedding_mmd_identical_panels_near_zero(spark):
    """Even and odd panels drawn from the SAME vector -> unbiased
    MMD2 is exactly 0 (all kernel values equal)."""
    from big_data_instacart_market_basket_analysis_spark.operators import (
        similarity as S,
    )
    vecs = [[1.0, 2.0] + [0.0] * 6 for _ in range(40)]
    r = S.embedding_mmd(_emb_df(spark, vecs)).collect()[0]
    assert r["m"] == 20 and r["n"] == 20
    assert abs(r["mmd2"]) < 1e-9
    assert r["drifted"] is False


def test_embedding_mmd_detects_shift(spark):
    """Even panel along e1, odd panel along e2 -> large MMD2."""
    from big_data_instacart_market_basket_analysis_spark.operators import (
        similarity as S,
    )
    vecs = []
    for i in range(40):
        if i % 2 == 0:
            vecs.append([5.0, 0.0] + [0.0] * 6)
        else:
            vecs.append([0.0, 5.0] + [0.0] * 6)
    r = S.embedding_mmd(_emb_df(spark, vecs)).collect()[0]
    assert r["mmd2"] > 0.01 and r["drifted"] is True
