"""Hand-worked invariants for the round-5 operators: HITS on a
bipartite star, closeness/diameter on a path, changepoint on a
planted level shift, adstock impulse response, Kneser-Ney proper
probabilities, randomized-response exact debias, isotropy limits."""

from __future__ import annotations

import pyspark.sql.functions as F

from big_data_instacart_market_basket_analysis_spark.operators import (
    graph,
    privacy,
    similarity,
    temporal,
    textstats,
)


def _li(spark, rows):
    return spark.createDataFrame(rows, "l_orderkey long, l_partkey long")


def test_closeness_path_graph_hand_worked(spark):
    """Path 101-102-103: from the sampled pivots (all 3 nodes) the
    middle node is one hop from both ends (dist_sum 2, harmonic 2.0),
    the leaves one + two hops (dist_sum 3, harmonic 1.5)."""
    li = _li(spark, [(1, 101), (1, 102), (2, 102), (2, 103)])
    out = {
        r["node"]: (r["n_reached"], r["dist_sum"], r["harmonic"])
        for r in graph.closeness_centrality(li).collect()
    }
    assert out[102] == (2, 2, 2.0)
    assert out[101] == (2, 3, 1.5)
    assert out[103] == (2, 3, 1.5)


def test_diameter_path_graph_hand_worked(spark):
    """Path of 3: pair distances are {1,1,1,1,2,2} -> max 2, mean
    8/6, p90 = 2 (cum share of dist-1 pairs is 4/6 < 0.9)."""
    li = _li(spark, [(1, 101), (1, 102), (2, 102), (2, 103)])
    r = graph.diameter_estimate(li).collect()[0]
    assert r["n_pairs"] == 6
    assert r["max_dist"] == 2
    assert r["p90_dist"] == 2
    assert abs(r["mean_dist"] - round(8 / 6, 6)) < 1e-9


def test_hits_star_more_buyers_more_authority(spark):
    """Bipartite star: part 1 bought by 3 customers, part 2 by 1.
    The max-normalized authority of part 1 must be the ceiling
    (SCALE..2*SCALE) and strictly above part 2's."""
    orders = spark.createDataFrame(
        [(i, i) for i in range(1, 5)], "o_orderkey long, o_custkey long"
    )
    li = _li(spark, [(1, 1), (2, 1), (3, 1), (4, 2)])
    out = {
        r["l_partkey"]: (r["n_buyers"], r["authority"])
        for r in graph.hits_scores(orders, li).collect()
    }
    assert out[1][0] == 3 and out[2][0] == 1
    assert out[1][1] > out[2][1]
    assert graph.HITS_SCALE <= out[1][1] < 2 * graph.HITS_SCALE


def test_changepoint_finds_planted_level_shift(spark):
    """10 days at ~100 cents then 10 days at ~900 cents: the split
    must land exactly on the last low day."""
    rows = []
    for d in range(20):
        val = 1.0 if d < 10 else 9.0
        rows.append((d, f"2024-01-{d + 1:02d} 12:00:00", 1, "purchase", val))
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    r = temporal.changepoint_split(ev).collect()[0]
    assert str(r["split_day"]) == "2024-01-10"
    assert r["n_left"] == 10 and r["n_right"] == 10
    assert r["mean_left"] == 100.0 and r["mean_right"] == 900.0


def test_adstock_impulse_decays_geometrically(spark):
    """A single click burst on day 1 must echo as clicks/2^age on the
    following days (exact dyadic decay), and saturated stays in
    (0, 1)."""
    rows = [(0, "2024-02-01 10:00:00", 1, "click", None)] * 8
    rows = [(i, ts, u, t, v) for i, (_, ts, u, t, v) in enumerate(rows)]
    for d in range(2, 5):
        rows.append((100 + d, f"2024-02-{d:02d} 10:00:00", 1, "view", None))
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {str(r["day"]): r for r in temporal.adstock_daily(ev).collect()}
    assert out["2024-02-01"]["adstock"] == 8.0
    assert out["2024-02-02"]["adstock"] == 4.0
    assert out["2024-02-03"]["adstock"] == 2.0
    assert out["2024-02-04"]["adstock"] == 1.0
    assert all(0 < r["saturated"] < 1 for r in out.values())


def test_kneser_ney_probabilities_are_proper(spark):
    """Every scored bigram's KN probability must lie in (0, 1] —
    i.e. kn_logprob <= 0 — and docs below 2 tokens are excluded."""
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cat ran"),
            (3, "solo"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in textstats.kneser_ney_scores(docs).collect()}
    assert 3 not in rows
    assert rows[1]["n_bigrams"] == 5
    assert all(r["kn_logprob"] <= 0.0 for r in rows.values())


def test_randomized_response_debias_recovers_exactly(spark):
    """With the deterministic coin, the debiased estimate is an exact
    algebraic function of the flip count; with zero flipped users the
    estimate equals the true rate."""
    rows = []
    for u in range(1, 40):
        rows.append((u, "2024-03-01 10:00:00", u, "purchase" if u % 2 else "view", 1.0))
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    r = privacy.randomized_response(ev).collect()[0]
    n, t, rep = r["n_users"], r["n_true"], r["n_reported"]
    p = 1.0 / privacy.RR_FLIP_MOD
    want = round((rep / n - p) / (1 - 2 * p), 6)
    assert r["est_rate"] == want
    assert r["true_rate"] == round(t / n, 6)


def test_isotropy_identical_vectors_give_cos_one(spark):
    """All-identical vectors are maximally anisotropic: mean pairwise
    cosine 1, mean_norm = the vector norm."""
    import math

    vec = [3.0, 4.0] + [0.0] * 62
    emb = spark.createDataFrame(
        [(i, vec, 0) for i in range(5)],
        "vec_id long, embedding array<float>, label int",
    )
    out = {r["stat"]: r["value"] for r in similarity.embedding_isotropy(emb).collect()}
    assert out["n_vecs"] == 5.0
    assert abs(out["mean_norm"] - 5.0) < 1e-6
    assert abs(out["mean_pairwise_cos"] - 1.0) < 1e-5


def test_ql_and_bm25_rank_same_corpus(spark):
    """QL and BM25 must both return <= k rows from the same corpus
    and agree that a doc stuffed with query terms beats one with a
    single mention."""
    docs = spark.createDataFrame(
        [
            (1, "hash join vector hash join vector hash"),
            (2, "hash once among many many many other words " + "filler " * 30),
            (3, "nothing relevant here"),
        ],
        "doc_id long, text string",
    )
    ql = {r["doc_id"]: r["ql"] for r in textstats.ql_search(docs).collect()}
    bm = {r["doc_id"]: r["bm25"] for r in textstats.bm25_search(docs).collect()}
    assert ql[1] > ql[2]
    assert bm[1] > bm[2]
    assert 3 not in bm  # zero-score docs filtered by BM25


def test_reorder_policy_conserves_units_and_replenishes(spark):
    """Constant demand 5/day for 12 days: mu=5, s=16, S=32. Hand
    properties: shipped+short==demand daily, stock never negative,
    arrivals equal orders two days later, and total shipped + ending
    inventory position == S + total ordered (unit conservation under
    lost sales)."""
    rows = []
    eid = 0
    for d in range(1, 13):
        for _ in range(5):
            rows.append((eid, f"2024-04-{d:02d} 09:00:00", 1, "purchase", 2.0))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = sorted(
        temporal.reorder_policy_sim(ev).collect(), key=lambda r: str(r["day"])
    )
    assert all(r["shipped"] + r["short"] == r["demand"] for r in out)
    assert all(r["on_hand_end"] >= 0 for r in out)
    for i, r in enumerate(out):
        if i >= 2:
            assert r["arrived"] == out[i - 2]["ordered_qty"]
    total_shipped = sum(r["shipped"] for r in out)
    total_ordered = sum(r["ordered_qty"] for r in out)
    last = out[-1]
    assert total_shipped + last["on_hand_end"] + last["on_order"] == 32 + total_ordered
