"""Property-based tests (hypothesis) — invariants that must hold on
arbitrary data, not just the fixtures.

Each example builds a tiny local DataFrame; examples are capped so the
suite stays fast (Spark job per example).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from big_data_instacart_market_basket_analysis_spark.functions.skew import (
    salted_sum_count,
)
from big_data_instacart_market_basket_analysis_spark.operators import dedup

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# small word pool -> high collision/overlap probability
_WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
_texts = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=3, max_size=8).map(" ".join),
    min_size=2,
    max_size=12,
)


@settings(**_SETTINGS)
@given(texts=_texts)
def test_minhash_candidates_subset_of_exact_jaccard(spark, texts):
    """MinHash+LSH output verifies exact Jaccard on candidates, so its
    pair set must be a subset of the exhaustive exact-Jaccard pairs at
    the same threshold (LSH can miss candidates, never add false
    positives past verification)."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    exact = {
        (r["d1"], r["d2"])
        for r in dedup.ngram_jaccard_pairs(docs).collect()
    }
    lsh = {
        (r["d1"], r["d2"])
        for r in dedup.minhash_lsh_pairs(docs).collect()
    }
    assert lsh <= exact


@settings(**_SETTINGS)
@given(texts=_texts)
def test_exact_dedup_partitions_the_corpus(spark, texts):
    """Groups partition the corpus: copies sum to n_docs, keepers are
    distinct group minima."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    rows = dedup.exact_dedup(docs).collect()
    assert sum(r["n_copies"] for r in rows) == len(texts)
    keepers = [r["keeper_doc_id"] for r in rows]
    assert len(keepers) == len(set(keepers))


@settings(**_SETTINGS)
@given(texts=_texts)
def test_connected_clusters_respect_pairs(spark, texts):
    """Every near-dup pair's endpoints share a cluster label; every doc
    is labeled exactly once; labels are component minima (<= doc_id)."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    label = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.connected_clusters(docs).collect()
    }
    assert sorted(label) == list(range(len(texts)))
    assert all(c <= d for d, c in label.items())
    for r in dedup.ngram_jaccard_pairs(docs).collect():
        assert label[r["d1"]] == label[r["d2"]]


def test_connected_clusters_converge_on_long_chain(spark):
    """A length-200 path graph has diameter 199 — plain min-label
    propagation needs 199 supersteps, far past any sane cap. The
    alternating large-star/small-star rounds must converge within the
    O(log^2 n) round cap and label the whole chain with its minimum."""
    n = 200
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(n)], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["d1", "d2"]
    )
    label = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.connected_clusters(docs, pairs=pairs).collect()
    }
    assert label == {i: 0 for i in range(n)}


def test_hot_shingle_dropped_from_candidate_generation(spark):
    """The document-frequency cap prunes pairs whose entire overlap is
    stop-shingles, and leaves every surviving pair's jaccard identical
    to the uncapped computation (cap applies to candidate generation
    only, never to the verify)."""
    hot = "the quick fox"  # appears in every doc -> df = 6
    rows = [
        # 0/1: true near-dups (share rare shingles beyond the hot one)
        (0, hot + " jumps over lazy dogs daily"),
        (1, hot + " jumps over lazy dogs nightly"),
        # 2/3: overlap ONLY via the hot shingle
        (2, hot + " aaa bbb ccc"),
        (3, hot + " ddd eee fff"),
        (4, hot + " ggg hhh iii"),
        (5, hot + " jjj kkk lll"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    uncapped = {
        (r["d1"], r["d2"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            docs, threshold=0.01, max_shingle_df=10**9
        ).collect()
    }
    capped = {
        (r["d1"], r["d2"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            docs, threshold=0.01, max_shingle_df=3
        ).collect()
    }
    # hot-shingle-only pairs exist uncapped, vanish capped
    assert (2, 3) in uncapped and (2, 3) not in capped
    # the true near-dup pair survives with the identical jaccard value
    assert (0, 1) in capped
    assert capped[(0, 1)] == uncapped[(0, 1)]
    assert set(capped) <= set(uncapped)


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),   # skewed key space
            st.integers(min_value=-1000, max_value=1000),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_salted_agg_equals_direct_groupby(spark, rows):
    """The salted two-stage aggregation is exactly the direct groupBy
    for associative aggregates, for any data and any skew."""
    df = spark.createDataFrame(
        [(k, i, float(v)) for i, (k, v) in enumerate(rows)],
        ["k", "row_id", "value"],
    )
    salted = {
        (r["k"], r["n_events"], r["sum_value"])
        for r in salted_sum_count(
            df, key="k", row_id="row_id", value="value"
        ).collect()
    }
    direct = {
        (r["k"], r["n"], r["s"])
        for r in df.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert salted == direct
