#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Two tiers (round-2 verdict #7): the HOT tier is a fixed ~30-query
subset — the round-1 comparable set plus the heaviest representative of
each operator family — whose per-query timings ride in the final JSON
line so rounds stay comparable; the FULL tier is every headline query.
Both run every invocation.

The FINAL stdout line is a compact summary that always fits the
driver's tail capture (round-2 verdict #1 — a 106-entry map overgrew
it and blinded the gate):
  {"metric": "headline_total", "value": <full-tier sec>, "unit": "sec",
   "sf": <float>, "n_queries": <full count>, "hot_total": <sec>,
   "queries": {<hot-tier name>: sec, ...}, "detail": "BENCH_DETAIL.json"}
The complete per-query map (all tiers) is written to
``BENCH_DETAIL.json`` next to this script; round snapshots are
committed as ``BENCH_DETAIL_r{N}.json``.

Each query is forced through full materialization with the noop sink
(count() alone lets Catalyst prune computed columns — that would
under-measure), after a JVM/reader warmup pass.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_data_instacart_market_basket_analysis_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: The graded surface: reference pipeline stages + [EXT] scale operators.
HEADLINE = [
    "ingest_orders",
    "product_features",
    "user_product_features",
    "users_final",
    "candidates",
    "proxy_submission",
    "top_products_per_user",
    "frequent_pairs",
    "pair_rules",
    "sql_dept_top_reordered",
    "pricing_summary",
    "shipping_priority",
    "regional_revenue",
    "events_salted_join",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "customer_returns",
    "large_orders",
    "dedup_minhash_lsh",
    "dedup_minhash_exact_first",
    "corpus_prep",
    "ann_brute_force",
    "ann_ivf",
    "embedding_near_dup",
    "text_quality",
    "text_lang_id",
    "events_tumbling_hourly",
    "events_sessionize",
    # round-2 additions: heaviest of the new [EXT] surface
    "text_skipgram_pmi",
    "docs_chunks",
    "ann_quantized",
    "events_retention",
    "events_session_paths",
    "events_incremental_rollup",
    "events_ohlc",
    "text_unigram_logprob",
    "graph_triangles",
    "docs_training_export",
    # round-2 late additions
    "embedding_semdedup",
    "text_dsir_importance",
    "corpus_prep_semantic",
    "sql_part_supplier_stats",
    # round-2 continuation additions
    "suppliers_waiting",
    "events_user_scd2",
    "text_bm25",
    "rag_context_pack",
    # round-3 additions: remaining TPC-H shapes + sequence mining +
    # imputation/encoding feature ops
    "late_order_priorities",
    "bloc_trade_volume",
    "nation_part_profit",
    "customer_order_distribution",
    "sequential_pairs",
    "events_interpolate",
    "loo_target_encoding",
    "events_pit_enrich",
    "events_wow_growth",
    "docs_er_matches",
    "lineitem_quarantine",
    "text_phrase_search",
    "events_ab_test",
    "orders_cdc_apply",
    "events_rfm_segments",
    "nation_revenue_share",
    "text_ingest_docs",
    # round-3 continuation: substring-span dedup + containment kernel
    "text_dup_spans",
    "dedup_containment",
    # round-3 late additions: LM ladder + trained filter + image dedup
    "text_bigram_logprob",
    "text_nb_quality",
    "media_phash_dedup",
    "dedup_sorted_neighborhood",
    # round-3: the four shapes completing all 22 TPC-H plan shapes
    "forecast_revenue_change",
    "min_cost_supplier",
    "nation_market_share",
    "priority_shipping_buckets",
    # round-3 closing wave: stats/eval/curation additions
    "text_rake_keywords",
    "text_nb_quality_cv",
    "embedding_knn_outliers",
    "events_markov",
    "events_holt_winters",
    # round-2 (driver round) wave: trained indexes + verified sketches +
    # graph traversal + tokenizer training
    "embedding_kmeans_lloyd",
    "ann_pq",
    "rag_rerank",
    "embedding_mmr",
    "text_bpe_train",
    "events_kmv_sketch",
    "events_hll_sketch",
    "events_cms_hitters",
    "graph_bfs",
    "graph_lpa",
    "parts_pareto_skyline",
    "ml_cart_verified",
    "graph_item_similarity",
    "text_textrank",
    "text_decontaminate",
    "ml_gbm_verified",
    "rag_hybrid_rrf",
    "ann_matryoshka_recall",
    "dedup_winnowing",
    # round-2 closing wave: verified Apriori/GLM/PCA + density
    # clustering + sketch algebra + coverage selection + join pruning
    "apriori_triples",
    "bloom_join_prune",
    "events_kmv_algebra",
    "events_hist_quantiles",
    "events_dbscan",
    "ml_logreg_verified",
    "embedding_pca",
    "docs_setcover",
    "join_cardinality_estimate",
    # round-3 (driver round) additions
    "ann_graph_beam",
    "ml_rf_verified",
    "events_curve_locality",
    "docs_phonetic_er",
    "ml_ols_verified",
    "events_ar2_forecast",
    "events_mta_models",
    "ann_retrieval_eval",
    "embedding_silhouette",
    "ml_conformal_ols",
    "orders_ivm_retract",
    "events_revenue_gini",
    # round-3 continuation wave: graph decompositions, lossless
    # prefix-filter dedup, linkage EM, data-driven attribution,
    # distribution alignment, learning-curve eval
    "graph_kcore",
    "graph_ktruss",
    "graph_link_prediction",
    "graph_rec_coverage",
    "dedup_ppjoin",
    "docs_fellegi_sunter",
    "events_markov_attribution",
    "events_shapley",
    "events_quantile_norm",
    "events_forecast_backtest",
    "text_nb_learning_curve",
    "text_nb_gains",
    "ind_discovery",
    "dict_advisor",
    # round-3 session-2 wave: rank/randomization statistics, causal
    # and survival companions, engine features (MV rewrite, DQ suite),
    # seed-restart graph walk, community quality
    "events_spearman",
    "events_anova",
    "events_permutation_test",
    "orders_theil",
    "graph_ppr",
    "events_nelson_aalen",
    "events_group_sequential",
    "dq_constraints",
    "mv_rollup_rewrite",
    "events_qini",
    "events_offpolicy",
    "graph_modularity",
    "ml_ridge_verified",
    "events_conversion_ztest",
    "croston_forecast",
    "price_elasticity",
    "events_logrank",
    "orders_backlog",
    "price_index",
    "market_hhi",
    "parts_abc",
    "events_ipf",
    "events_stratified_ate",
    "delta_advisor",
    "events_effect_size",
    "events_hill_tail",
    "docs_rater_kappa",
    "events_granger",
    "graph_rich_club",
    "ann_knn_classifier",
    "events_top_paths",
    "ann_binary_topk",
    "ann_binary_recall",
    "events_rmst",
    "events_wilcoxon",
    "events_mcnemar",
    "events_runs_test",
    "events_variance_ratio",
    "parts_newsvendor",
    "orders_service_level",
    "events_cohort_ltv",
    "ml_poisson_verified",
    "events_peaks",
    "ann_rocchio",
    "sql_named_window",
    "sql_nullsafe",
    "ef1_submission",
    "pair_substitutes",
    "media_sniff_dims",
    "media_wav_meta",
    "events_approx_quantile",
    "stream_ab_monitor",
    "udf_grouped_map",
    "events_stickiness",
    "events_matrix_profile",
    "events_acf",
    "events_pacf",
    "events_ccf",
    "events_wht",
    "parts_eoq",
    "events_haar",
    "dedup_lsh_precision",
    "ml_isotonic_verified",
    "graph_sssp",
    "graph_betweenness",
    "graph_closeness",
    "graph_diameter_est",
    "graph_hits",
    "text_kneser_ney",
    "sql_udtf_chunks",
    "privacy_randomized_response",
    "events_changepoint",
    "text_ql_search",
    "events_adstock",
    "embedding_isotropy",
    "text_trigram_jm",
    "docs_source_jsd",
    "text_oov_rate",
    "orders_atkinson",
    "sql_dynamic_identifier",
    "graph_betweenness_stability",
    "orders_reorder_policy",
    "sql_scripting",
    "events_variant",
    "text_rouge",
    # round-6 additions
    "dedup_retention",
    "orders_erlang_blocking",
    "events_wasserstein",
    "ml_platt_verified",
    "parts_pps_sample",
    "events_cox_ph",
    "docs_krippendorff",
    "events_sprt",
    "events_overdispersion",
    "dedup_capture_recapture",
    "parts_abc_xyz",
    "events_median_ci",
    "events_trend_test",
    "docs_vocab_chao1",
    "docs_source_overlap",
    "graph_clustering_coef",
    "stream_sprt",
    "orders_erlang_wait",
    "events_kendall_tau",
    "events_kruskal_wallis",
    "events_levene",
    "events_friedman",
    "events_tukey_hsd",
    "orders_lot_sizing",
    "text_novelty",
    "events_gumbel",
    "events_dtw",
    "docs_nw_align",
    "parts_jaro_winkler",
    "stream_extremes",
    "events_energy_distance",
    "events_seasonality",
    "text_ppl_buckets",
    "text_burstiness",
    "text_collocations",
    "events_mood_median",
    "events_record_days",
    "events_turning_points",
    "orders_potwo_policy",
    "events_jarque_bera",
    "events_quartile_skew",
    "events_ansari_bradley",
    "events_partial_corr",
    # round-7 additions
    "events_tablesample",
    "text_decontaminate_semantic",
    "events_durbin_watson",
    "events_grubbs",
    "events_brown_forsythe",
    "events_cliffs_delta",
    "events_cochran_q",
    "events_page_trend",
    "events_hurst",
    "events_weibull",
    "events_bartlett",
    "events_welch_anova",
    "events_ks_exponential",
    "events_pchart",
    "stream_pchart",
    "graph_adamic_adar",
    "graph_assortativity",
    "nation_rca",
    "text_bleu",
    "text_lexical_diversity",
    "docs_systematic_sample",
    "docs_cluster_sample",
    "events_rayleigh",
    "dedup_cdc",
    "join_order_advisor",
    "events_aqp_revenue",
    "events_cvm",
    "events_anderson_darling",
    # round-8 promotions (r7 verdict task 1): the board's slow tail,
    # minus streaming (cannot re-run in the warm loop) and
    # ml_cv_selection (inherent grid-training cost) — both of those
    # are gated by boardtail_diff from DRIVERSIM deltas instead.
    "ml_gbm_perm_importance",
    "plan_lint_report",
    "sql_dept_stats",
    "sql_daily_gapfill",
    "ml_cart_importance",
    "ml_train_metrics",
    "pysource_docs",
    # round-9 additions: the unigram tokenizer family + the new
    # stratified-stats trio.
    "text_unigram_lm",
    "text_unigram_fertility",
    "events_cramers_v",
    "events_tost",
    "events_mh_odds",
    "events_vonmises",
    "events_perm_entropy",
    "embedding_intrinsic_dim",
    "embedding_hubness",
    "events_bursts",
    "events_sample_entropy",
    "embedding_mmd",
]


#: HOT tier: the 21 queries benched since round 1 (cross-round
#: comparability) + the heaviest representative per operator family.
#: Keep ~30 entries — the final JSON line must stay under ~1.5 KB.
HOT = [
    "ingest_orders",
    "product_features",
    "user_product_features",
    "users_final",
    "candidates",
    "proxy_submission",
    "top_products_per_user",
    "frequent_pairs",
    "pair_rules",
    "sql_dept_top_reordered",
    "pricing_summary",
    "shipping_priority",
    "regional_revenue",
    "events_salted_join",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "corpus_prep",
    "ann_brute_force",
    "ann_ivf",
    "text_quality",
    # heavy family representatives (graph / clustering / verified-ML /
    # ER / trained-index / tokenizer / sequence)
    "graph_lpa",
    "graph_triangles",
    "events_dbscan",
    "ml_cart_verified",
    "docs_er_matches",
    "ann_pq",
    "embedding_kmeans_lloyd",
    "text_bpe_train",
    "sequential_pairs",
]


def _sf_from_dir(path: str) -> float:
    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else -1.0


# --------------------------------------------------------------------------
# round-over-round diff gate (r6 verdict task 1): the time-domain twin of
# planboard's plan-shape gate. A query is FLAGGED when it drifts >1.5x AND
# >0.5s vs the last committed BENCH_DETAIL_r{N-1}.json; a flag escalates to
# a gate FAILURE only when the same query's PLANBOARD stats (rules,
# global_windows, shuffles) also changed round-over-round — machine jitter
# stays a named flag, plan-caused slowdowns fail. The WATCHLIST names ride
# in every diff regardless of flagging so known drifters are adjudicated
# mechanically in the committed artifact.
# --------------------------------------------------------------------------

DIFF_RATIO = 1.5
DIFF_ABS_SECS = 0.5

#: adjudication carry-overs from the r6 verdict: four jitter suspects +
#: the two-round drifter.
WATCHLIST = [
    "embedding_knn_outliers",
    "text_bm25",
    "rag_rerank",
    "candidates",
    "events_mta_models",
]


def _latest_round_file(
    pattern: str, max_round: int | None = None
) -> str | None:
    import glob

    cands = []
    for p in glob.glob(pattern):
        m = re.search(r"_r(\d+)\.json$", p)
        if m and (max_round is None or int(m.group(1)) <= max_round):
            cands.append((int(m.group(1)), p))
    return max(cands)[1] if cands else None


def _baseline_round_cap() -> int | None:
    """Highest round whose snapshots may serve as a diff baseline.

    The grading driver writes ``CORRECTNESS_r{N}.json`` when round N
    closes, so the newest such file marks the last COMPLETED round.
    Without the cap, an in-round gate re-run after the builder commits
    its own ``*_r{N}.json`` snapshots would diff the fresh board
    against an essentially identical copy of itself and trivially PASS
    (r8 ADVICE item 2); capping at the completed round pins the
    baseline to the previous round's evidence instead.
    """
    here = os.path.dirname(os.path.abspath(__file__))
    p = _latest_round_file(os.path.join(here, "CORRECTNESS_r*.json"))
    if not p:
        return None
    m = re.search(r"_r(\d+)\.json$", p)
    return int(m.group(1)) if m else None


def _plan_entry(board: dict, name: str):
    e = (board or {}).get("plans", {}).get(name)
    if e is None or "err" in e:
        return None
    return {
        "rules": e.get("rules", {}),
        "global_windows": e.get("global_windows"),
        "shuffles": e.get("shuffles"),
    }


def bench_diff(
    timings: dict[str, float],
    prev_path: str | None = None,
    cur_board: dict | None = None,
    prev_board: dict | None = None,
) -> dict:
    """Diff current timings vs the newest committed BENCH_DETAIL_r*.json,
    adjudicating flags against the planboard round-over-round stats.
    The three optional args override file discovery (tests plant
    regressions through them)."""
    here = os.path.dirname(os.path.abspath(__file__))
    cap = _baseline_round_cap()
    prev_path = prev_path or os.environ.get(
        "SPARK_GRAFT_BENCH_PREV",
        _latest_round_file(
            os.path.join(here, "BENCH_DETAIL_r*.json"), max_round=cap
        ),
    )
    if not prev_path or not os.path.exists(prev_path):
        return {"baseline": None, "gate": "SKIP (no baseline)"}
    prev = json.load(open(prev_path)).get("queries", {})

    if cur_board is None:
        cur_board_path = os.path.join(here, "PLANBOARD.json")
        cur_board = (
            json.load(open(cur_board_path))
            if os.path.exists(cur_board_path)
            else None
        )
    if prev_board is None:
        prev_board_path = _latest_round_file(
            os.path.join(here, "PLANBOARD_r*.json"), max_round=cap
        )
        prev_board = (
            json.load(open(prev_board_path))
            if prev_board_path and os.path.exists(prev_board_path)
            else None
        )

    def plan_changed(name):
        if cur_board is None or prev_board is None:
            return None  # unknown: cannot escalate, stays a flag
        a, b = _plan_entry(prev_board, name), _plan_entry(cur_board, name)
        if a is None or b is None:
            return None
        return a != b

    common = sorted(set(prev) & set(timings))
    flagged, watch = {}, {}
    import math

    logsum, n_ratio = 0.0, 0
    for q in common:
        p, c = prev[q], timings[q]
        if p > 0 and c > 0:
            logsum += math.log(c / p)
            n_ratio += 1
        if c > p * DIFF_RATIO and c - p > DIFF_ABS_SECS:
            pc = plan_changed(q)
            flagged[q] = {
                "prev": p,
                "cur": c,
                "ratio": round(c / p, 2) if p else None,
                "plan_changed": pc,
                "verdict": "plan-regression" if pc else "jitter-flag",
            }
    for q in WATCHLIST:
        if q in prev and q in timings:
            watch[q] = {
                "prev": prev[q],
                "cur": timings[q],
                "ratio": round(timings[q] / prev[q], 2)
                if prev[q]
                else None,
            }
    fails = [q for q, f in flagged.items() if f["plan_changed"]]
    # r7 ADVICE: a None plan verdict (board missing/unparseable/err row)
    # must not fail open — a flagged drift that cannot be adjudicated
    # yields gate UNKNOWN, so absent planboard artifacts can't mask a
    # plan-caused regression behind a 'jitter-flag' PASS.
    unadjudicated = [
        q for q, f in flagged.items() if f["plan_changed"] is None
    ]
    if fails:
        gate = "FAIL"
    elif unadjudicated:
        gate = "UNKNOWN (planboard unavailable for flagged queries)"
    else:
        gate = "PASS"
    return {
        "baseline": os.path.basename(prev_path),
        "n_common": len(common),
        "geomean_ratio": round(math.exp(logsum / n_ratio), 3)
        if n_ratio
        else None,
        "flag_rule": f">{DIFF_RATIO}x AND >{DIFF_ABS_SECS}s",
        "flagged": flagged,
        "watch": watch,
        "gate": gate,
        "failed": fails,
        "unadjudicated": unadjudicated,
    }


# --------------------------------------------------------------------------
# board-tail diff gate (r7 verdict task 1): the full-board twin of
# bench_diff. The bench tier times 288 of ~515 queries min-of-runs;
# everything else — notably the streaming queries, which cannot re-run
# in the warm bench loop — has its only timing signal in the
# DRIVERSIM board. This gate diffs every SLOW board line (> BOARDTAIL_SECS in
# either round) against the last committed DRIVERSIM_r{N-1}.json with
# the same flag rule and planboard adjudication as bench_diff, so the
# blind spot that let events_dbscan drift for three rounds is closed
# for the whole surface. Run by scripts/driver_sim.py; the verdict
# rides in DRIVERSIM.json as "tail_diff".
# --------------------------------------------------------------------------

BOARDTAIL_SECS = 2.5

#: the r7 board's named slow tail — rides in every tail diff so the
#: lines the r7 verdict called out are adjudicated mechanically.
BOARDTAIL_WATCHLIST = [
    "ml_gbm_perm_importance",
    "stream_interval_join_outer",
    "plan_lint_report",
    "sql_dept_stats",
    "sql_daily_gapfill",
    "ml_rf_verified",
    "ml_gbm_verified",
    "ml_cv_selection",
    "stream_checkpoint_restart",
    "stream_merge_state",
]


def boardtail_diff(
    cur_secs: dict[str, float],
    prev_path: str | None = None,
    cur_board: dict | None = None,
    prev_board: dict | None = None,
) -> dict:
    """Diff per-query DRIVERSIM wall times vs the newest committed
    DRIVERSIM_r*.json, restricted to the slow tail (> BOARDTAIL_SECS
    in either round) plus the watchlist. Same flag rule, planboard
    adjudication, and UNKNOWN-on-missing-boards semantics as
    bench_diff. ``cur_secs`` maps query -> seconds (the driver_sim
    board's "sec" fields)."""
    here = os.path.dirname(os.path.abspath(__file__))
    cap = _baseline_round_cap()
    prev_path = prev_path or _latest_round_file(
        os.path.join(here, "DRIVERSIM_r*.json"), max_round=cap
    )
    if not prev_path or not os.path.exists(prev_path):
        return {"baseline": None, "gate": "SKIP (no baseline)"}
    prev_board_raw = json.load(open(prev_path))
    prev = {
        q: r.get("sec")
        for q, r in (prev_board_raw.get("results") or {}).items()
        if isinstance(r, dict) and r.get("sec") is not None
    }

    if cur_board is None:
        p = os.path.join(here, "PLANBOARD.json")
        cur_board = json.load(open(p)) if os.path.exists(p) else None
    if prev_board is None:
        p = _latest_round_file(
            os.path.join(here, "PLANBOARD_r*.json"), max_round=cap
        )
        prev_board = (
            json.load(open(p)) if p and os.path.exists(p) else None
        )

    def plan_changed(name):
        if cur_board is None or prev_board is None:
            return None
        a, b = _plan_entry(prev_board, name), _plan_entry(cur_board, name)
        if a is None or b is None:
            return None
        return a != b

    tail = sorted(
        q
        for q in set(prev) & set(cur_secs)
        if prev[q] > BOARDTAIL_SECS or cur_secs[q] > BOARDTAIL_SECS
    )
    flagged, watch = {}, {}
    for q in tail:
        p, c = prev[q], cur_secs[q]
        if c > p * DIFF_RATIO and c - p > DIFF_ABS_SECS:
            pc = plan_changed(q)
            flagged[q] = {
                "prev": p,
                "cur": c,
                "ratio": round(c / p, 2) if p else None,
                "plan_changed": pc,
                "verdict": "plan-regression" if pc else "jitter-flag",
            }
    for q in BOARDTAIL_WATCHLIST:
        if q in prev and q in cur_secs:
            watch[q] = {
                "prev": prev[q],
                "cur": cur_secs[q],
                "ratio": round(cur_secs[q] / prev[q], 2)
                if prev[q]
                else None,
            }
    fails = [q for q, f in flagged.items() if f["plan_changed"]]
    unadjudicated = [
        q for q, f in flagged.items() if f["plan_changed"] is None
    ]
    if fails:
        gate = "FAIL"
    elif unadjudicated:
        gate = "UNKNOWN (planboard unavailable for flagged queries)"
    else:
        gate = "PASS"
    return {
        "baseline": os.path.basename(prev_path),
        "tail_rule": f">{BOARDTAIL_SECS}s either round",
        "n_tail": len(tail),
        "tail": tail,
        "flag_rule": f">{DIFF_RATIO}x AND >{DIFF_ABS_SECS}s",
        "flagged": flagged,
        "watch": watch,
        "gate": gate,
        "failed": fails,
        "unadjudicated": unadjudicated,
    }


def main() -> None:
    import __spark_entry__ as entrymod

    # machine load at start/end rides in the headline JSON (r4 verdict
    # #5): a loaded box inflates totals ~±50%, and the 1-min load
    # average lets the round artifact adjudicate itself instead of
    # costing a judge-side re-run.
    load_start = round(os.getloadavg()[0], 2)

    spark = get_spark("bench")
    queries = entrymod.queries()

    # warmup pass: spin the JVM, parquet file indexes, and codegen
    # caches for every headline plan, so timings measure steady-state
    # execution rather than first-touch setup.
    for name in HEADLINE:
        queries[name](spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        # construction included: iterative operators (connected
        # components) run driver-coordinated supersteps at build time,
        # so timing only the final action would under-measure them.
        t0 = time.perf_counter()
        df = queries[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    detail = {
        "metric": "headline_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "sf": _sf_from_dir(SF_DIR),
        "n_queries": len(timings),
        "hot_total": round(sum(timings[n] for n in HOT), 3),
        "hot": HOT,
        "queries": timings,
        "diff": bench_diff(timings),
    }
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1, sort_keys=True)

    # FINAL line: compact — hot-tier map only, so the driver's tail
    # capture always contains the entire parseable summary.
    out = {
        "metric": "headline_total",
        "value": detail["value"],
        "unit": "sec",
        "sf": detail["sf"],
        "n_queries": detail["n_queries"],
        "hot_total": detail["hot_total"],
        "load_start": load_start,
        "load_end": round(os.getloadavg()[0], 2),
        "queries": {n: timings[n] for n in HOT},
        "diff_gate": detail["diff"].get("gate"),
        "diff_flagged": sorted(detail["diff"].get("flagged", {})),
        "detail": "BENCH_DETAIL.json",
    }
    detail["load_start"] = out["load_start"]
    detail["load_end"] = out["load_end"]
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1, sort_keys=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
