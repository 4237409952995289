"""Benchmark harness (driver contract, see repo instructions).

Runs the headline queries from the registry at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and
prints ONE JSON line:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": ...}

Each query is executed to completion via a noop-format write (every
output column is computed and serialized executor-side, nothing is
collected to the driver) and timed wall-clock. A plain ``count()``
under-measured projection-heavy queries — Catalyst prunes unreferenced
output columns below a count, so scan→select shapes were timed without
computing their projections (round-2 judge finding #2). A warmup pass
on the smallest table absorbs JVM/codegen startup so the numbers
measure the plans, not session bring-up.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from movievectorsearch_spark.plans import queries as Q
from movievectorsearch_spark.session import get_spark

# headline set: one per operator family — relational scans/aggs/joins,
# TPC-H shapes, vector search, dedup, text analysis, events/windows
BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "agg_counts_by_type",
    "window_topk_per_group",
    "knn_topk",
    "knn_batch",
    "search_vector",
    "fuzzy_band_join",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "text_profile",
    "lang_detect",
    "events_props_json",
    "events_hourly",
    "events_sessionize",
    "upsert_latest_wins",
    "ingest_parse",
    "q6_forecast_revenue",
    "q4_order_priority",
    "q10_returned_items",
    "q18_big_orders",
    "q14_promo_revenue",
    "q19_disjunctive_predicates",
    "q13_order_distribution",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q20_dominant_suppliers",
    "q21_waiting_suppliers",
    "q22_dormant_customers",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q12_late_shipment_priority",
    "q2_min_cost_supplier",
    "q11_important_parts",
    "q16_supplier_part_counts",
    "revenue_share_by_nation",
    "snapshot_diff_orders",
    "ntile_value_binning",
    "fk_violations",
    "events_asof_join",
    "events_interval_join",
    "events_value_percentiles",
    "events_window_frames",
    "events_sliding_window",
    "events_resample_ffill",
    "table_profile",
    "pivot_user_event_counts",
    "unpivot_lineitem_metrics",
    "impute_median",
    "salted_join_users",
    "partitioned_sink_scan",
    "rollup_status_priority",
    "token_stats",
    "multimodal_meta",
    "multimodal_decode",
    "sentence_split_udtf",
    "csv_roundtrip_agg",
    "events_value_histogram",
    "corr_qty_discount",
    "train_test_split",
    "inverted_index",
    "tfidf_top_terms",
    "impute_mode",
    "events_outliers",
    "events_ewma",
    "events_funnel",
    "events_cohort_retention",
    "ab_test_zstat",
    "events_range_frame",
    "clustered_scan_agg",
    "pack_sequences",
    "weighted_sample_priority",
    "events_cum_distinct_users",
    "pii_redact",
    "distinct_rollup_hll",
    "jsonl_roundtrip_agg",
    "zorder_scan_agg",
    "grouping_sets_lang_source",
    "events_rank_functions",
    # round 2: persisted-ANN serve, relational sketch, portable sampling,
    # fixed-point TF-IDF KNN
    "ann_srp_topk",
    "ann_ivf_topk",
    "heavy_hitters_cms",
    "stratified_sample",
    "approx_distinct_users",
    "hashed_tfidf_knn",
    "mixture_sample_temperature",
    "kmeans_relational_step",
    "chunk_documents",
    "vocab_oov_rate",
    "quality_filter_funnel",
    # round 2 batch 3: sub-document dedup, domain caps, histogram sketch,
    # decayed scores, end-to-end attrition
    "paragraph_dedup",
    "domain_cap_sample",
    "dedup_prefix_containment",
    "histogram_quantile_sketch",
    "decayed_popularity",
    # round 2 batch 4: hybrid retrieval + graph rank + rolling distinct
    "keyword_bm25_topk",
    "hybrid_rrf_fusion",
    "colbert_maxsim_topk",
    "pagerank_step_suppliers",
    "rolling_wau_stickiness",
    # round 2 batch 5: pipe SQL, grouped-agg pandas UDF, incremental
    # dedup store, text-lines roundtrip
    "sql_pipe_aggregate",
    "pandas_mad_by_type",
    "incremental_dedup_store",
    "text_roundtrip_agg",
    # round 2 batch 6: recursive CTE, diversity score, grouped sketch
    "rcte_hierarchy_rollup",
    "token_simpson_diversity",
    "histogram_quantiles_by_group",
    # round 2 batch 7: migration-audit checksums, relational power iteration
    "table_checksum_audit",
    "power_iteration_matvec",
    # round 2 batch 8: BPE merge step, winsorization, negative sampling
    "bpe_merge_step",
    "winsorize_by_sketch",
    "negative_sampling_pairs",
    # round 2 batch 9
    "parameterized_sql_filter",
    # round 2 batch 10: vector-compression diagnostics
    "matryoshka_knn_recall",
    "int8_knn_recall",
    # round 2 batch 11: co-visitation, classifier eval, source similarity
    "covisitation_pairs",
    "langid_confusion",
    "source_token_cosine",
    # round 2 batch 12: ANN recall (ngram_containment_pairs not benched —
    # like dedup_ngram_jaccard, the exact shingle self-join is the
    # verify path; its candidate machinery is already timed via
    # dedup_minhash_lsh)
    "ann_recall_at_k",
    # round 2 batch 13: burst detection, bigram novelty, attribution
    "events_burst_detection",
    "bigram_novelty_rate",
    "first_touch_attribution",
    # round 2 batch 14: containment sketches, passage mining, Markov,
    # autocorrelation, target encoding, interpolation gap fill. The two
    # convergence loops (pagerank_converged, power_iteration_converged)
    # are not benched for the dedup_end_to_end reason below — fixed
    # multi-job scheduling overhead, their single sweeps ARE benched
    # (pagerank_step_suppliers, power_iteration_matvec).
    "containment_minhash_pairs",
    "duplicate_passage_spans",
    "next_event_markov",
    "events_autocorr",
    "target_encoding_smoothed",
    "events_gap_fill_interp",
    # round 2 batch 15: integer-exact outliers, exact median/MAD,
    # portable seasonality
    "embedding_outliers_by_label",
    "exact_median_mad_by_type",
    "hourly_seasonality_profile",
    # round 2 batch 16 (pii_cluster_quarantine not benched — iterative CC
    # rounds, the dedup_end_to_end reason)
    "cross_source_dup_matrix",
    # round 2 batch 17
    "bloom_seen_customers",
    "mmr_rerank_topk",
    # round 2 batch 18 (dedup_rewrite_survivors not benched — iterative
    # CC rounds, the dedup_end_to_end reason)
    "global_shuffle_positions",
    # round 2 batch 19
    "events_trend_slope",
    "session_pattern_match",
    # round 2 batch 20
    "dataset_datasheet",
    # round 2 batch 21
    "events_anomaly_mad",
    "orders_market_basket",
    # round 2 batch 22 (leakage_safe_split intentionally not benched:
    # its connected-components rounds are fixed job-scheduling overhead
    # on local[32], same rationale as dedup_clusters/dedup_end_to_end)
    "bpe_apply_encode",
    "length_bucket_padding",
    "events_changepoint_cusum",
    # round 2 batch 24
    "join_size_estimate_cms",
    "partition_skew_report",
    # round 2 batch 25 (dedup_graph_stats not benched: CC-loop overhead,
    # same rationale as dedup_clusters)
    "funnel_conversion_windowed",
    "events_retention_cohorts",
    "parts_abc_pareto",
    # round 2 batch 26
    "dedup_oph_pairs",
    # round 2 batch 27 (dedup_threshold_sweep not benched: it scans the
    # exact n-gram pair list, which is the unbenched verify path — same
    # policy as dedup_ngram_jaccard / ngram_containment_pairs)
    "vocab_coverage_curve",
    "split_drift_ks_check",
    "ann_probe_recall_curve",
    "corpus_shard_manifest",
    "ivf_probe_recall_curve",
    # round 2 batch 29 (dedup_keep_best_rewrite not benched: CC loop,
    # same rationale as dedup_clusters)
    "parallel_text_mining",
    "multimodal_exact_dedup",
    # round 2 batch 30 (semantic_clusters not benched: CC loop)
    "ab_test_readout",
    "customer_rfm_segments",
    "blocklist_screen",
    # round 3 batch 1: repetition filter, tokenizer fertility, mixture plan
    "repetition_filter_report",
    "tokenizer_fertility_by_lang",
    "mixture_weights_plan",
    # round 3 batch 2: IVF balance + triangle census (lsh_candidate_quality
    # not benched — it scans the exact n-gram pair list, the verify path,
    # same policy as dedup_ngram_jaccard / dedup_threshold_sweep)
    "ivf_cell_balance_report",
    "covisitation_triangles",
    # round 3 batch 3: hubness census, retriever agreement, bootstrap CI
    "knn_hubness_report",
    "retrieval_rank_correlation",
    "poisson_bootstrap_ci",
    # dedup_end_to_end intentionally not benched: like dedup_clusters, the
    # iterative CC rounds are fixed job-scheduling overhead on local[32]
    # that would swamp the per-query timing without measuring data work
    # round 6: model-based data selection (operators/dsir.py)
    "dsir_importance_topk",
    "dsir_gumbel_resample",
    "quality_classifier_funnel",
    "lm_bigram_xent_by_lang",
    # round 6: compressed-index recall gates (PQ-ADC + binary sign)
    "pq_adc_knn_recall",
    "binary_hamming_knn_recall",
    # round 6: unigram-LM Viterbi segmentation (mapInPandas DP)
    "viterbi_segment_cost",
    # round 8: chunk-first Viterbi over >=1024-char synthetic long docs,
    # and the full unigram-LM EM round (E + backtrace counts + M + E)
    "viterbi_segment_chunked",
    "unigram_lm_em_round",
    # round 8 continuation: MOSS winnowing fingerprints, char-entropy
    # quality signals, CCNet perplexity terciles, SentencePiece prune
    "winnowing_fingerprints",
    "char_entropy_quality",
    "ccnet_ppl_buckets",
    "unigram_lm_prune_round",
    "bpe_train_merges",
    "token_zipf_fit",
    "doremi_mixture_update",
    "winnow_dup_pairs",
    # round 7: every previously-unbenched query that measures >=0.4s at
    # sf0.1 joins the headline set (round-6 judge item #4: no silent
    # omissions — below ~3x the run-to-run noise floor a per-query
    # timing measures scheduling jitter, not the plan; those stay in
    # BENCH_EXCLUDED with reasons)
    "ingest_pipeline",
    "contamination_ngram_overlap",
    "semantic_decontamination",
    "repetition_signals",
    "embedding_quantize_int8",
    "orc_roundtrip_agg",
    "embedding_source_centroid_drift",
    "array_tail_slice",
    "doc_rare_token_profile",
    "sql_api_passthrough",
    "genre_groups",
    "events_scd2_intervals",
    "shard_balance_report",
    "projection_coalesce",
    "search_browse",
    "union_ranked_unranked",
    "events_ols_hour_dow",
    "observed_ingest_qc",
    "mllib_embed_knn",
    "avg_norm_by_label",
    "null_safe_director_join",
]

# Iterative-convergence tier (round-6 judge item #1: the engine's
# heaviest path was in no committed perf artifact). These run a
# data-dependent number of connected-components / power-iteration
# rounds (one materializing action per round, operators/cluster.py,
# operators/iterative.py), so their wall time is dominated by fixed
# job-scheduling constants on local[32] — benched in their OWN tier
# with a separate total so the headline's round-over-round comparisons
# aren't swamped, never silently omitted.
BENCH_HEAVY = [
    "dedup_clusters",
    "dedup_end_to_end",
    "dedup_rewrite_survivors",
    "dedup_keep_best_rewrite",
    "dedup_graph_stats",
    "semantic_clusters",
    "pii_cluster_quarantine",
    "leakage_safe_split",
    "corpus_release_report",
    "pagerank_converged",
    "power_iteration_converged",
    # round 9: SentencePiece training loop — data-dependent round count
    # with a driver-side early exit, same tier rationale as the CC loops
    "unigram_lm_train_converged",
]

# Exclusion policy (round-6 judge item #4): every registry query is in
# exactly ONE of BENCH_QUERIES / BENCH_HEAVY / BENCH_EXCLUDED —
# enforced by tests/test_bench_policy.py, so a new query cannot be
# silently unmeasured. Reasons, measured at sf0.1 on local[32]:
_PAIR_VERIFY = (
    "exact shingle-pair self-join that exists to VERIFY banded-LSH "
    "candidates (SURVEY §7); the production candidate path is benched "
    "via dedup_minhash_lsh / containment_minhash_pairs / dedup_oph_pairs"
)
_SUB_NOISE = (
    "sub-noise-floor at sf0.1 (<0.4s ~ 3x run-to-run jitter, "
    "DRIFT_r5); timing would measure scheduling, not the plan"
)
_MOVIEGEN = (
    "Python DataSource fixture over a FIXED 2000-row synthetic stream "
    "— size is sf-invariant, so a per-sf benchmark row would be "
    "meaningless; the source machinery is covered by tests/test_pysource.py"
)
BENCH_EXCLUDED = {
    "dedup_ngram_jaccard": _PAIR_VERIFY,
    "ngram_containment_pairs": _PAIR_VERIFY,
    "dedup_threshold_sweep": _PAIR_VERIFY,
    "lsh_candidate_quality": _PAIR_VERIFY,
    "dedup_minhash_signature": (
        "signature-computation STAGE of dedup_minhash_lsh, which is "
        "benched end-to-end"
    ),
    "moviegen_source_rows": _MOVIEGEN,
    "moviegen_source_agg": _MOVIEGEN,
    "moviegen_curate_roundtrip": _MOVIEGEN,
    "curate_stream_corpus": _MOVIEGEN
    + "; additionally a real StreamingQuery whose wall time is "
    "micro-batch trigger pacing, not plan work",
    "anti_join_new_keys": _SUB_NOISE + " (0.39s; broadcast anti-join)",
    "count_scan": _SUB_NOISE + " (0.13s; metadata-only count)",
    "cube_lang_source": _SUB_NOISE
    + " (0.14s; CUBE twin of benched grouping_sets_lang_source)",
    "distinct_keys": _SUB_NOISE + " (0.09s; key-projection distinct)",
    "embedding_norm_histogram": _SUB_NOISE + " (0.18s; bounded agg)",
    "embedding_text_assembly": _SUB_NOISE + " (0.37s; map-only projection)",
    "events_props_variant": _SUB_NOISE
    + " (0.35s; VARIANT twin of benched events_props_json)",
    "explode_top_words": _SUB_NOISE + " (0.26s; explode + bounded top-n)",
    "ingest_with_cost_accounting": _SUB_NOISE
    + " (0.23s; observed-metrics twin of benched ingest_parse)",
    "intersect_except_keys": _SUB_NOISE + " (0.22s; set-op key scans)",
    "kfold_assignment_counts": _SUB_NOISE
    + " (0.34s; hash-split twin of benched train_test_split)",
    "knn_prefiltered": _SUB_NOISE
    + " (0.15s; selective-prefilter variant of benched knn_topk)",
    "lang_source_listagg": _SUB_NOISE + " (0.14s; bounded listagg)",
    "min_max_year_range": _SUB_NOISE + " (0.11s; 2-value agg)",
    "multi_key_sort": _SUB_NOISE + " (0.08s; top-n sort)",
    "multimodal_frame_plan": _SUB_NOISE
    + " (0.17s; frame-sampling plan over the 3-row media fixture)",
    "point_lookup": _SUB_NOISE + " (0.09s; single-key lookup)",
    "profile_json_lookup": _SUB_NOISE + " (0.08s; single-doc JSON read)",
    "salted_agg_events": _SUB_NOISE
    + " (0.24s; salting twin of benched salted_join_users)",
    "scan_filter_limit": _SUB_NOISE + " (0.15s; limit+offset scan)",
    "semi_join_active": _SUB_NOISE + " (0.16s; broadcast semi-join)",
    "slug_derive": _SUB_NOISE + " (0.08s; map-only derivation)",
    "top_k_sort": _SUB_NOISE + " (0.09s; TakeOrdered top-k)",
    "year_patch_clamp": _SUB_NOISE + " (0.12s; map-only clamp)",
}


# Pinned drift-calibration set (round-7 judge item #3): a fixed,
# plan-diverse probe timed FIRST every run and stamped into the output
# as calibration_sec. Round-over-round comparisons normalize by the
# calibration ratio instead of an ad-hoc same-code rerun (ROUND7_NOTES
# §7 did that by hand; this makes it structural).
#
# Membership policy (revised round 10, judge item #7): probes must be
# PLAN-STABLE — drawn only from queries whose implementation closure
# (plans/fingerprint.py) lives in modules not under active development,
# so a probe's own plan change can never masquerade as machine drift
# (round 9: dedup_minhash_lsh gained the shingle kernel and had to be
# median-ed out). tests/test_bench_policy.py asserts every probe's
# fingerprint matches the frozen QUERY_FPRINTS_HEAD.json snapshot — a
# same-round probe-plan change fails CI instead of contaminating the
# ratio. The round-10 swap (dedup_minhash_lsh, pack_sequences →
# q5_region_revenue, pandas_mad_by_type) degrades one round of deltas
# gracefully: _normalized_delta ratios are computed over the probes
# COMMON to both rounds (3 survivors for r10-vs-r9), full 5 from r11.
CALIBRATION_QUERIES = [
    "q1_pricing_summary",   # scan-heavy agg, whole-stage codegen
    # round 12 (r11 verdict item #1): knn_topk's plan changed mid-round-11
    # (the vector.py cosine nullif rewrite reached it), breaking the probe
    # freeze — tests caught it, the swap didn't happen, and the r11
    # normalization chain ran with one contaminated probe (conservative
    # direction: a faster probe understates the normalized improvement).
    # Swapped for q9_product_profit: 5-table join + agg, whole-stage
    # codegen, closure = {plans.catalog} only (no operator/function
    # modules), so future kernel work cannot drift it. r12-vs-r11 deltas
    # normalize over the 5 surviving common probes.
    "q9_product_profit",    # 5-table join chain + agg, codegen JVM path
    "q5_region_revenue",    # multi-table join chain, shuffle path
    "events_hourly",        # timestamp bucketing window agg
    "pandas_mad_by_type",   # GROUPED_AGG pandas UDF, Python workers
    # round 11 (judge task #2): second Python-worker-path probe so that
    # class has in-run redundancy — r10's drift hit Python workers
    # 1.7-2.5x while JVM queries ran flat, and the 3 surviving probes
    # were all JVM-path, so the normalization could not see it.
    # functions/sentences.py is not under active development (probe
    # plan-stability policy above).
    "sentence_split_udtf",  # Arrow Python UDTF, Python workers
]

# Execution-path class per probe (round-11 judge task #2): machine
# drift is not uniform across paths — contention hits the Python
# worker pool (mapInPandas / GROUPED_AGG / UDTF, Arrow IPC + pickled
# control plane) disproportionately vs whole-stage-codegen JVM stages.
# _normalized_delta normalizes each benched query by the probe ratios
# of ITS OWN path class (benched queries are classified at run time
# from their physical plan, see _exec_path).
CALIBRATION_PATHS = {
    "q1_pricing_summary": "jvm",
    "q9_product_profit": "jvm",
    "q5_region_revenue": "jvm",
    "events_hourly": "jvm",
    "pandas_mad_by_type": "python",
    "sentence_split_udtf": "python",
}

# Quiet-floor set (round-11 judge task #1): the ~20 most expensive
# headline entries by the r10 driver table — together ≈33% of raw
# common-209 wall time, and the entire population in which the r10
# driver-vs-builder discrepancy (+7.16% vs −3.0% normalized)
# concentrated. tools/heavy_quiet.py --tier headline times these on a
# quiet box (min-of-N, probe-bracketed, cross-run min-merged at the
# same commit) into QUIET_r{N}.json; _floor_cross_check stamps the
# driver's per-query reading against that committed floor so a
# contended driver run is adjudicated per query instead of argued
# about per round.
QUIET_FLOOR_QUERIES = [
    "unigram_lm_em_round",
    "winnowing_fingerprints",
    "viterbi_segment_cost",
    "winnow_dup_pairs",
    "semantic_decontamination",
    "knn_hubness_report",
    "dedup_embedding_cosine",
    "parallel_text_mining",
    "doremi_mixture_update",
    "unigram_lm_prune_round",
    "viterbi_segment_chunked",
    "ccnet_ppl_buckets",
    "lm_bigram_xent_by_lang",
    "orders_market_basket",
    "pq_adc_knn_recall",
    "table_checksum_audit",
    "ingest_pipeline",
    "embedding_quantize_int8",
    "dedup_minhash_lsh",
    "dedup_oph_pairs",
]

# physical-plan markers of Python-worker execution (Arrow-batched
# pandas UDF / mapInPandas / applyInPandas / UDTF / row-pickling UDF)
_PY_PLAN_MARKERS = (
    "InPandas", "ArrowEvalPython", "BatchEvalPython", "PythonUDTF",
    "MapInArrow", "EvalPythonUDTF",
    # Spark 4.1 names the GROUPED_AGG pandas-UDF node ArrowAggregatePython
    "AggregatePython",
)


def _exec_path(df) -> str:
    """'python' if the query's physical plan runs any Python-worker
    stage, else 'jvm'. Read from the executed plan of the DataFrame the
    registry builder returns — for multi-job queries this sees the
    final job's plan, which is the right label for the dominant serve
    path (the heavy CC loops are normalized by their own tier anyway).
    """
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
    except Exception:
        try:
            plan = df._jdf.queryExecution().toString()
        except Exception:
            return "unknown"
    return "python" if any(m in plan for m in _PY_PLAN_MARKERS) else "jvm"


def _timed_min(spark, sf_dir: str, names: list[str],
               passes: int = 2) -> dict[str, float]:
    """Per-query min-of-N wall time through the noop sink (full
    projection computed + serialized executor-side)."""
    out: dict[str, float] = {}
    for _ in range(passes):
        for name in names:
            fn = Q.QUERIES[name]["spark"]
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            out[name] = round(min(out.get(name, dt), dt), 3)
    return out


def _timed_probes(spark, sf_dir: str) -> dict[str, float]:
    """Calibration probes timed with the catalog plan cache OFF.

    Round 12 memoized per-session scan-plan construction
    (catalog.load_table / films_view), which removes ~20-50 ms of py4j
    construction from every builder call INCLUDING the probes'. The
    probes exist to measure MACHINE drift round-over-round; letting the
    memo speed them up would launder an implementation win into the
    drift ratio (exactly the knn_topk failure mode, in time instead of
    plan shape). Fresh reads keep a probe's construction cost identical
    to every prior round, so probe ratios stay a machine instrument.
    This is a measurement-methodology fix, documented in
    OPTIMIZATION_r12.md; the timed-query protocol (_timed_min through
    the noop sink) is unchanged."""
    import movievectorsearch_spark.catalog as _cat

    prev = _cat.PLAN_CACHE_ENABLED
    _cat.PLAN_CACHE_ENABLED = False
    try:
        return _timed_min(spark, sf_dir, CALIBRATION_QUERIES)
    finally:
        _cat.PLAN_CACHE_ENABLED = prev


def _round_number() -> int:
    """Current build round, inferred from the driver's committed
    BENCH_r{N}.json artifacts (max existing N + 1)."""
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    rounds = [
        int(m.group(1))
        for fn in os.listdir(here)
        if (m := re.fullmatch(r"BENCH_r(\d+)\.json", fn))
    ]
    return max(rounds, default=0) + 1


def _normalized_delta(detail: dict, here: str, round_no: int) -> dict | None:
    """Calibration-normalized round-over-round delta vs the previous
    round's committed BENCH_DETAIL_r{N-1}.json (round-8 judge item #4:
    the r8 run STARTED in a ~1.4x slow machine window and recovered,
    inflating every early query; the head/mid/end calibration probes
    caught it by hand — this makes the normalization automatic).

    Per-query: cur_norm = cur / cal_ratio where cal_ratio is the MEDIAN
    of the three segment ratios (head, mid, end) between runs — the
    median resists a single contaminated probe window. Only queries
    present in both rounds enter the common table."""
    prev_path = os.path.join(here, f"BENCH_DETAIL_r{round_no - 1:02d}.json")
    if not os.path.exists(prev_path):
        return None
    try:
        with open(prev_path) as f:
            prev = json.load(f)
    except (OSError, ValueError):
        return None
    if prev.get("sf") != detail.get("sf"):
        return None  # cross-sf deltas are meaningless
    def _median(vals):
        s = sorted(vals)
        m = len(s) // 2
        return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2

    # Per-PROBE ratios, not total/total: a calibration probe whose PLAN
    # changed between rounds (round 9: dedup_minhash_lsh gained the
    # shingle kernel) would otherwise launder its own speedup into the
    # "machine" ratio and inflate every other query's normalized time.
    # The per-segment median over the 5 probes is robust to 1-2 changed
    # probes; probes deviating >15% from their segment median are
    # reported as outliers so a changed-plan probe is visible.
    seg_ratios, probe_ratios, outliers = {}, {}, {}
    for seg, key in (("head", "calibration"),
                     ("mid", "calibration_mid"),
                     ("end", "calibration_end")):
        cur_m, prev_m = detail.get(key) or {}, prev.get(key) or {}
        common_p = [n for n in cur_m if prev_m.get(n)]
        if common_p:
            rs = {n: round(cur_m[n] / prev_m[n], 4) for n in common_p}
            probe_ratios[seg] = rs
            med = _median(rs.values())
            seg_ratios[seg] = round(med, 4)
            outliers[seg] = {
                n: r for n, r in rs.items() if abs(r / med - 1) > 0.15
            }
        elif prev.get(key + "_sec"):
            seg_ratios[seg] = round(
                detail[key + "_sec"] / prev[key + "_sec"], 4
            )
    if not seg_ratios:
        return None
    cal_ratio = round(_median(seg_ratios.values()), 4)

    # Tier-specific ratios (round-10 judge item #1): the headline tier
    # executes between the head and mid probes, the heavy tier between
    # the mid and end probes — normalizing the heavy tier by the
    # headline-bracketing median left a late-run contention window
    # invisible (r9's heavy "+28.2%" was unattributable: three
    # same-tree runs spanned 60.5/75.6/95.9 s). Each tier's delta is
    # normalized by the median of the per-probe ratios from ITS OWN
    # bracketing probe pair; the overall 3-segment median is kept as
    # calibration_ratio for the stdout line and cross-round context.
    def _bracket_vals(segs: tuple[str, ...], path: str | None = None):
        return [
            r
            for s in segs
            for n, r in probe_ratios.get(s, {}).items()
            if path is None or CALIBRATION_PATHS.get(n) == path
        ]

    def _bracket_ratio(segs: tuple[str, ...]) -> float | None:
        vals = _bracket_vals(segs)
        if not vals:
            vals = [seg_ratios[s] for s in segs if s in seg_ratios]
        return round(_median(vals), 4) if vals else None

    tier_brackets = {"common": ("head", "mid"), "heavy": ("mid", "end")}
    # execution-path class per benched query, recorded by main() from
    # each query's physical plan (round-11 judge task #2): drift can be
    # path-specific — r10's contention hit Python-worker queries
    # 1.7-2.5x while JVM queries ran flat, and a single per-tier median
    # under-corrects exactly that mode. Each query is normalized by the
    # median of ITS path's probe ratios from the tier's bracketing pair;
    # queries with no path label (older artifacts) fall back to the
    # all-probe tier ratio, so pre-r11 comparisons are unchanged.
    paths = detail.get("paths") or {}
    out: dict = {"prev_round": round_no - 1, "segment_ratios": seg_ratios,
                 "probe_ratios": probe_ratios,
                 "probe_outliers": {k: v for k, v in outliers.items() if v},
                 "calibration_ratio": cal_ratio}
    for tier, cur_key, prev_key in (("common", "queries", "queries"),
                                    ("heavy", "heavy", "heavy")):
        cur_t, prev_t = detail.get(cur_key, {}), prev.get(prev_key, {})
        common = sorted(set(cur_t) & set(prev_t))
        if not common:
            continue
        ratio = _bracket_ratio(tier_brackets[tier]) or cal_ratio
        path_ratios = {}
        for p in ("jvm", "python"):
            vals = _bracket_vals(tier_brackets[tier], p)
            if vals:
                path_ratios[p] = round(_median(vals), 4)

        def _ratio_for(name: str) -> float:
            return path_ratios.get(paths.get(name)) or ratio

        deltas = {
            n: round(cur_t[n] / _ratio_for(n) - prev_t[n], 3)
            for n in common
        }
        raw = round(sum(cur_t[n] for n in common), 3)
        norm = round(sum(cur_t[n] / _ratio_for(n) for n in common), 3)
        was = round(sum(prev_t[n] for n in common), 3)
        # per-path aggregates: the audit trail for path-specific drift
        path_totals = {}
        for p in ("jvm", "python", "unknown"):
            ns = [n for n in common if paths.get(n) == p]
            if not ns:
                continue
            p_raw = round(sum(cur_t[n] for n in ns), 3)
            p_norm = round(sum(cur_t[n] / _ratio_for(n) for n in ns), 3)
            p_was = round(sum(prev_t[n] for n in ns), 3)
            path_totals[p] = {
                "n": len(ns),
                "ratio": path_ratios.get(p, ratio),
                "prev_total_sec": p_was,
                "cur_total_raw_sec": p_raw,
                "cur_total_normalized_sec": p_norm,
                "normalized_delta_pct": round(
                    100 * (p_norm - p_was) / p_was, 2),
            }
        ranked = sorted(deltas.items(), key=lambda kv: kv[1])
        # trim each list at the zero crossing: with a small tier every
        # delta can share a sign, and ranked[:8] would list the smallest
        # regressions as "improvements" (r9 heavy block did exactly that)
        improvements = [(n, d) for n, d in ranked[:8] if d < 0]
        regressions = [(n, d) for n, d in ranked[-8:][::-1] if d > 0]
        out[tier] = {
            "n_common": len(common),
            "tier_ratio": ratio,
            "tier_probe_pair": list(tier_brackets[tier]),
            "path_ratios": path_ratios,
            "path_totals": path_totals,
            "n_path_classified": sum(1 for n in common if n in paths),
            "prev_total_sec": was,
            "cur_total_raw_sec": raw,
            "cur_total_normalized_sec": norm,
            "normalized_delta_sec": round(norm - was, 3),
            "normalized_delta_pct": round(100 * (norm - was) / was, 2),
            "top_improvements": dict(improvements),
            "top_regressions": dict(regressions),
        }
    return out


def _floor_cross_check(detail: dict, here: str, round_no: int) -> dict | None:
    """Stamp the run's per-query readings against the committed
    quiet-box floors (round-11 judge task #1): QUIET_r{N}.json for the
    headline floor set, HEAVY_QUIET_r{N}.json for the heavy tier —
    produced by tools/heavy_quiet.py (min-of-N, probe-bracketed,
    cross-run min-merged). This is the instrument that settled the r9
    heavy-tier "+28.2%" as drift: a driver reading far above a
    committed same-tree floor on untouched queries is contention, not
    regression; a reading above floor on a changed query is real. The
    newest artifact at or before this round is used (floors are
    committed at round end, so the driver's round-N run compares
    against the round-N floor of the same tree)."""
    import re

    out = {}
    for tier, prefix, cur_key in (("common", "QUIET", "queries"),
                                  ("heavy", "HEAVY_QUIET", "heavy")):
        best = None
        for fn in os.listdir(here):
            m = re.fullmatch(prefix + r"_r(\d+)\.json", fn)
            if m and int(m.group(1)) <= round_no:
                if best is None or int(m.group(1)) > best[0]:
                    best = (int(m.group(1)), fn)
        if best is None:
            continue
        try:
            with open(os.path.join(here, best[1])) as f:
                art = json.load(f)
        except (OSError, ValueError):
            continue
        floor_sf = str(art.get("sf", "")).rstrip("/").rsplit("sf", 1)[-1]
        if floor_sf and str(detail.get("sf")) != floor_sf:
            continue  # cross-sf floors are meaningless
        cur_t = detail.get(cur_key, {})
        per_query = {}
        for name, row in art.get("queries", {}).items():
            if name in cur_t and isinstance(row, dict) and row.get("min"):
                per_query[name] = {
                    "floor": row["min"],
                    "cur": cur_t[name],
                    "ratio": round(cur_t[name] / row["min"], 3),
                }
        if not per_query:
            continue
        total_floor = round(sum(v["floor"] for v in per_query.values()), 3)
        total_cur = round(sum(v["cur"] for v in per_query.values()), 3)
        out[tier] = {
            "artifact": best[1],
            "floor_round": best[0],
            "floor_commit": art.get("commit"),
            "floor_runs": art.get("runs"),
            "n": len(per_query),
            "total_floor_sec": total_floor,
            "total_cur_sec": total_cur,
            "total_ratio": round(total_cur / total_floor, 3),
            "above_1p5x": sorted(
                n for n, v in per_query.items() if v["ratio"] >= 1.5),
            "per_query": per_query,
        }
    return out or None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="mvs-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: touch the session + codegen paths once
    Q.QUERIES["count_scan"]["spark"](spark, sf_dir).collect()

    # drift calibration: pinned probe, timed first, own warmup pass
    for name in CALIBRATION_QUERIES:
        Q.QUERIES[name]["spark"](spark, sf_dir).count()
    calibration = _timed_probes(spark, sf_dir)
    calibration_sec = round(sum(calibration.values()), 3)
    print(f"# calibration: {calibration_sec:.3f}s "
          + json.dumps(calibration), file=sys.stderr)

    # two timed passes, min per query: the host shows intermittent
    # multi-second stalls (VM steal) — interleaving decorrelates the
    # repeat from the stall, where back-to-back repeats would both hit it.
    # Cache policy (round 3): building a registry query now RELEASES the
    # previous query's persisted intermediates (plans/queries.py
    # release_persisted — the advisor's cache-accumulation fix), so every
    # timed run is build+serve over a cold cache; only the DISK-persisted
    # ANN index/store paths keep their serve-path warm second pass.
    # row counts (diagnostics only) come from an untimed first pass that
    # doubles as the per-query warmup; the timed passes execute the FULL
    # projection through a noop write — every output column computed and
    # serialized executor-side, nothing driver-collected.
    rows: dict[str, int] = {}
    paths: dict[str, str] = {}
    for name in BENCH_QUERIES:
        df = Q.QUERIES[name]["spark"](spark, sf_dir)
        rows[name] = df.count()
        paths[name] = _exec_path(df)
    timings = _timed_min(spark, sf_dir, BENCH_QUERIES)
    for name in BENCH_QUERIES:
        print(f"# {name}: {timings[name]:.3f}s ({rows[name]} rows)", file=sys.stderr)

    # mid-suite calibration re-probe (ROUND8_NOTES §9 found the box's
    # steal windows move WITHIN a 20-minute run, which the run-head
    # probe alone cannot capture): same frozen probe, timed again after
    # the headline tier and once more after the heavy tier, so a reader
    # can see whether the machine drifted DURING the measurement.
    calibration_mid = _timed_probes(spark, sf_dir)
    calibration_mid_sec = round(sum(calibration_mid.values()), 3)
    print(f"# calibration (post-headline): {calibration_mid_sec:.3f}s",
          file=sys.stderr)

    # heavy tier: same warmup + 2-pass-min protocol, separate total
    heavy_rows: dict[str, int] = {}
    for name in BENCH_HEAVY:
        df = Q.QUERIES[name]["spark"](spark, sf_dir)
        heavy_rows[name] = df.count()
        paths[name] = _exec_path(df)
    heavy = _timed_min(spark, sf_dir, BENCH_HEAVY)
    for name in BENCH_HEAVY:
        print(f"# heavy {name}: {heavy[name]:.3f}s ({heavy_rows[name]} rows)",
              file=sys.stderr)

    calibration_end = _timed_probes(spark, sf_dir)
    calibration_end_sec = round(sum(calibration_end.values()), 3)
    print(f"# calibration (post-heavy): {calibration_end_sec:.3f}s",
          file=sys.stderr)

    total = round(sum(timings.values()), 3)
    heavy_total = round(sum(heavy.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "", 1).isdigit() else sf

    # Full per-query map goes to a FILE: round 1's stdout line carried all
    # 83 timings (~3.5 KB) and overflowed the driver's tail capture, so
    # BENCH_r01.json recorded "parsed": null. Keep the stdout line short.
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json")
    slow5 = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:5])
    detail = {"metric": "headline_query_wall_time", "value": total,
              "unit": "sec", "sf": sf_val, "queries": timings, "rows": rows,
              "paths": paths,
              "slowest5": slow5, "heavy": heavy, "heavy_rows": heavy_rows,
              "heavy_total_sec": heavy_total,
              "calibration_sec": calibration_sec,
              "calibration": calibration,
              "calibration_mid_sec": calibration_mid_sec,
              "calibration_end_sec": calibration_end_sec,
              "calibration_mid": calibration_mid,
              "calibration_end": calibration_end,
              "excluded": BENCH_EXCLUDED}
    round_no = _round_number()
    norm = _normalized_delta(detail, os.path.dirname(os.path.abspath(__file__)),
                             round_no)
    if norm is not None:
        detail["normalized_common_delta"] = norm
        print("# normalized_common_delta: " + json.dumps(
            {k: v for k, v in norm.items() if k != "common"}
            | {"common": {k: v for k, v in norm.get("common", {}).items()
                          if not k.startswith("top_")}}), file=sys.stderr)
    floors = _floor_cross_check(
        detail, os.path.dirname(os.path.abspath(__file__)), round_no)
    if floors is not None:
        detail["floor_cross_check"] = floors
        print("# floor_cross_check: " + json.dumps(
            {t: {k: v for k, v in blk.items() if k != "per_query"}
             for t, blk in floors.items()}), file=sys.stderr)
    # fold in the latest scaling-probe table (tools/scaling_probe.py:
    # per-query exponent from an 8x blown-up copy of the big tables)
    scaling_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "SCALING.json")
    if os.path.exists(scaling_path):
        try:
            with open(scaling_path) as f:
                detail["scaling"] = json.load(f)
        except (OSError, ValueError):
            pass
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
    # per-round snapshot (round-7 judge item #5): BENCH_DETAIL.json is
    # overwritten each round, so a full round-over-round per-query delta
    # table needed git archaeology; stamp a committed copy per round.
    round_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              f"BENCH_DETAIL_r{round_no:02d}.json")
    with open(round_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_time",
                "value": total,
                "unit": "sec",
                "sf": sf_val,
                "n_queries": len(timings),
                "queries": slow5,
                "heavy_total_sec": heavy_total,
                "n_heavy": len(heavy),
                "calibration_sec": calibration_sec,
                "calibration_mid_sec": calibration_mid_sec,
                "calibration_end_sec": calibration_end_sec,
                **(
                    {
                        "calibration_ratio_vs_prev": norm["calibration_ratio"],
                        "normalized_common_delta_pct": norm["common"][
                            "normalized_delta_pct"
                        ],
                    }
                    if norm is not None and "common" in norm
                    else {}
                ),
                **(
                    {
                        "floor_total_ratio": {
                            t: blk["total_ratio"]
                            for t, blk in floors.items()
                        }
                    }
                    if floors is not None
                    else {}
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
