"""Scaling probe: does each headline plan's wall time grow ~linearly?

local[32] timings at one SF can hide super-linear behavior (a plan that
is O(n^2) in a blocked join, a window that funnels into one partition).
This probe blows the five big tables up by ``FACTOR`` with shifted keys
(join fan-outs preserved: orderkey shifts consistently across
orders/lineitem, doc_id/vec_id across documents/embeddings), times a
probe set at both scales, and records the per-query scaling exponent

    exponent = log(t_big / t_small) / log(FACTOR)

~1.0 is linear, ~1.1 is n log n at these sizes; anything >1.35 is
flagged. Results land in SCALING.json, and bench.py folds them into
BENCH_DETAIL.json on its next run.

The probe set is restricted to queries whose OUTPUT scales linearly
under replication. The near-dup JOIN queries (fuzzy_band_join, the LSH
band join, SRP-blocked embedding dedup) are excluded by design: blowing
a corpus up by replicating rows multiplies the genuine near-duplicate
PAIRS quadratically, so their time growth measures the answer growing,
not the plan degrading. Their scale story is the blocking knob
(bands/planes scale with log N — operators/dedup.py docstrings), not a
fixed-knob replication probe.

Usage: python tools/scaling_probe.py [factor] [small_sf_dir]
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from movievectorsearch_spark.catalog import TABLES, table_path
from movievectorsearch_spark.plans import queries as Q
from movievectorsearch_spark.session import get_spark

PROBE_QUERIES = [
    # TPC-H shapes: scan-agg, joins, big group-bys
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q9_product_profit",
    "q18_big_orders",
    "q21_waiting_suppliers",
    # vector: top-k constant output
    "knn_topk",
    "knn_batch",
    # dedup (linear stages only — see module docstring)
    "dedup_exact",
    "dedup_minhash_signature",
    "dedup_simhash",
    # text
    "text_profile",
    "token_stats",
    "tfidf_top_terms",
    # events / windows
    "events_hourly",
    "events_sessionize",
    "events_window_frames",
    # global-prefix-sum decomposition
    "pack_sequences",
    # round 2 additions (linear-output shapes)
    "search_vector",
    "upsert_latest_wins",
    "q13_order_distribution",
    "pivot_user_event_counts",
    "events_cum_distinct_users",
    "salted_agg_events",
    "events_ewma",
    "hashed_tfidf_knn",
    "chunk_documents",
    # round 2 batch 3 (linear shapes; dedup_prefix_containment excluded —
    # replication multiplies identical prefixes, growing true pairs
    # quadratically like the other near-dup joins)
    "paragraph_dedup",
    "domain_cap_sample",
    "histogram_quantile_sketch",
    "decayed_popularity",
    # round 2 batch 4 (linear shapes; rrf is bm25+vector re-run, skipped)
    "keyword_bm25_topk",
    "colbert_maxsim_topk",
    "pagerank_step_suppliers",
    "rolling_wau_stickiness",
    # round 2 batch 5 (linear shapes)
    "sql_pipe_aggregate",
    "pandas_mad_by_type",
    "text_roundtrip_agg",
    # round 2 batch 6 (linear shapes; rcte is customer-bounded)
    "token_simpson_diversity",
    "histogram_quantiles_by_group",
    # round 2 batch 7 (linear shapes)
    "table_checksum_audit",
    "power_iteration_matvec",
    # round 2 batch 8 (linear shapes)
    "bpe_merge_step",
    "winsorize_by_sketch",
    "negative_sampling_pairs",
    # round 2 batches 10-11 (linear / capped shapes)
    "matryoshka_knn_recall",
    "int8_knn_recall",
    "covisitation_pairs",
    "langid_confusion",
    "source_token_cosine",
    # round 2 batch 13 (linear shapes)
    "events_burst_detection",
    "bigram_novelty_rate",
    "first_touch_attribution",
    # round 2 batch 14 (linear shapes; containment_minhash_pairs excluded
    # like its pair-join siblings — replication grows true pairs
    # quadratically. duplicate_passage_spans is groupBy-shaped, not a
    # pair join: counts grow under replication but work stays linear)
    "pagerank_converged",
    "power_iteration_converged",
    "duplicate_passage_spans",
    "next_event_markov",
    "events_autocorr",
    "target_encoding_smoothed",
    "events_gap_fill_interp",
    # round 2 batch 15 (linear / linearithmic shapes)
    "embedding_outliers_by_label",
    "exact_median_mad_by_type",
    "hourly_seasonality_profile",
    # round 2 batch 17 (linear shapes; bloom probe is broadcast-join)
    "bloom_seen_customers",
    "mmr_rerank_topk",
    # round 2 batch 18 (two-phase global rank — linearithmic)
    "global_shuffle_positions",
    # round 2 batch 19 (linear shapes)
    "events_trend_slope",
    "session_pattern_match",
    # round 2 batch 20 (linear shapes)
    "dataset_datasheet",
    # round 2 batch 21 (linear / basket-bounded shapes)
    "events_anomaly_mad",
    "orders_market_basket",
    # round 2 batch 22 (vocab-bounded / linear shapes; leakage_safe_split
    # excluded like its pair-join + CC siblings)
    "bpe_apply_encode",
    "length_bucket_padding",
    "events_changepoint_cusum",
    # round 2 batch 24 (scan-speed sketch/diagnostic shapes)
    "join_size_estimate_cms",
    "partition_skew_report",
    # round 2 batch 25 (per-user agg+join chain)
    "funnel_conversion_windowed",
    "events_retention_cohorts",
    "parts_abc_pareto",
    # dedup_oph_pairs excluded like its pair-join siblings (replication
    # grows genuine duplicate pairs quadratically); dedup_threshold_sweep
    # excluded for the same reason (it scans the pair list)
    # round 2 batch 27 (vocab-bounded / scan-speed shapes)
    "vocab_coverage_curve",
    "split_drift_ks_check",
    "corpus_shard_manifest",
    "multimodal_exact_dedup",
    "ab_test_readout",
    "customer_rfm_segments",
    "blocklist_screen",
]

SHIFT_KEYS = {
    # table -> columns that must shift together so join fan-out per key
    # is preserved (8 copies of an order get 8 distinct orderkeys, each
    # with the original's lineitems)
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def build_blowup(spark, src_dir: str, dst_dir: str, factor: int) -> None:
    # one shift constant per key FAMILY (orderkey shared by orders and
    # lineitem; doc_id/vec_id shared by documents and embeddings)
    fam_of = {"o_orderkey": "ok", "l_orderkey": "ok", "event_id": "ev",
              "doc_id": "doc", "vec_id": "doc"}
    fam_shift: dict[str, int] = {}
    for t, cols in SHIFT_KEYS.items():
        df = spark.read.parquet(table_path(src_dir, t))
        m = df.agg(F.max(cols[0])).first()[0]
        fam = fam_of[cols[0]]
        fam_shift[fam] = max(fam_shift.get(fam, 0), int(m) + 1)
    for t in TABLES:
        src = table_path(src_dir, t)
        dst = table_path(dst_dir, t)
        if t not in SHIFT_KEYS:
            shutil.copytree(src, dst) if os.path.isdir(src) else shutil.copy(
                src, dst
            )
            continue
        df = spark.read.parquet(src)
        col = SHIFT_KEYS[t][0]
        shift = fam_shift[fam_of[col]]
        parts = [
            df.withColumn(col, (F.col(col) + F.lit(i * shift)).cast(
                dict(df.dtypes)[col]))
            for i in range(factor)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(dst)


def time_queries(spark, sf_dir: str, names: list[str]) -> dict[str, float]:
    timings: dict[str, float] = {}
    for _pass in range(2):
        for name in names:
            fn = Q.QUERIES[name]["spark"]
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            timings[name] = round(min(timings.get(name, dt), dt), 3)
    return timings


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    src_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="mvs-scaling", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    dst_dir = tempfile.mkdtemp(prefix="spark_graft_blowup_")
    print(f"# building x{factor} blow-up of {src_dir} in {dst_dir}",
          file=sys.stderr)
    build_blowup(spark, src_dir, dst_dir, factor)

    Q.QUERIES["count_scan"]["spark"](spark, src_dir).collect()  # warmup
    t_small = time_queries(spark, src_dir, PROBE_QUERIES)
    t_big = time_queries(spark, dst_dir, PROBE_QUERIES)

    table = {}
    for name in PROBE_QUERIES:
        ratio = t_big[name] / max(t_small[name], 1e-3)
        exponent = math.log(max(ratio, 1e-9)) / math.log(factor)
        table[name] = {
            "t_small": t_small[name],
            "t_big": t_big[name],
            "ratio": round(ratio, 2),
            "exponent": round(exponent, 2),
            "flag": "SUPERLINEAR" if exponent > 1.35 else "",
        }
        print(f"# {name}: {t_small[name]:.2f}s -> {t_big[name]:.2f}s "
              f"(x{ratio:.1f}, exp {exponent:.2f})"
              f"{'  <-- SUPERLINEAR' if exponent > 1.35 else ''}",
              file=sys.stderr)

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING.json")
    with open(out_path, "w") as f:
        json.dump({"factor": factor, "src": src_dir, "queries": table},
                  f, indent=1, sort_keys=True)
    flagged = [n for n, r in table.items() if r["flag"]]
    print(json.dumps({"factor": factor, "n_queries": len(table),
                      "flagged": flagged}))
    shutil.rmtree(dst_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
