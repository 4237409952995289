"""Round-8 continuation entries: char-entropy quality signal, CCNet
perplexity buckets, and the SentencePiece prune round — operator-level
invariants beyond the oracle hash gate."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from movievectorsearch_spark.plans import queries as Q


def test_char_entropy_matches_python(spark):
    rows = [
        (0, "aaaa", "en", "s0"),          # zero entropy
        (1, "abab", "en", "s0"),          # 1 bit = ln2 nats
        (2, "abcd", "fr", "s1"),          # 2 bits = ln4 nats
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    df.createOrReplaceTempView("_ent_docs")
    # reuse the registry builder's arithmetic by inlining the same plan
    # on a tiny frame: explode chars, quantize per-term, exact div
    c = (
        df.select("doc_id", F.explode(F.split("text", "")).alias("ch"))
        .groupBy("doc_id", "ch")
        .agg(F.count("*").alias("cnt"))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id")
    got = {
        r.doc_id: r.ent
        for r in c.withColumn("n", F.sum("cnt").over(w))
        .withColumn(
            "lam",
            F.floor(-F.log(F.col("cnt") / F.col("n")) * 1_000_000).cast("bigint"),
        )
        .groupBy("doc_id")
        .agg(F.expr("sum(cnt * lam) div max(n)").alias("ent"))
        .collect()
    }

    def ref(text):
        n = len(text)
        cnts = {}
        for ch in text:
            cnts[ch] = cnts.get(ch, 0) + 1
        return sum(c * math.floor(-math.log(c / n) * 1_000_000) for c in cnts.values()) // n

    for doc_id, text, _, _ in rows:
        assert got[doc_id] == ref(text)
    assert got[0] == 0
    # ln2 / ln4 nats in ppm (floor-quantized)
    assert abs(got[1] - 693_147) <= 1
    assert abs(got[2] - 1_386_294) <= 1


def test_char_entropy_registry_rollup(spark, sf_dir):
    out = Q.QUERIES["char_entropy_quality"]["spark"](spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        assert r.min_ent_ppm <= r.avg_ent_ppm <= r.max_ent_ppm
        assert 0 <= r.n_low <= r.n_docs


def test_ccnet_buckets_are_balanced_terciles(spark, sf_dir):
    out = Q.QUERIES["ccnet_ppl_buckets"]["spark"](spark, sf_dir).collect()
    by_lang: dict[str, list] = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rows in by_lang.items():
        rows.sort(key=lambda r: r.bucket)
        assert [r.bucket for r in rows] == [1, 2, 3]
        # ntile: earlier buckets are >= later ones, spread <= 1
        sizes = [r.n_docs for r in rows]
        assert sizes[0] >= sizes[1] >= sizes[2] >= sizes[0] - 1
        # xent strictly stratified: head max <= middle min, etc.
        assert rows[0].max_xent_ppm <= rows[1].min_xent_ppm
        assert rows[1].max_xent_ppm <= rows[2].min_xent_ppm


def test_prune_round_costs_monotone(spark, sf_dir):
    out = Q.QUERIES["unigram_lm_prune_round"]["spark"](spark, sf_dir).collect()
    assert len(out) > 0
    n_multi = out[0].n_multi
    n_kept = out[0].n_kept
    assert n_kept == (3 * n_multi + 3) // 4
    assert 0 < n_kept <= n_multi
    for r in out:
        # a pruned model can only segment at equal-or-higher cost,
        # with equal-or-more pieces
        assert r.sum_cost3_ppm >= r.sum_cost2_ppm
        assert r.sum_pieces3 >= r.sum_pieces2
