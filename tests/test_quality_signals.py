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


def test_train_converged_rounds_strictly_monotone(spark, sf_dir):
    """The converged-training loop must (a) execute >= 2 full rounds on
    the test corpus (each EM+prune round strictly reduces the sample's
    optimal segmentation cost), (b) report strictly-decreasing costs
    with prev_cost_ppm chaining exactly, and (c) shrink the multi-char
    vocabulary monotonically (prune only removes; segmentation under a
    pruned model can never choose a pruned piece back)."""
    out = (
        Q.QUERIES["unigram_lm_train_converged"]["spark"](spark, sf_dir)
        .orderBy("round")
        .collect()
    )
    assert len(out) >= 2
    for i, r in enumerate(out):
        assert r.round == i + 1
        assert r.n_kept == (3 * r.n_multi + 3) // 4
        if i + 1 < len(out):  # every non-final round strictly improved
            assert r.sum_cost_ppm < r.prev_cost_ppm
        if i > 0:
            assert r.prev_cost_ppm == out[i - 1].sum_cost_ppm
            assert r.n_multi <= out[i - 1].n_kept
            assert r.vocab_v <= out[i - 1].vocab_v


def _ref_bpe_train(words: dict[str, int], n: int):
    """Reference BPE trainer: weighted adjacent-symbol pair counts,
    argmax with (count DESC, pair ASC) tie-break."""
    enc = {w: list(w) for w in words}
    out = []
    for _ in range(n):
        cnt: dict[tuple, int] = {}
        for w, occ in words.items():
            s = enc[w]
            for a, b in zip(s, s[1:]):
                cnt[(a, b)] = cnt.get((a, b), 0) + occ
        if not cnt:
            break
        # tie-break on the CONCATENATED pair string (the engines order
        # by 'a b'), not the (a, b) tuple
        (a, b), c = min(
            cnt.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}")
        )
        out.append((f"{a} {b}", c))
        for w in enc:
            s, i, ns = enc[w], 0, []
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    ns.append(a + b)
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            enc[w] = ns
    return out


def test_bpe_train_matches_python_reference(spark, sf_dir):
    from movievectorsearch_spark.catalog import load_table
    from movievectorsearch_spark.functions.text import tokens
    from pyspark.sql import functions as F2

    docs = load_table(spark, sf_dir, "documents")
    words = {
        r.word: r.n
        for r in docs.select(F2.explode(tokens(F2.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F2.count("*").alias("n"))
        .collect()
    }
    ref = _ref_bpe_train(words, 8)
    got = [
        (r.pair, r.n_occurrences)
        for r in Q.QUERIES["bpe_train_merges"]["spark"](spark, sf_dir)
        .orderBy("it")
        .collect()
    ]
    assert got == ref
    # winners are distinct merges with non-increasing... counts need not
    # be monotone, but every winner must be a distinct pair
    assert len({p for p, _ in got}) == len(got)


def test_zipf_slope_near_minus_one(spark, sf_dir):
    out = Q.QUERIES["token_zipf_fit"]["spark"](spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        # frequency must decay with rank (the synthetic fixture corpus
        # has a tiny ~30-word vocab per lang, so the slope sits well
        # above natural text's -1 — only the sign and a sane band are
        # fixture-independent)
        assert -3.0 < r.zipf_slope < 0.0
        assert r.n_vocab <= r.n_tokens


def test_zipf_matches_python_ols(spark):
    import math

    rows = [
        (0, "a a a a b b c the the the the the quick brown fox", "en", "s0"),
        (1, "the the quick quick brown fox jumps over a lazy dog a a", "en", "s0"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    # python reference over the same token counts
    cnt: dict[str, int] = {}
    for _, text, _, _ in rows:
        for wtok in text.lower().split():
            cnt[wtok] = cnt.get(wtok, 0) + 1
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    xy = [
        (
            math.floor(math.log(i + 1) * 1_000_000),
            math.floor(math.log(c) * 1_000_000),
        )
        for i, (_, c) in enumerate(ranked)
    ]
    n = len(xy)
    sx = sum(x for x, _ in xy)
    sy = sum(y for _, y in xy)
    sxx = sum(x * x for x, _ in xy)
    sxy = sum(x * y for x, y in xy)
    ref = round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)

    # run the registry builder against a temp parquet of this corpus
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "documents.parquet"))
        got = Q.QUERIES["token_zipf_fit"]["spark"](spark, td).collect()
    assert len(got) == 1
    assert got[0].zipf_slope == ref


def test_doremi_weights_normalize_and_upweight_hard_domains(spark, sf_dir):
    out = Q.QUERIES["doremi_mixture_update"]["spark"](spark, sf_dir).collect()
    assert len(out) > 1
    total = sum(r.weight_ppm for r in out)
    # truncating div: total in (1e6 - n_domains, 1e6]
    assert 1_000_000 - len(out) < total <= 1_000_000
    for r in out:
        assert r.excess_ppm >= 0
    # weights are monotone in excess
    srt = sorted(out, key=lambda r: r.excess_ppm)
    for a, b in zip(srt, srt[1:]):
        assert a.weight_ppm <= b.weight_ppm
    # at least one domain is above baseline (else the update is a no-op)
    assert any(r.excess_ppm > 0 for r in out)
