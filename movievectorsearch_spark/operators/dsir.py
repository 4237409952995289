"""Model-based data selection: DSIR importance resampling, hashed
linear quality classification, and an n-gram LM perplexity proxy.

The reference curates its corpus by hand (its ingestion loop generates
already-clean rows — movie_generator.py:240-327); a 100 TB pretraining
pipeline instead SELECTS data with lightweight models, and all three
public recipes share one Spark shape: a tiny model table (hashed-bucket
statistics, a weight vector, an n-gram count table — kilobytes, bounded
by the feature space not the corpus) built with one aggregation pass,
then a map-side broadcast join that scores every document without a
corpus-sized shuffle. That shape survives 1000 executors unchanged: the
model fits in every executor's memory and scoring is embarrassingly
parallel.

- **DSIR** (Data Selection via Importance Resampling, Xie et al. 2023,
  arXiv:2302.03169): hashed n-gram features, per-bucket log-ratio
  between a target distribution (here: the ``lang='en'`` slice) and the
  raw corpus, per-document importance = Σ tf_b·λ_b, then Gumbel-top-k
  resampling. λ is quantized ONCE per bucket (floor(·1e6), the house
  fixed-point recipe — pipeline/featurizer.py precedent), so the
  per-document score is an EXACT integer dot product and the only
  cross-engine float surface is DIM ln() calls.
- **Hashed linear classifier** (the fastText-style quality filter of
  CCNet/DCLM): a deterministic weight per hash bucket (affine-permuted
  bucket id — stands in for trained weights with zero float surface),
  score = Σ tf_b·w_b as pure int64, filter at a margin. Exactly the
  plumbing a real exported linear model needs: broadcast the weight
  table, one map-side dot product per document.
- **Char-bigram LM cross-entropy** (the KenLM-perplexity filter of
  CCNet, at bigram order): train add-one-smoothed p(c₂|c₁) on the
  corpus in one pass (model ≤ |charset|² rows), score each document's
  mean negative log-likelihood via per-bigram quantized λ — again an
  exact integer sum divided with integer `div`.

Every operator returns exact-integer (or quantized-once) columns, so
plans/queries.py gives each a full DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from movievectorsearch_spark.functions.hashing import (
    P,
    int_mix,
    minhash_coeffs,
    poly_hash,
)
from movievectorsearch_spark.functions.text import tokens

PPM = 1_000_000

DSIR_DIM = 128  # hashed feature buckets (paper uses 10k; corpus-scaled)
CLF_DIM = 64  # classifier feature buckets
CLF_SEED = 13  # affine coefficients for the deterministic weight vector


def doc_bucket_tf(
    docs: DataFrame, dim: int, carry: list[str] | None = None
) -> DataFrame:
    """(doc_id, *carry, bucket, tf): hashed-unigram term frequencies.

    One explode + groupBy; the result is corpus-sized but never
    shuffled wider than (doc_id, bucket) — downstream model joins
    broadcast the model side. ``carry`` lists doc-level columns
    (lang, source, ...) threaded through the explode so no consumer
    ever needs a corpus×corpus join back to ``docs`` just to label
    results — they are functionally dependent on doc_id, so adding
    them to the grouping key changes no cardinality, only avoids a
    second shuffle of the documents table."""
    carry = carry or []
    return (
        docs.select(
            "doc_id", *carry, F.explode(tokens(F.col("text"))).alias("tok")
        )
        .select(
            "doc_id", *carry, (poly_hash(F.col("tok")) % dim).alias("bucket")
        )
        .groupBy("doc_id", *carry, "bucket")
        .agg(F.count("*").alias("tf"))
    )


def dsir_lambda_table(
    tf: DataFrame, dim: int, target_lang: str = "en"
) -> DataFrame:
    """(bucket, lam_ppm): quantized per-bucket log importance ratio
    λ_b = floor((ln p̂_target(b) − ln p̂_raw(b))·1e6), add-one smoothed.

    ≤ dim rows — the broadcastable DSIR "model". Buckets no target
    token ever hits still get a (smoothed) negative λ, so the table is
    densified over all dim buckets. ``tf`` must carry a ``lang``
    column (doc_bucket_tf with carry=["lang"]).
    """
    stats = tf.groupBy("bucket").agg(
        F.sum("tf").alias("c_r"),
        F.sum(
            F.when(F.col("lang") == target_lang, F.col("tf")).otherwise(0)
        ).alias("c_t"),
    )
    # densify: every bucket in [0, dim) appears even if unseen
    all_b = tf.sparkSession.range(dim).select(F.col("id").alias("bucket"))
    stats = (
        all_b.join(stats, "bucket", "left")
        .fillna(0, subset=["c_r", "c_t"])
    )
    tot = stats.agg(
        F.sum("c_r").alias("t_r"), F.sum("c_t").alias("t_t")
    )
    lam = (
        F.log((F.col("c_t") + 1) / (F.col("t_t") + dim))
        - F.log((F.col("c_r") + 1) / (F.col("t_r") + dim))
    ) * PPM
    return stats.crossJoin(F.broadcast(tot)).select(
        "bucket", F.floor(lam).cast("bigint").alias("lam_ppm")
    )


def dsir_weights(
    docs: DataFrame,
    dim: int = DSIR_DIM,
    target_lang: str = "en",
    persist=None,
) -> DataFrame:
    """(doc_id, dsir_ppm): exact-integer per-document DSIR importance
    Σ_b tf_b·λ_b. tf is per-document (≤ doc length) and |λ| ≤ ~20e6,
    so the sum stays far inside int64 regardless of corpus size — the
    operands are document-sized, not corpus-sized, so the DECIMAL
    widening rule (ROUND4 notes) does not apply."""
    tf = doc_bucket_tf(docs, dim, carry=["lang"])
    if persist is not None:
        # tf feeds BOTH the model build and the scoring join — persist
        # through the caller's cache registry so the explode+groupBy
        # runs once (released after the query, bench cache policy)
        tf = persist(tf)
    lam = dsir_lambda_table(tf, dim, target_lang)
    return (
        tf.join(F.broadcast(lam), "bucket")
        .groupBy("doc_id")
        .agg(F.sum(F.col("tf") * F.col("lam_ppm")).alias("dsir_ppm"))
    )


def gumbel_ppm(doc_id: Column) -> Column:
    """floor(g·1e6) where g = −ln(−ln(u)) and u = (int_mix(id)+0.5)/P —
    the deterministic hash-uniform draw (functions/hashing.py int_mix)
    pushed through the Gumbel quantile, for Gumbel-top-k sampling
    ∝ exp(log-weight) without an RNG (Kool et al. 2019 recipe)."""
    u = (int_mix(doc_id).cast("double") + 0.5) / P
    return F.floor(-F.log(-F.log(u)) * PPM).cast("bigint")


def classifier_weight(bucket: Column) -> Column:
    """Deterministic integer weight per bucket in [-1000, 1000]: one
    affine permutation of the bucket id mod 2001, shifted. Stands in
    for an exported linear model's weights with zero float surface —
    swap this expression for a real weight-table join in production."""
    a, b = minhash_coeffs(1, CLF_SEED)[0]
    return ((bucket * a + b) % P) % 2001 - 1000


def classifier_scores(
    docs: DataFrame, dim: int = CLF_DIM, carry: list[str] | None = None
) -> DataFrame:
    """(doc_id, *carry, z): exact-integer linear score Σ_b tf_b·w_b
    over hashed unigram buckets — the fastText-quality-filter plumbing
    (broadcast weights, map-side dot product). Here the weight vector
    is an expression of the bucket id, so the "model join" folds into
    the aggregation itself."""
    carry = carry or []
    tf = doc_bucket_tf(docs, dim, carry=carry)
    return tf.groupBy("doc_id", *carry).agg(
        F.sum(F.col("tf") * classifier_weight(F.col("bucket"))).alias("z")
    )


def char_bigrams(text: Column) -> Column:
    """array of 2-char shingles over the raw text (slice/zip form —
    linear, same rationale as functions/text.word_shingles)."""
    ch = F.split(text, "")
    m = F.size(ch) - 1
    return F.when(
        m >= 1,
        F.zip_with(
            F.slice(ch, 1, m),
            F.slice(ch, 2, m),
            lambda a, b: F.concat(a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))


def bigram_xent(
    docs: DataFrame, carry: list[str] | None = None, persist=None
) -> DataFrame:
    """(doc_id, *carry, n_bigrams, xent_ppm): per-document cross-entropy under
    the corpus's add-one-smoothed char-bigram model, as an exact
    integer — per-bigram λ = floor(−ln p̂(c₂|c₁)·1e6) quantized once in
    the ≤|charset|² model table, per-doc Σ count·λ `div` n_bigrams.

    Two corpus passes (model build, scoring), both map-side joins
    against broadcast model tables; no corpus-sized shuffle beyond the
    (doc_id, bg) count."""
    carry = carry or []
    bg = (
        docs.select(
            "doc_id",
            *carry,
            F.explode(char_bigrams(F.col("text"))).alias("bg"),
        )
        .groupBy("doc_id", *carry, "bg")
        .agg(F.count("*").alias("cnt"))
    )
    if persist is not None:
        # bg feeds both the model build and the scoring join
        bg = persist(bg)
    model = bg.groupBy("bg").agg(F.sum("cnt").alias("c_bg"))
    prefix = model.groupBy(F.substring("bg", 1, 1).alias("c1")).agg(
        F.sum("c_bg").alias("c_prefix")
    )
    vocab = model.select(
        F.countDistinct(F.substring("bg", 2, 1)).alias("v")
    )
    lam = (
        model.withColumn("c1", F.substring("bg", 1, 1))
        .join(F.broadcast(prefix), "c1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "bg",
            F.floor(
                -F.log(
                    (F.col("c_bg") + 1)
                    / (F.col("c_prefix") + F.col("v"))
                )
                * PPM
            )
            .cast("bigint")
            .alias("lam_ppm"),
        )
    )
    return (
        bg.join(F.broadcast(lam), "bg")
        .groupBy("doc_id", *carry)
        .agg(
            F.sum("cnt").alias("n_bigrams"),
            F.sum(F.col("cnt") * F.col("lam_ppm")).alias("sum_ppm"),
        )
        .select(
            "doc_id",
            *carry,
            "n_bigrams",
            F.expr("sum_ppm div n_bigrams").alias("xent_ppm"),
        )
    )
