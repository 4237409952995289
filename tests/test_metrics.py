"""Accumulator-backed cost accounting (A5/A6) + the S8 schema probe."""

from __future__ import annotations

import pytest

from movievectorsearch_spark.catalog import assert_embedding_schema, load_table
from movievectorsearch_spark.pipeline.metrics import (
    COST_PER_M_EMBED,
    TokenCostTracker,
    embed_with_accounting,
)


def test_token_accounting_matches_corpus(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(50).select("doc_id", "text")
    expected_tokens = sum(len(r["text"].split()) for r in d.collect())
    tracker = TokenCostTracker(spark)
    out = embed_with_accounting(d, tracker)
    n = out.count()
    assert n == 50
    assert tracker.embed_tokens.value == expected_tokens
    assert tracker.records_ok.value == 50
    assert tracker.success_rate == 1.0
    assert tracker.total_cost == pytest.approx(
        expected_tokens / 1e6 * COST_PER_M_EMBED
    )


def test_accounted_embedding_deterministic(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(20).select("doc_id", "text")
    t1, t2 = TokenCostTracker(spark), TokenCostTracker(spark)
    e1 = {r["doc_id"]: r["embedding"] for r in embed_with_accounting(d, t1).collect()}
    e2 = {r["doc_id"]: r["embedding"] for r in embed_with_accounting(d, t2).collect()}
    assert e1 == e2
    assert all(len(v) == 64 for v in e1.values())


def test_schema_probe_passes_on_testdata(spark, sf_dir):
    assert_embedding_schema(spark, sf_dir, expected_dim=64)


def test_schema_probe_rejects_wrong_dim(spark, sf_dir):
    with pytest.raises(ValueError, match="dim"):
        assert_embedding_schema(spark, sf_dir, expected_dim=128)


def test_observed_qc_matches_direct_aggregate(spark, sf_dir):
    """observe() metrics ride the job — they must equal a dedicated
    aggregation pass over the same data."""
    from movievectorsearch_spark.catalog import load_table
    from movievectorsearch_spark.pipeline.metrics import observed_qc_row
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    observed, finish = observed_qc_row(docs)
    observed.write.format("noop").mode("overwrite").save()
    got = finish().collect()[0]
    want = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("s"),
        F.max("n_chars").alias("mx"),
    ).collect()[0]
    assert (got.n_docs, got.sum_chars, got.max_chars) == (
        want.n, want.s, want.mx
    )
    assert got.n_empty == 0  # fixture has no blank docs
