"""Bucketed co-located join: both sides bucketed by the join key →
SortMergeJoin with NO Exchange (the write-time shuffle is the only
shuffle, amortized over every subsequent join)."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from movievectorsearch_spark.catalog import load_table
from movievectorsearch_spark.sources.bucketing import (
    drop_table,
    read_table,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    embs = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    write_bucketed(docs, "b_docs", ["doc_id"], n_buckets=8)
    write_bucketed(
        embs.withColumnRenamed("vec_id", "doc_id"), "b_embs", ["doc_id"], n_buckets=8
    )
    yield "b_docs", "b_embs"
    drop_table(spark, "b_docs")
    drop_table(spark, "b_embs")


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    a, b = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_table(spark, a).join(read_table(spark, b), "doc_id")
        p = _plan(joined)
        assert "SortMergeJoin" in p
        assert "hashpartitioning" not in p  # co-located: no shuffle exchange
        # and it actually computes the right thing
        n = joined.count()
        assert n == read_table(spark, b).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_unbucketed_join_does_exchange(spark, sf_dir):
    """Control: the same join over plain parquet shuffles both sides —
    the bucketed plan's missing Exchange is the bucketing, not luck."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
        embs = load_table(spark, sf_dir, "embeddings").select(
            F.col("vec_id").alias("doc_id"), "label"
        )
        p = _plan(docs.join(embs, "doc_id"))
        assert "hashpartitioning" in p
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
