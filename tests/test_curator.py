"""End-to-end curator dataflow tests (pipeline/curator.py): the
reference's generate→parse→dedup→embed→upsert loop as one Spark job,
batch and streaming.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from movievectorsearch_spark.pipeline.curator import (
    curate_batch,
    curate_stream,
    generated,
    render_movie_text,
)
from movievectorsearch_spark.pipeline.ingest import parse_movie_text


def test_render_parse_roundtrip_small(spark):
    gen = generated(spark, 50)
    parsed = parse_movie_text(render_movie_text(gen)).orderBy("title", "year")
    # F1 strips underscores (reference cleaner) — compare modulo that
    want = (
        gen.select(
            "title",
            "year",
            F.regexp_replace("director", "_", "").alias("director"),
            F.col("plot"),
        )
        .orderBy("title", "year")
        .collect()
    )
    got = parsed.select("title", "year", "director", "plot").collect()
    assert got == want


def test_curate_batch_dedups_against_existing(spark):
    empty = spark.createDataFrame([], "title string, year int, created_at timestamp")
    first = curate_batch(spark, 80, empty).cache()
    n1 = first.count()
    assert n1 > 0
    assert set(first.columns) >= {
        "title", "year", "director", "cast", "genres", "plot",
        "description", "structured_enrichment", "id", "embedding",
    }
    # curating the SAME generated range against the first result must
    # drop every record as an exact duplicate
    again = curate_batch(spark, 80, first.select("title", "year"))
    assert again.count() == 0


def test_curate_stream_builds_deduped_corpus(spark, tmp_path):
    corpus = str(tmp_path / "films")
    q = curate_stream(
        spark,
        corpus_path=corpus,
        checkpoint=str(tmp_path / "ck"),
        count=200,
        rows_per_batch=80,
    )
    try:
        for _ in range(240):
            try:
                if spark.read.parquet(corpus).count() >= 1 and all(
                    p["numInputRows"] == 0 for p in q.recentProgress[-2:]
                ) and len(q.recentProgress) > 3:
                    break
            except Exception:
                pass
            time.sleep(0.5)
    finally:
        q.stop()
    got = spark.read.parquet(corpus)
    n = got.count()
    # every surviving (normalized title, year) key is unique — the
    # corpus is the deduped union of all micro-batches
    keys = got.select(F.lower(F.trim("title")).alias("t"), "year").distinct().count()
    assert keys == n
    # dedup only ever removes rows; generation of 200 with possible
    # title collisions keeps the corpus close to the input size
    assert 100 < n <= 200
    # embeddings materialized for every stored row
    assert got.filter(F.size("embedding") != 64).count() == 0
