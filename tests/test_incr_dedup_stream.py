"""Streaming incremental dedup (streaming/incr_dedup.py): novel docs
pass, duplicates of ANY earlier batch (or the pre-seeded store) are
dropped, and the signature store grows so later batches see earlier
stream content."""

from __future__ import annotations

import time

from pyspark.sql import functions as F


def _wait(q, timeout=60):
    q.awaitTermination(timeout)


def test_incremental_dedup_stream_drops_cross_batch_dups(spark, tmp_path):
    from movievectorsearch_spark.streaming.incr_dedup import (
        start_incremental_dedup,
    )

    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    schema = "doc_id long, text string"

    batch1 = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "one two three four five six seven eight"),
        ],
        schema,
    )
    batch1.write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    q = start_incremental_dedup(spark, stream, store, out, ck)
    _wait(q)

    got1 = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got1 == {1, 2}

    # batch 2: one dup of doc 1 (different id), one novel doc
    spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon zeta eta theta"),
            (11, "nine ten eleven twelve thirteen fourteen fifteen sixteen"),
        ],
        schema,
    ).write.mode("append").parquet(src)

    q = start_incremental_dedup(
        spark, spark.readStream.schema(schema).parquet(src), store, out, ck
    )
    _wait(q)

    got2 = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got2 == {1, 2, 11}, got2  # 10 deduped against batch-1 store

    # store carries signatures for every emitted doc
    store_ids = {r.doc_id for r in spark.read.parquet(store).collect()}
    assert {1, 2, 11} <= store_ids


def test_incremental_dedup_stream_is_restart_safe(spark, tmp_path):
    """Replaying the same source batches through a FRESH checkpoint (the
    worst-case replay) re-probes the store and emits nothing new."""
    from movievectorsearch_spark.streaming.incr_dedup import (
        start_incremental_dedup,
    )

    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    schema = "doc_id long, text string"
    spark.createDataFrame(
        [(5, "red orange yellow green blue indigo violet ultraviolet")],
        schema,
    ).write.mode("append").parquet(src)

    q = start_incremental_dedup(
        spark, spark.readStream.schema(schema).parquet(src), store, out,
        str(tmp_path / "ck1"),
    )
    _wait(q)
    q = start_incremental_dedup(
        spark, spark.readStream.schema(schema).parquet(src), store, out,
        str(tmp_path / "ck2"),  # fresh checkpoint → full replay
    )
    _wait(q)
    rows = spark.read.parquet(out).collect()
    assert [r.doc_id for r in rows] == [5]  # replay emitted nothing new


def test_incremental_dedup_within_batch_dups_collapse(spark, tmp_path):
    """Two duplicates arriving in the SAME micro-batch: only the
    smaller id survives (the store can't catch them — they aren't
    appended yet when the batch probes it)."""
    from movievectorsearch_spark.streaming.incr_dedup import (
        start_incremental_dedup,
    )

    src = str(tmp_path / "src")
    schema = "doc_id long, text string"
    spark.createDataFrame(
        [
            (7, "gold silver bronze copper iron tin lead zinc"),
            (9, "gold silver bronze copper iron tin lead zinc"),  # same batch dup
            (8, "mercury venus earth mars jupiter saturn uranus neptune"),
        ],
        schema,
    ).write.mode("append").parquet(src)
    q = start_incremental_dedup(
        spark, spark.readStream.schema(schema).parquet(src),
        str(tmp_path / "store"), str(tmp_path / "out"), str(tmp_path / "ck"),
    )
    q.awaitTermination(60)
    got = {r.doc_id for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert got == {7, 8}, got
    # the suppressed duplicate's SIGNATURE is still stored — LSH band
    # collision is not transitive, so later batches need it for recall
    store_ids = {
        r.doc_id for r in spark.read.parquet(str(tmp_path / "store")).collect()
    }
    assert store_ids == {7, 8, 9}, store_ids
