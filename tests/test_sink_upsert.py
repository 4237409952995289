"""Streaming foreachBatch upsert sink (streaming/sink_upsert.py): the
merged table must equal the batch latest-wins result over everything
ingested so far, across micro-batches AND across a checkpointed
restart (no reprocessing, no loss)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from movievectorsearch_spark.catalog import load_table
from movievectorsearch_spark.streaming.events import read_event_stream
from movievectorsearch_spark.streaming.sink_upsert import upsert_sink

KEYS = ["user_id", "event_type"]


def _batch_latest(df):
    w = Window.partitionBy(*KEYS).orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _as_map(df):
    return {
        (r.user_id, r.event_type): (r.ts, r.event_id) for r in df.collect()
    }


@pytest.fixture()
def dirs(tmp_path):
    return {
        "src": str(tmp_path / "src"),
        "table": str(tmp_path / "table"),
        "ckpt": str(tmp_path / "ckpt"),
    }


def test_merge_across_microbatches_and_restart(spark, sf_dir, dirs):
    e = load_table(spark, sf_dir, "events")
    # three non-overlapping drops with overlapping (user, type) keys
    drops = [e.filter(F.col("event_id") % 3 == i) for i in range(3)]

    # drop files 0 and 1, run the stream (one file per micro-batch)
    drops[0].coalesce(1).write.mode("append").parquet(dirs["src"])
    drops[1].coalesce(1).write.mode("append").parquet(dirs["src"])
    stream = read_event_stream(spark, dirs["src"], max_files_per_trigger=1)
    q = upsert_sink(stream, dirs["table"], dirs["ckpt"], KEYS)
    assert q.awaitTermination(120), "stream did not finish in 120s"

    expected_01 = _batch_latest(drops[0].unionByName(drops[1]))
    got = spark.read.parquet(dirs["table"])
    assert _as_map(got) == _as_map(expected_01)

    # drop file 2, RESTART from the same checkpoint: only the new file
    # is processed, and the table converges to latest-wins over all 3
    drops[2].coalesce(1).write.mode("append").parquet(dirs["src"])
    stream2 = read_event_stream(spark, dirs["src"], max_files_per_trigger=1)
    q2 = upsert_sink(stream2, dirs["table"], dirs["ckpt"], KEYS)
    assert q2.awaitTermination(120), "restarted stream did not finish in 120s"

    expected_all = _batch_latest(e)
    got2 = spark.read.parquet(dirs["table"])
    assert _as_map(got2) == _as_map(expected_all)

    # key cardinality sanity: one row per live (user, type) pair
    assert got2.count() == e.select(*KEYS).distinct().count()


def test_unstamped_swap_preserves_batch_watermark(spark, sf_dir, tmp_path):
    """Round-3 advisor finding: an atomic_swap WITHOUT a batch_id over
    a table that carries a _last_batch_id marker must not reset the
    replay watermark to -1 — that would reopen the double-count replay
    window the stamping closed. The marker must ride into the staging
    dir and survive the swap."""
    from movievectorsearch_spark.streaming.sink_upsert import (
        atomic_swap,
        last_applied_batch,
    )

    table = str(tmp_path / "t")
    df = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")

    atomic_swap(df, table, batch_id=7)
    assert last_applied_batch(table) == 7

    # unstamped swap (e.g. a batch-side compaction/rewrite of the same
    # maintained table): watermark must survive
    atomic_swap(df.limit(3), table, batch_id=None)
    assert last_applied_batch(table) == 7

    # a stamped swap still advances it
    atomic_swap(df, table, batch_id=9)
    assert last_applied_batch(table) == 9

    # and a fresh table without any marker stays -1
    table2 = str(tmp_path / "t2")
    atomic_swap(df, table2, batch_id=None)
    assert last_applied_batch(table2) == -1


def test_unstamped_swap_recovers_crashed_table_first(spark, sf_dir, tmp_path):
    """Round-4 advisor finding: if a prior swap crashed between its two
    renames (live table sitting in .__bak), a direct unstamped
    atomic_swap must recover the table BEFORE reading the watermark —
    otherwise the marker is missed and the watermark silently resets
    to -1 in exactly the crash path recover_table exists for."""
    import os

    from movievectorsearch_spark.streaming.sink_upsert import (
        atomic_swap,
        last_applied_batch,
    )

    table = str(tmp_path / "t")
    df = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    atomic_swap(df, table, batch_id=7)

    # simulate the crash window: table renamed aside, new one not yet in
    os.rename(table, table + ".__bak")

    atomic_swap(df.limit(3), table, batch_id=None)
    assert last_applied_batch(table) == 7
