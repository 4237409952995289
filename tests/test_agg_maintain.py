"""Incremental rollup maintenance: the maintained aggregate equals the
from-scratch batch aggregate after any sequence of micro-batches, and a
restart with the same checkpoint folds nothing twice."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from movievectorsearch_spark.catalog import load_table
from movievectorsearch_spark.streaming import agg_maintain as AM
from movievectorsearch_spark.streaming.events import read_event_stream

KEYS = ["event_type"]


@pytest.fixture
def dirs(tmp_path):
    return {k: str(tmp_path / k) for k in ("src", "table", "ckpt")}


def _batch_rollup(df):
    return df.groupBy(*KEYS).agg(
        F.count("*").alias("n_events"),
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("sum_cents"),
    )


def test_maintained_rollup_equals_batch(spark, sf_dir, dirs):
    e = load_table(spark, sf_dir, "events").limit(900).cache()
    thirds = e.randomSplit([1.0, 1.0, 1.0], seed=7)

    # first two micro-batches
    thirds[0].coalesce(1).write.mode("overwrite").parquet(dirs["src"])
    thirds[1].coalesce(1).write.mode("append").parquet(dirs["src"])
    stream = read_event_stream(spark, dirs["src"], max_files_per_trigger=1)
    q = AM.rollup_sink(stream, dirs["table"], dirs["ckpt"], KEYS)
    assert q.awaitTermination(120), "stream did not finish"

    expect01 = {
        (r["event_type"], r["n_events"], r["sum_cents"])
        for r in _batch_rollup(thirds[0].unionByName(thirds[1])).collect()
    }
    got01 = {
        (r["event_type"], r["n_events"], r["sum_cents"])
        for r in spark.read.parquet(dirs["table"]).collect()
    }
    assert got01 == expect01

    # restart with a third batch: only the new file folds in
    thirds[2].coalesce(1).write.mode("append").parquet(dirs["src"])
    stream2 = read_event_stream(spark, dirs["src"], max_files_per_trigger=1)
    q2 = AM.rollup_sink(stream2, dirs["table"], dirs["ckpt"], KEYS)
    assert q2.awaitTermination(120), "restarted stream did not finish"

    expect_all = {
        (r["event_type"], r["n_events"], r["sum_cents"])
        for r in _batch_rollup(e).collect()
    }
    got_all = {
        (r["event_type"], r["n_events"], r["sum_cents"])
        for r in spark.read.parquet(dirs["table"]).collect()
    }
    assert got_all == expect_all

    # derived avg comes from merged partials
    row = AM.read_rollup(spark, dirs["table"]).collect()[0]
    assert abs(row["avg_value"] - round(row["sum_cents"] / 100.0 / row["n_events"], 6)) < 1e-9


def test_maintained_histogram_equals_batch(spark, sf_dir, tmp_path):
    from movievectorsearch_spark.operators.sketch import (
        histogram_quantiles_grouped,
    )

    dirs = {k: str(tmp_path / k) for k in ("src", "table", "ckpt")}
    e = load_table(spark, sf_dir, "events").limit(900).cache()
    # fixed domain (the streaming-sketch contract): set once up front
    VMIN, VMAX, NB = 0.0, 100.0, 32
    halves = e.randomSplit([1.0, 1.0], seed=11)

    halves[0].coalesce(1).write.mode("overwrite").parquet(dirs["src"])
    stream = read_event_stream(spark, dirs["src"], max_files_per_trigger=1)
    q = AM.hist_sink(
        stream, dirs["table"], dirs["ckpt"], "event_type", "value",
        VMIN, VMAX, NB,
    )
    assert q.awaitTermination(120), "stream did not finish"

    # restart folds ONLY the new file (checkpoint replay safety)
    halves[1].coalesce(1).write.mode("append").parquet(dirs["src"])
    stream2 = read_event_stream(spark, dirs["src"], max_files_per_trigger=1)
    q2 = AM.hist_sink(
        stream2, dirs["table"], dirs["ckpt"], "event_type", "value",
        VMIN, VMAX, NB,
    )
    assert q2.awaitTermination(120), "restarted stream did not finish"

    def rows(df):
        return {
            (r["grp"], r["bin"], r["vmin"], r["vmax"], r["cnt"])
            for r in df.collect()
        }

    expect = rows(AM._hist_partials(e, "event_type", "value", VMIN, VMAX, NB))
    got = rows(AM.read_hist(spark, dirs["table"]))
    assert got == expect and got  # merged sketch == one-shot sketch

    # the maintained sketch serves per-group quantiles directly
    qs = histogram_quantiles_grouped(
        AM.read_hist(spark, dirs["table"]), [50, 95], n_bins=NB
    ).collect()
    grps = {r["grp"] for r in qs}
    assert grps == {r["event_type"] for r in e.select("event_type").distinct().collect()}
    for r in qs:
        assert VMIN <= r["est"] <= VMAX


def test_maintained_cms_equals_batch(spark, sf_dir, tmp_path):
    from movievectorsearch_spark.operators.sketch import (
        cms_estimate_join,
        cms_table,
    )

    dirs = {k: str(tmp_path / k) for k in ("src", "table", "ckpt")}
    e = load_table(spark, sf_dir, "events").limit(900).cache()
    halves = e.randomSplit([1.0, 1.0], seed=3)

    halves[0].coalesce(1).write.mode("overwrite").parquet(dirs["src"])
    stream = read_event_stream(spark, dirs["src"], max_files_per_trigger=1)
    q = AM.cms_sink(stream, dirs["table"], dirs["ckpt"], "event_type")
    assert q.awaitTermination(120)

    halves[1].coalesce(1).write.mode("append").parquet(dirs["src"])
    stream2 = read_event_stream(spark, dirs["src"], max_files_per_trigger=1)
    q2 = AM.cms_sink(stream2, dirs["table"], dirs["ckpt"], "event_type")
    assert q2.awaitTermination(120)

    def cells(df):
        return {(r["row"], r["bucket"], r["n"]) for r in df.collect()}

    expect = cells(cms_table(e, "event_type"))
    got = cells(spark.read.parquet(dirs["table"]))
    assert got == expect and got  # merged sketch == one-shot sketch

    # estimates served from the maintained table dominate exact counts
    cands = e.select("event_type").distinct()
    est = {
        r["event_type"]: r["cms_n"]
        for r in cms_estimate_join(
            cands, spark.read.parquet(dirs["table"]), "event_type"
        ).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    for k, n in exact.items():
        assert est[k] >= n  # CMS never underestimates


def test_maintained_bloom_equals_batch(spark, sf_dir, tmp_path):
    from movievectorsearch_spark.operators.sketch import bloom_bits, bloom_probe

    dirs = {k: str(tmp_path / k) for k in ("src", "table", "ckpt")}
    e = load_table(spark, sf_dir, "events").limit(900).cache()
    halves = e.randomSplit([1.0, 1.0], seed=13)

    halves[0].coalesce(1).write.mode("overwrite").parquet(dirs["src"])
    stream = read_event_stream(spark, dirs["src"], max_files_per_trigger=1)
    q = AM.bloom_sink(stream, dirs["table"], dirs["ckpt"], "user_id")
    assert q.awaitTermination(120)

    halves[1].coalesce(1).write.mode("append").parquet(dirs["src"])
    stream2 = read_event_stream(spark, dirs["src"], max_files_per_trigger=1)
    q2 = AM.bloom_sink(stream2, dirs["table"], dirs["ckpt"], "user_id")
    assert q2.awaitTermination(120)

    got = {r["pos"] for r in spark.read.parquet(dirs["table"]).collect()}
    expect = {r["pos"] for r in bloom_bits(e, "user_id").collect()}
    assert got == expect and got  # merged filter == one-shot filter

    # no false negatives through the maintained table
    probe = e.select("user_id").distinct()
    out = bloom_probe(
        spark.read.parquet(dirs["table"]), probe, "user_id"
    ).collect()
    assert out and all(r["maybe_seen"] for r in out)


def test_replayed_batch_is_not_double_counted(spark, sf_dir, tmp_path):
    """foreachBatch is at-least-once: a micro-batch replayed after a
    crash between the table swap and the checkpoint commit must NOT be
    folded twice. The applied-batch watermark (stamped inside the same
    atomic swap) makes the merge idempotent per batch_id."""
    table = str(tmp_path / "table")
    e = load_table(spark, sf_dir, "events").limit(300).cache()

    AM.merge_agg_microbatch(e, table, KEYS, batch_id=0)
    once = {
        (r["event_type"], r["n_events"], r["sum_cents"])
        for r in spark.read.parquet(table).collect()
    }
    # simulated replay of the same batch_id → no-op
    AM.merge_agg_microbatch(e, table, KEYS, batch_id=0)
    again = {
        (r["event_type"], r["n_events"], r["sum_cents"])
        for r in spark.read.parquet(table).collect()
    }
    assert again == once
    # a NEW batch id still folds
    AM.merge_agg_microbatch(e, table, KEYS, batch_id=1)
    doubled = {
        (r["event_type"], r["n_events"], r["sum_cents"])
        for r in spark.read.parquet(table).collect()
    }
    assert doubled == {
        (t, 2 * n, 2 * s) for (t, n, s) in once
    }


def test_replayed_hist_and_cms_batches_are_dropped(spark, sf_dir, tmp_path):
    e = load_table(spark, sf_dir, "events").limit(300).cache()

    hist = str(tmp_path / "hist")
    AM.merge_hist_microbatch(e, hist, "event_type", "value", 0.0, 500.0, 16,
                             batch_id=0)
    once = {(r["grp"], r["bin"], r["cnt"])
            for r in spark.read.parquet(hist).collect()}
    AM.merge_hist_microbatch(e, hist, "event_type", "value", 0.0, 500.0, 16,
                             batch_id=0)
    assert {(r["grp"], r["bin"], r["cnt"])
            for r in spark.read.parquet(hist).collect()} == once

    cms = str(tmp_path / "cms")
    AM.merge_cms_microbatch(e, cms, "user_id", batch_id=0)
    conce = {(r["row"], r["bucket"], r["n"])
             for r in spark.read.parquet(cms).collect()}
    AM.merge_cms_microbatch(e, cms, "user_id", batch_id=0)
    assert {(r["row"], r["bucket"], r["n"])
            for r in spark.read.parquet(cms).collect()} == conce
