"""Structured Streaming analogs (ST1-ST3): the same transformation
function must produce identical results on a stream (availableNow over
the events parquet) and on the batch DataFrame."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from movievectorsearch_spark.catalog import load_table, table_path
from movievectorsearch_spark.streaming import events as SE


@pytest.fixture(scope="module")
def stream_src(spark, sf_dir, tmp_path_factory):
    """events.parquet rewritten through the catalog (nanos ts → proper
    timestamp) into a stream-source dir."""
    src = tmp_path_factory.mktemp("events_src")
    load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(str(src / "data"))
    return str(src / "data")


def _run_stream(spark, stream_df, tmp_path, name):
    out = str(tmp_path / f"{name}_out")
    ckpt = str(tmp_path / f"{name}_ckpt")
    q = SE.run_to_sink(stream_df, ckpt, out, trigger_once=True)
    q.awaitTermination(120)
    return spark.read.parquet(out)


def _sorted_tuples(df):
    return sorted(tuple(r) for r in df.collect())


def test_tumbling_counts_stream_equals_batch(spark, stream_src, tmp_path):
    """Append-mode semantics: every emitted window matches the batch
    result exactly; only windows still inside the watermark horizon at
    end-of-stream may be withheld (they're open state, not lost)."""
    import datetime

    batch = SE.tumbling_counts(spark.read.parquet(stream_src))
    stream = SE.tumbling_counts(SE.read_event_stream(spark, stream_src))
    got = _run_stream(spark, stream, tmp_path, "tumbling")
    got_t, batch_t = set(_sorted_tuples(got)), set(_sorted_tuples(batch))
    assert got_t <= batch_t
    missing = batch_t - got_t
    max_ts = spark.read.parquet(stream_src).agg(F.max("ts")).collect()[0][0]
    horizon = max_ts - datetime.timedelta(hours=3)  # watermark 2h + window 1h
    assert all(w[0] >= horizon for w in missing), missing


def test_sessionize_stream_runs_and_covers_all_users(spark, stream_src, tmp_path):
    stream = SE.sessionize(SE.read_event_stream(spark, stream_src))
    got = _run_stream(spark, stream, tmp_path, "session")
    batch_users = {
        r["user_id"] for r in spark.read.parquet(stream_src).select("user_id").distinct().collect()
    }
    assert {r["user_id"] for r in got.collect()} == batch_users
    # session windows never overlap per user
    rows = sorted(got.collect(), key=lambda r: (r["user_id"], r["session_start"]))
    for a, b in zip(rows, rows[1:]):
        if a["user_id"] == b["user_id"]:
            assert a["session_end"] <= b["session_start"]


def test_sliding_window_counts_match_batch(spark, stream_src):
    """2h window sliding by 1h: each event lands in exactly 2 windows;
    batch totals across windows = 2 × event count."""
    batch = SE.sliding_user_activity(spark.read.parquet(stream_src))
    total = batch.agg(F.sum("n_events")).collect()[0][0]
    n_events = spark.read.parquet(stream_src).count()
    assert total == 2 * n_events
    # windows start on the hour and slide hourly
    starts = [r["window_start"] for r in batch.select("window_start").distinct().collect()]
    assert all(s.minute == 0 and s.second == 0 for s in starts)


def test_dedup_stream_checkpoint_resume(spark, stream_src, tmp_path):
    """ST1+ST2: run, then re-run with the same checkpoint — no new
    output (exactly-once over the same offsets, the resume semantics
    the reference hand-rolls with pickle files)."""
    out = str(tmp_path / "dedup_out")
    ckpt = str(tmp_path / "dedup_ckpt")
    stream = SE.dedup_stream(SE.read_event_stream(spark, stream_src))
    q = SE.run_to_sink(stream, ckpt, out, trigger_once=True)
    q.awaitTermination(120)
    n1 = spark.read.parquet(out).count()
    assert n1 == spark.read.parquet(stream_src).count()  # event_id unique

    q2 = SE.run_to_sink(
        SE.dedup_stream(SE.read_event_stream(spark, stream_src)), ckpt, out, trigger_once=True
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == n1  # nothing reprocessed


def test_parse_props(spark, stream_src):
    df = SE.parse_props(spark.read.parquet(stream_src))
    rows = df.select("props", "props_k").limit(20).collect()
    import json

    for r in rows:
        assert r["props_k"] == json.loads(r["props"])["k"]


def test_stream_stream_interval_join_equals_batch(spark, stream_src, tmp_path):
    """Stream-stream inner join with watermarks + time bound: every
    batch match is emitted (inner joins emit on match, nothing is
    withheld by the watermark at end-of-stream with availableNow)."""
    batch_e = spark.read.parquet(stream_src)
    batch = SE.clicks_before_purchases(
        batch_e.filter(F.col("event_type") == "purchase"),
        batch_e.filter(F.col("event_type") == "click"),
    )
    s = SE.read_event_stream(spark, stream_src, max_files_per_trigger=1)
    stream = SE.clicks_before_purchases(
        s.filter(F.col("event_type") == "purchase"),
        s.filter(F.col("event_type") == "click"),
    )
    assert stream.isStreaming
    got = _run_stream(spark, stream, tmp_path, "ssjoin")
    assert _sorted_tuples(got) == _sorted_tuples(batch)


def test_dedup_within_watermark_drops_in_horizon_duplicates(spark, stream_src, tmp_path):
    """ST2 bounded-state form: duplicate event_ids arriving within the
    watermark horizon are dropped across micro-batches, and the
    operator's state is watermark-evicted (dropDuplicatesWithinWatermark,
    not per-key-forever dropDuplicates)."""
    src_dir = str(tmp_path / "dup_src")
    base = spark.read.parquet(stream_src).limit(200).cache()
    # two files with identical rows → two micro-batches of pure duplicates
    base.coalesce(1).write.mode("overwrite").parquet(src_dir)
    base.coalesce(1).write.mode("append").parquet(src_dir)

    out = str(tmp_path / "wm_out")
    ckpt = str(tmp_path / "wm_ckpt")
    stream = SE.dedup_stream_within_watermark(
        SE.read_event_stream(spark, src_dir, max_files_per_trigger=1)
    )
    q = SE.run_to_sink(stream, ckpt, out, trigger_once=True)
    assert q.awaitTermination(120), "stream did not finish"
    got = spark.read.parquet(out)
    assert got.count() == base.count()
    assert got.select("event_id").distinct().count() == base.count()
    # batch fallback produces the same set
    assert SE.dedup_stream_within_watermark(spark.read.parquet(src_dir)).count() == base.count()


def test_stream_static_enrichment_matches_batch(spark, sf_dir, tmp_path):
    """Stream-static broadcast join: the streamed, dimension-enriched
    aggregate equals the batch computation over the same data."""
    from movievectorsearch_spark.catalog import load_table
    from movievectorsearch_spark.streaming.events import enrich_with_dimension

    ev = load_table(spark, sf_dir, "events")
    dim = spark.createDataFrame(
        [("view", "browse"), ("click", "browse"), ("purchase", "convert"),
         ("signup", "convert"), ("error", "ops")],
        "event_type string, category string",
    )
    src = str(tmp_path / "src")
    ev.write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    enriched = enrich_with_dimension(stream, dim, ["event_type"])
    agg = enriched.groupBy("category").agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("cents"),
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("enrich_t")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.category: (r.n, r.cents)
        for r in spark.table("enrich_t").collect()
    }
    expect = {
        r.category: (r.n, r.cents)
        for r in enrich_with_dimension(ev, dim, ["event_type"])
        .groupBy("category")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("cents"),
        )
        .collect()
    }
    assert got == expect and len(got) >= 2
