"""Streaming operators over the ``events`` table.

The reference's only stream-like construct is the curator's
checkpoint/resume + incremental-dedup loop (movie_generator.py:106-180,
199-212; SURVEY.md §2.10 ST1-ST3). The idiomatic Spark upgrade:

- ST1 checkpoint/resume  → ``writeStream.option('checkpointLocation')``
- ST2 incremental dedup  → ``dropDuplicates`` with watermark-bounded state
- ST3 rate limiting      → trigger intervals / maxFilesPerTrigger

plus the watermark/window operators a real event stream needs. Each
transformation is defined on a plain DataFrame so the SAME function
serves batch (oracle-checkable vs DuckDB) and streaming (readStream)
inputs — the batch/streaming unification Structured Streaming is for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
    "event_type STRING, value DOUBLE, props STRING"
)


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream (parquet dir). ``maxFilesPerTrigger`` is the
    micro-batch rate limit (ST3)."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window event counts + value sums per event_type with
    late-data handling. Works on batch and stream alike."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def clicks_before_purchases(
    purchases: DataFrame,
    clicks: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: every (purchase, click) pair for
    the same user with the click inside [purchase.ts − horizon,
    purchase.ts]. On streams both sides carry watermarks and the time
    bound lets Spark evict join state once a row can no longer match —
    without it the state store grows forever. On batch the identical
    function is a hash join on user_id with the interval as a residual
    predicate (oracle-checked as ``events_interval_join``)."""
    if purchases.isStreaming:
        purchases = purchases.withWatermark("ts", watermark)
        clicks = clicks.withWatermark("ts", watermark)
    p = purchases.select(
        F.col("user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    c = clicks.select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    cond = (
        (p.user_id == c.c_user_id)
        & (c.click_ts >= p.purchase_ts - F.expr(f"INTERVAL {horizon}"))
        & (c.click_ts <= p.purchase_ts)
    )
    return p.join(c, cond).select(
        "user_id", "purchase_id", "click_id", "purchase_ts", "click_ts"
    )


def sliding_user_activity(
    events: DataFrame,
    window: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window distinct-ish activity per user."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window, slide).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "user_id",
            "n_events",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """ST2: exactly-once-per-key — the streaming form of the curator's
    seen-set. NOTE: with the key subset not containing the event-time
    column, ``dropDuplicates`` keeps one state entry PER KEY FOREVER
    (the watermark does not evict it) — exact global dedup, unbounded
    state, like the reference's in-memory set. For bounded state use
    :func:`dedup_stream_within_watermark`."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return src.dropDuplicates(["event_id"])


def dedup_stream_within_watermark(
    events: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """ST2, state-bounded: ``dropDuplicatesWithinWatermark`` dedupes on
    event_id but EVICTS each key's state once the watermark passes its
    first-seen timestamp — at 100 TB/day of events this is the only
    sustainable form (state ∝ keys-per-horizon, not keys-ever).
    Duplicates arriving within the horizon are dropped; a replay later
    than the watermark delay would re-emit — the at-least-once
    trade-off bounded state buys. Batch frames fall back to plain
    dropDuplicates (same result set for in-horizon duplicates)."""
    if not events.isStreaming:
        return events.dropDuplicates(["event_id"])
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def sessionize(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows (gap-based) per user — the session-window
    operator the reference lacks entirely."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def parse_props(events: DataFrame) -> DataFrame:
    """F14: the ``props`` JSON-string column → typed struct."""
    return events.withColumn("props_k", F.from_json("props", "k INT")["k"])


def run_to_sink(
    stream_df: DataFrame,
    checkpoint_dir: str,
    out_dir: str,
    trigger_once: bool = True,
):
    """writeStream with checkpointing (ST1). ``availableNow`` processes
    the backlog then stops — the batch-ish mode tests use."""
    w = (
        stream_df.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        w = w.trigger(availableNow=True)
    return w.start()


def enrich_with_dimension(
    stream: DataFrame, dim: DataFrame, on: list[str]
) -> DataFrame:
    """Stream-static join: enrich each micro-batch with a broadcast
    dimension table — the canonical lookup-enrichment shape (stream of
    facts ⋈ slowly-changing reference data). The static side is
    re-resolved per micro-batch, so an updated dimension table is
    picked up without restarting the query; no streaming state is
    created (unlike stream-stream joins, nothing must be buffered for
    late matches). At scale the dimension broadcasts once per batch —
    for dimensions past broadcast size, pre-bucket both sides on the
    key (sources/bucketing.py) for a shuffle-free sort-merge."""
    return stream.join(F.broadcast(dim), on, "left")
