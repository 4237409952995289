"""Incrementally-maintained aggregate table (materialized rollup).

The upsert sink (sink_upsert.py) maintains a ROW-level table; this sink
maintains an AGGREGATE: each micro-batch is reduced to partial
aggregates (count / sum per key) which MERGE into the stored rollup by
adding — the algebraic-aggregate property (partials combine
associatively) that makes incremental view maintenance possible at all.
The reference recomputes its stats from scratch every run
(movie_generator.py:518-523 walks the whole collection); this touches
only keys present in the batch plus the stored rollup.

Scale: the stored table has one row per key (bounded by key
cardinality, not event count); each micro-batch shuffles only its own
partial aggregates. Derived metrics (avg = sum/count) are computed at
READ time from the merged partials — never stored, because averages do
not merge. With Delta/Iceberg the swap becomes MERGE INTO; bucketing
the rollup on the key keeps the stored side shuffle-free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movievectorsearch_spark.streaming.sink_upsert import (
    atomic_swap,
    last_applied_batch,
    recover_table,
)

__all__ = [
    "merge_agg_microbatch",
    "rollup_sink",
    "read_rollup",
    "merge_hist_microbatch",
    "hist_sink",
    "read_hist",
    "merge_cms_microbatch",
    "cms_sink",
    "merge_bloom_microbatch",
    "bloom_sink",
]


def _partials(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    return df.groupBy(*keys).agg(
        F.count("*").alias("n_events"),
        F.sum(F.round(F.col(value_col) * 100, 0).cast("bigint")).alias("sum_cents"),
    )


def merge_agg_microbatch(
    batch_df: DataFrame,
    table_dir: str,
    keys: list[str],
    value_col: str = "value",
    batch_id: int | None = None,
) -> None:
    """Fold one micro-batch's partial aggregates into the rollup.

    Adding counts is NOT idempotent, and foreachBatch is only
    at-least-once: a batch replayed after a crash between the swap and
    the checkpoint commit would double-count. The applied-batch
    watermark stamped inside the same atomic swap closes that window —
    a replay with ``batch_id <= last_applied_batch`` is a no-op, making
    the fold exactly-once end to end (round-2 advisor finding)."""
    spark = batch_df.sparkSession
    recover_table(table_dir)
    if batch_id is not None and batch_id <= last_applied_batch(table_dir):
        return
    part = _partials(batch_df, keys, value_col)
    if os.path.isdir(table_dir):
        base = spark.read.parquet(table_dir)
        merged = (
            base.unionByName(part)
            .groupBy(*keys)
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("sum_cents").alias("sum_cents"),
            )
        )
    else:
        merged = part
    atomic_swap(merged, table_dir, batch_id=batch_id)


def rollup_sink(
    stream_df: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    keys: list[str],
    value_col: str = "value",
    available_now: bool = True,
):
    """Attach the incremental-rollup sink; the checkpoint plus the
    applied-batch watermark (stamped in the same atomic swap) make each
    micro-batch's fold exactly-once across restarts AND replays."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        merge_agg_microbatch(
            batch_df, table_dir, keys, value_col, batch_id=batch_id
        )

    w = stream_df.writeStream.foreachBatch(_merge).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def read_rollup(spark: SparkSession, table_dir: str) -> DataFrame:
    """Read the rollup with derived metrics (avg from merged partials)."""
    recover_table(table_dir)
    t = spark.read.parquet(table_dir)
    return t.withColumn(
        "avg_value", F.round(F.col("sum_cents") / 100.0 / F.col("n_events"), 6)
    )


# ---------------------------------------------------------------------------
# Streaming histogram-sketch maintenance — the quantile analog of the
# count/sum rollup above, completing the batch/stream symmetry of the
# sketch family (operators/sketch.py histogram_sketch_grouped is the
# one-shot batch form; this maintains the same (grp, bin, cnt) table
# incrementally).
#
# One deliberate difference from the batch sketch: the bin DOMAIN here
# is a FIXED parameter, not a data-derived per-group [min, max]. A
# mergeable sketch requires bin boundaries that never move — a batch
# that stretched the observed domain would silently re-bin history.
# Fixing the domain up front (from SLAs, schema contracts, or a one-time
# profiling pass) is what every production streaming sketch does;
# out-of-domain values clamp into the edge bins, preserving total count
# and rank queries inside the domain.
# ---------------------------------------------------------------------------

def _hist_partials(
    df: DataFrame,
    group_col: str,
    value_col: str,
    vmin: float,
    vmax: float,
    n_bins: int,
) -> DataFrame:
    v = F.col(value_col).cast("double")
    bin_ = F.greatest(
        F.lit(0),
        F.least(
            F.lit(n_bins - 1),
            F.floor((v - F.lit(vmin)) * n_bins / F.lit(vmax - vmin)),
        ),
    ).cast("int")
    return (
        df.filter(v.isNotNull())
        .select(F.col(group_col).alias("grp"), bin_.alias("bin"))
        .groupBy("grp", "bin")
        .agg(F.count("*").alias("cnt"))
        .withColumn("vmin", F.lit(float(vmin)))
        .withColumn("vmax", F.lit(float(vmax)))
    )


def merge_hist_microbatch(
    batch_df: DataFrame,
    table_dir: str,
    group_col: str,
    value_col: str,
    vmin: float,
    vmax: float,
    n_bins: int = 128,
    batch_id: int | None = None,
) -> None:
    """Fold one micro-batch's (grp, bin) counts into the stored sketch.
    Histogram counts are algebraic (merge = sum), so this is the same
    atomic-swap MERGE as the count/sum rollup — including its
    applied-batch watermark, because summing is not idempotent under
    foreachBatch replays; the stored table is ≤ groups × n_bins rows
    regardless of stream length."""
    spark = batch_df.sparkSession
    recover_table(table_dir)
    if batch_id is not None and batch_id <= last_applied_batch(table_dir):
        return
    part = _hist_partials(batch_df, group_col, value_col, vmin, vmax, n_bins)
    if os.path.isdir(table_dir):
        base = spark.read.parquet(table_dir)
        merged = (
            base.unionByName(part)
            .groupBy("grp", "bin", "vmin", "vmax")
            .agg(F.sum("cnt").alias("cnt"))
        )
    else:
        merged = part
    atomic_swap(merged, table_dir, batch_id=batch_id)


def hist_sink(
    stream_df: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    group_col: str,
    value_col: str,
    vmin: float,
    vmax: float,
    n_bins: int = 128,
    available_now: bool = True,
):
    """Attach the incremental-histogram sink; the checkpoint plus the
    applied-batch watermark make each micro-batch's fold exactly-once
    across restarts AND replays."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        merge_hist_microbatch(
            batch_df, table_dir, group_col, value_col, vmin, vmax, n_bins,
            batch_id=batch_id,
        )

    w = stream_df.writeStream.foreachBatch(_merge).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def read_hist(spark: SparkSession, table_dir: str) -> DataFrame:
    """Read the maintained sketch — directly consumable by
    operators/sketch.py:histogram_quantiles_grouped (the stored vmin/
    vmax columns are the fixed domain constants)."""
    recover_table(table_dir)
    return spark.read.parquet(table_dir)


# ---------------------------------------------------------------------------
# Streaming CMS maintenance — the frequency member of the sketch family
# maintained incrementally (histogram = quantiles above; CMS counter
# cells are algebraic too: merge = sum on (row, bucket)). Unlike the
# histogram there is no domain parameter to fix: the hash coordinates
# are data-independent by construction, so batch and streaming sketches
# are the SAME table.
# ---------------------------------------------------------------------------

def merge_cms_microbatch(
    batch_df: DataFrame,
    table_dir: str,
    key_col: str,
    depth: int = 5,
    width: int = 1024,
    seed: int = 7,
    batch_id: int | None = None,
) -> None:
    """Fold one micro-batch's CMS cells into the stored sketch
    (≤ depth·width rows regardless of stream length). Counter adds are
    not idempotent — the applied-batch watermark drops foreachBatch
    replays, same as the rollup sink."""
    from movievectorsearch_spark.operators.sketch import cms_table

    spark = batch_df.sparkSession
    recover_table(table_dir)
    if batch_id is not None and batch_id <= last_applied_batch(table_dir):
        return
    part = cms_table(batch_df, key_col, depth, width, seed)
    if os.path.isdir(table_dir):
        base = spark.read.parquet(table_dir)
        merged = (
            base.unionByName(part)
            .groupBy("row", "bucket")
            .agg(F.sum("n").alias("n"))
        )
    else:
        merged = part
    atomic_swap(merged, table_dir, batch_id=batch_id)


def cms_sink(
    stream_df: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    key_col: str,
    depth: int = 5,
    width: int = 1024,
    seed: int = 7,
    available_now: bool = True,
):
    """Attach the incremental-CMS sink (exactly-once via the
    applied-batch watermark); estimates are served from the maintained
    table with the unchanged cms_estimate_join."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        merge_cms_microbatch(
            batch_df, table_dir, key_col, depth, width, seed,
            batch_id=batch_id,
        )

    w = stream_df.writeStream.foreachBatch(_merge).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


# ---------------------------------------------------------------------------
# Streaming Bloom maintenance — the membership member of the sketch
# family maintained incrementally. Set-bit rows merge by UNION DISTINCT
# (idempotent — re-setting a bit is a no-op), so like CMS the batch and
# streamed filters are the SAME table; unlike counters, replayed
# batches cannot even corrupt it.
# ---------------------------------------------------------------------------

def merge_bloom_microbatch(
    batch_df: DataFrame,
    table_dir: str,
    key_col: str,
    m_bits: int = 1 << 14,
    k: int = 4,
) -> None:
    """Fold one micro-batch's set bits into the stored filter
    (≤ m_bits single-int rows regardless of stream length)."""
    from movievectorsearch_spark.operators.sketch import bloom_bits

    spark = batch_df.sparkSession
    recover_table(table_dir)
    part = bloom_bits(batch_df, key_col, m_bits, k)
    if os.path.isdir(table_dir):
        base = spark.read.parquet(table_dir)
        merged = base.unionByName(part).distinct()
    else:
        merged = part
    atomic_swap(merged, table_dir)


def bloom_sink(
    stream_df: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    key_col: str,
    m_bits: int = 1 << 14,
    k: int = 4,
    available_now: bool = True,
):
    """Attach the incremental-Bloom sink; probes are served from the
    maintained table with the unchanged bloom_probe — the streaming
    seen-set in front of an incremental dedup join."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        merge_bloom_microbatch(batch_df, table_dir, key_col, m_bits, k)

    w = stream_df.writeStream.foreachBatch(_merge).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
