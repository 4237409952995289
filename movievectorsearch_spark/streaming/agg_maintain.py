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
    recover_table,
)

__all__ = ["merge_agg_microbatch", "rollup_sink", "read_rollup"]


def _partials(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    return df.groupBy(*keys).agg(
        F.count("*").alias("n_events"),
        F.sum(F.round(F.col(value_col) * 100, 0).cast("bigint")).alias("sum_cents"),
    )


def merge_agg_microbatch(
    batch_df: DataFrame, table_dir: str, keys: list[str], value_col: str = "value"
) -> None:
    """Fold one micro-batch's partial aggregates into the rollup."""
    spark = batch_df.sparkSession
    recover_table(table_dir)
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
    atomic_swap(merged, table_dir)


def rollup_sink(
    stream_df: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    keys: list[str],
    value_col: str = "value",
    available_now: bool = True,
):
    """Attach the incremental-rollup sink; the stream checkpoint makes
    each micro-batch's fold exactly-once across restarts."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        merge_agg_microbatch(batch_df, table_dir, keys, value_col)

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
