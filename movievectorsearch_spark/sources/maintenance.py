"""Table maintenance: small-file compaction and schema evolution.

Two operational realities of a 100 TB parquet lake that no query plan
fixes by itself:

- **Small files.** Streaming sinks and fine-grained partitioning leave
  thousands of KB-scale files; every one costs an open + footer read
  per scan task. ``compact_table`` rewrites a directory to ~target-size
  files with a shuffle-free ``coalesce`` and the same atomic rename-
  aside swap the streaming sinks use (readers never see a half-written
  table). On Delta/Iceberg this is OPTIMIZE / rewrite_data_files.
- **Schema evolution.** Snapshots written months apart differ in
  columns. ``read_evolved`` turns on parquet ``mergeSchema`` (a
  footer-union pass, so not free — off by default in Spark for that
  reason); ``union_evolving`` is the frame-level equivalent
  (``unionByName(allowMissingColumns=True)``), nulling absent columns
  instead of failing the union.

The reference's store is schemaless Mongo — evolution is silent and
per-document (SURVEY.md §1.4); here it is explicit and typed.
"""

from __future__ import annotations

import math
import os
from functools import reduce

from pyspark.sql import DataFrame, SparkSession

from movievectorsearch_spark.streaming.sink_upsert import (
    atomic_swap,
    recover_table,
)

__all__ = ["compact_table", "read_evolved", "union_evolving", "parquet_file_count"]


def parquet_file_count(table_dir: str) -> int:
    return sum(
        1
        for root, _dirs, files in os.walk(table_dir)
        for f in files
        if f.endswith(".parquet")
    )


def compact_table(
    spark: SparkSession, table_dir: str, target_mb: int = 256
) -> tuple[int, int]:
    """Rewrite ``table_dir`` into ``ceil(bytes / target_mb)`` files.
    Shuffle-free (coalesce merges read splits); atomic (rename-aside
    swap). Returns (files_before, files_after)."""
    recover_table(table_dir)
    before = parquet_file_count(table_dir)
    total_bytes = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _dirs, files in os.walk(table_dir)
        for f in files
        if f.endswith(".parquet")
    )
    n = max(1, math.ceil(total_bytes / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(table_dir)
    atomic_swap(df.coalesce(n), table_dir)
    return before, parquet_file_count(table_dir)


def read_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Read a directory of snapshots with differing schemas; columns
    absent in older files come back null."""
    return spark.read.option("mergeSchema", True).parquet(path)


def union_evolving(frames: list[DataFrame]) -> DataFrame:
    """Union frames whose schemas drifted: by NAME, missing columns
    nulled — never by position (the silent-corruption mode of plain
    ``union`` after a column reorder)."""
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), frames
    )
