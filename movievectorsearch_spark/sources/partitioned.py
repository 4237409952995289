"""Partitioned parquet sink + partition-pruned scan.

At 100 TB the single biggest lever is not reading data at all:
a sink partitioned by a low-cardinality predicate column means a
filtered read lists only the matching directories — the scan's
``PartitionFilters`` — before any row-group I/O happens. This module is
the write side of that contract; tests/test_partitioned.py asserts the
read side actually prunes (PartitionFilters populated, pruned scan
reads a strict subset of files).

The reference's only sink is a per-document Mongo upsert
(movie_generator.py:452-467) with no layout control at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_partitioned", "read_partitioned"]


def write_partitioned(
    df: DataFrame, path: str, partition_by: list[str], mode: str = "overwrite"
) -> None:
    """Write ``df`` as parquet partitioned by ``partition_by`` (one
    directory per distinct value; keep these columns low-cardinality —
    high-cardinality partition keys explode the file count)."""
    df.write.partitionBy(*partition_by).mode(mode).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned layout; equality/IN filters on the partition
    columns become PartitionFilters (directory pruning, zero I/O for
    non-matching partitions) — assert via ``.explain("formatted")``."""
    return spark.read.parquet(path)
