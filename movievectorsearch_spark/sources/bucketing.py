"""Bucketed tables: pre-shuffled storage for co-located joins.

SURVEY.md §4 / the 100 TB contract: the films⋈embeddings key join (and
any repeated fact⋈fact join) should not shuffle either side at query
time. Writing both tables bucketed by the join key with the same
bucket count stores rows pre-hash-partitioned; Spark's bucketing-aware
scan then feeds SortMergeJoin with NO Exchange on either side — the
shuffle is paid once at write time, amortized over every query.

Local note: bucketed tables require ``saveAsTable`` (catalog-managed);
the warehouse dir is configured in session.py to a scratch location.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
) -> None:
    """One-time bucketed write: pays the shuffle now so joins on
    ``bucket_cols`` never pay it again. ``sortBy`` the same key so the
    merge side of SortMergeJoin reads pre-sorted buckets."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
        .saveAsTable(table)
    )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def drop_table(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")
