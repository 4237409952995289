"""Partitioned sink + pruned scan (sources/partitioned.py): the
equality filter on the partition column must land in PartitionFilters
(directory pruning), and approx_percentile must track the exact
percentile plan within sketch tolerance."""

from __future__ import annotations

from pyspark.sql import functions as F

from movievectorsearch_spark.catalog import load_table
from movievectorsearch_spark.sources.partitioned import (
    read_partitioned,
    write_partitioned,
)


def test_partition_filter_prunes(spark, sf_dir, tmp_path):
    path = str(tmp_path / "events_by_type")
    e = load_table(spark, sf_dir, "events")
    write_partitioned(e, path, ["event_type"])

    pruned = read_partitioned(spark, path).filter(F.col("event_type") == "purchase")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    # the partition predicate must be IN the partition filters, not a data filter
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "event_type" in pf

    # pruning changes I/O, not results
    expected = e.filter(F.col("event_type") == "purchase").count()
    assert pruned.count() == expected


def test_roundtrip_preserves_rows(spark, sf_dir, tmp_path):
    path = str(tmp_path / "events_all")
    e = load_table(spark, sf_dir, "events")
    write_partitioned(e, path, ["event_type"])
    assert read_partitioned(spark, path).count() == e.count()


def test_approx_percentile_tracks_exact(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    both = e.agg(
        F.percentile(cents, F.lit(0.5)).alias("exact"),
        F.approx_percentile(cents, F.lit(0.5), F.lit(10000)).alias("approx"),
    ).collect()[0]
    # 1/accuracy relative-rank error; generous absolute bound on cents
    assert abs(both.exact - both.approx) <= max(0.01 * both.exact, 100)


def test_dynamic_partition_pruning_via_dim_join(spark, sf_dir, tmp_path):
    """DPP: a join against a FILTERED dim on the partition column must
    inject a dynamicpruning subquery into the fact scan's
    PartitionFilters — at 100 TB this is 'which day-directories to read'
    decided at runtime from the dim filter, not a full scan."""
    path = str(tmp_path / "events_dpp")
    e = load_table(spark, sf_dir, "events")
    write_partitioned(e, path, ["event_type"])
    fact = read_partitioned(spark, path)
    dim = spark.createDataFrame(
        [("purchase", 1), ("signup", 0), ("click", 0), ("view", 0),
         ("error", 0)],
        "event_type STRING, flag INT",
    )
    j = fact.join(dim, "event_type").filter(F.col("flag") == 1)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    assert j.count() == e.filter(F.col("event_type") == "purchase").count()
