"""Mergeable sketches: HLL distinct rollups and count-min frequency.

At 100 TB you do not answer "how many distinct users this month" by
rescanning the month — you keep a small MERGEABLE summary per
partition-grain (day, file, shard) and fold summaries. Spark ships two
Datasketches-backed aggregates that make this a first-class pattern:

- ``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``:
  build per-grain HyperLogLog sketches once, then answer distinct
  counts over ANY grain combination by unioning kilobyte-sized
  sketches — the rollup never touches the fact table again. (This is
  the scalable form of approx_count_distinct, whose partials Catalyst
  already merges internally but does not let you PERSIST.)
- ``count_min_sketch``: a fixed-size frequency summary with one-sided
  error (estimate ≥ true count, ≤ true + ε·N with the configured
  confidence) — the candidate-screening half of a heavy-hitters pass;
  exact counts for the few candidates come from a second cheap
  aggregate.

The reference has no approximate operators (its corpus is hundreds of
rows); this is part of the scale tier SURVEY.md §7 step 8 calls for.
Sketch estimates are engine-specific, so these are rows-only queries:
tests/test_sketch.py bounds them against exact counts instead of a
DuckDB hash-compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["hll_rollup", "cms_build", "cms_estimate"]


def hll_rollup(
    df: DataFrame,
    group_cols: list[str],
    grain_col: str,
    item_col: str,
    lgk: int = 12,
) -> DataFrame:
    """Distinct ``item_col`` per ``group_cols``, computed by building
    one HLL sketch per (group, grain) and UNIONING sketches across the
    grain — the persistable-rollup pattern. ``lgk`` = log2 of the
    sketch's bucket count (12 → 4 KiB, ~1.6% relative standard error).
    """
    daily = df.groupBy(*group_cols, grain_col).agg(
        F.hll_sketch_agg(item_col, F.lit(lgk)).alias("sketch")
    )
    return daily.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch"))
        .cast("bigint")
        .alias("est_distinct")
    )


def cms_build(
    df: DataFrame,
    col: str,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
) -> bytes:
    """Build a count-min sketch of ``col`` (cast to string so driver-
    side probes hash identically) as one mergeable aggregate; returns
    the serialized sketch. Size is O(1/eps · ln(1/(1-confidence))) —
    independent of data size."""
    row = df.select(F.col(col).cast("string").alias("_k")).agg(
        F.count_min_sketch("_k", F.lit(eps), F.lit(confidence), F.lit(seed))
    )
    return bytes(row.collect()[0][0])


def cms_estimate(spark: SparkSession, sketch: bytes, item: str) -> int:
    """Driver-side point query against a serialized count-min sketch
    (estimate ≥ true count; ≤ true + ε·N at the sketch's confidence)."""
    jvm = spark._jvm
    stream = jvm.java.io.ByteArrayInputStream(bytearray(sketch))
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(stream)
    return int(cms.estimateCount(item))
