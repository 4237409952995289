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

__all__ = [
    "hll_rollup",
    "cms_build",
    "cms_estimate",
    "cms_table",
    "cms_estimate_join",
]


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
    (estimate ≥ true count; ≤ true + ε·N at the sketch's confidence).

    For anything beyond a handful of probes use
    :func:`cms_table` + :func:`cms_estimate_join` instead — the JVM
    sketch object only answers one key per py4j round-trip, which is
    the wrong shape for screening 10⁶ candidate keys."""
    jvm = spark._jvm
    stream = jvm.java.io.ByteArrayInputStream(bytearray(sketch))
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(stream)
    return int(cms.estimateCount(item))


# ---------------------------------------------------------------------------
# Relational count-min sketch (portable, executor-side estimation)
# ---------------------------------------------------------------------------
#
# The textbook CMS expressed as data instead of an opaque JVM object:
# depth hash rows × width counters become a DataFrame of at most
# depth*width (row, bucket, n) rows. Build is one explode + groupBy;
# the sketch stays mergeable (sum counters by (row, bucket)) and
# PERSISTABLE like the HLL rollup above. Estimation is a broadcast
# join of candidate keys against the tiny counter table — fully
# executor-side, so screening 10⁶ candidates is one distributed join,
# not 10⁶ driver round-trips. Hashing is the repo's portable
# polynomial + affine family, so the DuckDB oracle reproduces every
# counter and estimate bit-for-bit (unlike the JVM sketch, whose
# Murmur layout is engine-specific).

def _cms_bucket(key_col, a: int, b: int, width: int):
    from movievectorsearch_spark.functions.hashing import (
        minhash_permute,
        poly_hash,
    )

    return (minhash_permute(poly_hash(key_col), a, b) % width).cast("int")


def cms_coeffs(depth: int, seed: int = 7):
    from movievectorsearch_spark.functions.hashing import minhash_coeffs

    return minhash_coeffs(depth, seed)


def cms_table(
    df: DataFrame,
    col: str,
    depth: int = 5,
    width: int = 1024,
    seed: int = 7,
) -> DataFrame:
    """Build the relational CMS: (row, bucket, n) with one counter row
    per touched cell (≤ depth·width rows total, independent of data
    size). Merge two sketches by unioning and summing on (row, bucket).
    """
    key = F.col(col).cast("string")
    cells = F.array(
        *[
            F.struct(
                F.lit(j).alias("row"),
                _cms_bucket(key, a, b, width).alias("bucket"),
            )
            for j, (a, b) in enumerate(cms_coeffs(depth, seed))
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
        .agg(F.count("*").alias("n"))
    )


def cms_estimate_join(
    candidates: DataFrame,
    sketch: DataFrame,
    col: str,
    depth: int = 5,
    width: int = 1024,
    seed: int = 7,
) -> DataFrame:
    """Estimate counts for a column of candidate keys against a
    :func:`cms_table` sketch: compute the depth bucket coordinates per
    key (scan-speed expressions), broadcast-join the counter table,
    take the min over the depth rows. Missing cells count as 0 (key
    never seen). Returns (col, cms_n)."""
    key = F.col(col).cast("string")
    coords = F.array(
        *[
            F.struct(
                F.lit(j).alias("row"),
                _cms_bucket(key, a, b, width).alias("bucket"),
            )
            for j, (a, b) in enumerate(cms_coeffs(depth, seed))
        ]
    )
    probed = candidates.select(col, F.explode(coords).alias("c")).select(
        col, F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket")
    )
    return (
        probed.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("cms_n"))
    )
