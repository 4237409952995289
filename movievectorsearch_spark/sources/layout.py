"""Sort-clustered parquet layout — row-group skipping for range filters.

Directory partitioning (partitioned.py) prunes on LOW-cardinality
equality keys. For range predicates on HIGH-cardinality columns
(timestamps, numeric measures, ids) the lever is min/max row-group
statistics: parquet readers skip any row group whose [min, max] range
can't satisfy the filter. Those stats exist in every file — but on
randomly-ordered data every row group spans nearly the full value
range, so nothing skips. Range-repartitioning + sorting within
partitions makes the ranges per file/row-group narrow and disjoint, so
a range filter touches only the files that actually hold matching rows.

This is the same idea marketed as "Z-ordering"/liquid clustering for
the single-column case; multi-column needs an interleaved (Morton) key,
which composes with this writer (pass the interleave expression as the
sort column).

At 100 TB: a 1% time-window query over a time-clustered table reads
~1% of the bytes; over an unclustered table it reads all of them.
tests/test_layout.py proves the contract with scan metrics (rows
actually read from a clustered vs unclustered layout).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "write_sort_clustered",
    "write_zorder_clustered",
    "morton_interleave",
    "scan_output_rows",
]


def write_sort_clustered(
    df: DataFrame,
    path: str,
    cluster_by: str,
    num_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered on ``cluster_by``: range-repartition (so
    each output file owns a narrow, disjoint value range) then sort
    within partitions (so row groups inside each file are narrow too).

    repartitionByRange samples the column to build balanced range
    bounds — skew in the cluster key yields balanced files anyway,
    unlike hash-partitioning a skewed key."""
    (
        df.repartitionByRange(num_files, cluster_by)
        .sortWithinPartitions(cluster_by)
        .write.mode(mode)
        .parquet(path)
    )


# classic 64-bit mask ladder spreading a ≤31-bit value onto every 2nd
# bit position (each step doubles the gap between occupied bit groups)
_SPREAD_MASKS = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def _spread_bits(col: Column) -> Column:
    """Spread a ≤31-bit value so its bits occupy every 2nd position —
    pure shift/mask arithmetic, stays inside whole-stage codegen."""
    x = col.bitwiseAND(F.lit(0x7FFFFFFF))
    for shift, mask in _SPREAD_MASKS:
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def morton_interleave(a: Column, b: Column) -> Column:
    """Morton (Z-order) interleave of two ≤31-bit non-negative ints.

    Adjacent Morton values are adjacent in BOTH dimensions, so sorting
    by this key gives every file/row-group a narrow min/max range on
    EACH input column simultaneously — which is what lets parquet
    stats prune on either predicate. Inputs must already be scaled to
    comparable bit widths (``write_zorder_clustered`` does this); a raw
    interleave of a 13-bit id with a 21-bit measure would let the wide
    column dominate every split and the narrow one prune nothing.
    """
    return _spread_bits(a).bitwiseOR(F.shiftleft(_spread_bits(b), 1))


def write_zorder_clustered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    num_files: int = 16,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write parquet Z-order-clustered on TWO high-cardinality columns.

    Single-column sort-clustering makes one dimension prunable and
    leaves the other unsorted (its per-file min/max spans everything).
    Z-ordering scales both columns onto a common ``bits``-wide grid
    (min/max from one tiny agg — the same stats pass any table format's
    OPTIMIZE ZORDER runs), interleaves the bits, and range-partitions +
    sorts by the interleaved key. Each output file then owns a Z-box:
    narrow in BOTH dimensions, so range filters on either column (or
    both) skip most files. tests/test_layout.py proves it with scan
    metrics against the single-column layout."""
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).collect()[0]

    def scaled(col: str, lo, hi) -> Column:
        span = float(hi - lo) or 1.0
        return (
            ((F.col(col) - F.lit(lo)) / F.lit(span) * F.lit((1 << bits) - 1))
            .cast("bigint")
        )

    z = morton_interleave(scaled(col_a, lo_a, hi_a), scaled(col_b, lo_b, hi_b))
    (
        df.withColumn("_z", z)
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )


def scan_output_rows(df: DataFrame) -> int:
    """Execute ``df`` and return the number of rows the parquet scan
    actually produced (post row-group skipping, pre any later filter) —
    the observable for layout tests. Uses the scan node's SQL metrics
    from the executed plan."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan()

    def find_scan_rows(node):
        name = node.nodeName()
        if name.startswith("Scan parquet") or "FileScan" in name:
            m = node.metrics()
            it = m.iterator()
            while it.hasNext():
                kv = it.next()
                if kv._1() == "numOutputRows":
                    return kv._2().value()
            return None
        it = node.children().iterator()
        while it.hasNext():
            got = find_scan_rows(it.next())
            if got is not None:
                return got
        # AQE wraps the tree in nodes whose children are hidden behind
        # executedPlan attributes; fall back to string search only if
        # the structural walk found nothing.
        return None

    rows = find_scan_rows(plan)
    if rows is None:
        raise AssertionError("no parquet scan with numOutputRows metric found")
    return int(rows)
