"""Snapshot diff — change-data-capture between two table versions.

Classifies every key as insert / delete / update / unchanged via ONE
full-outer join on the key columns (null-safe compares on the value
columns). This is the primitive behind incremental pipeline rebuilds:
diff yesterday's snapshot against today's, then reprocess only the
insert/update keys instead of the whole table.

The reference has no versioning at all (each Mongo upsert destroys the
previous value, movie_generator.py:452-467); a lake-format table gets
this diff from its commit log, but between ARBITRARY snapshots (or
across systems) the join form below is the only general answer.

Scale: one shuffle of each snapshot on the key; with both snapshots
bucketed on the key (sources/bucketing.py) the join is co-located and
zero-exchange. Output is one row per key — feed it to an aggregate
(counts by change class) before collecting anything.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["snapshot_diff"]


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Return one row per key present in either snapshot, with columns
    ``keys...``, ``change`` ∈ {insert, delete, update, unchanged}, and
    the old/new values of each compared column (``old_c`` / ``new_c``)."""
    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in keys],
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
    )
    n = new.select(
        *[F.col(k).alias(f"__nk_{k}") for k in keys],
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
    )
    on: Column = reduce(
        lambda a, b: a & b,
        [F.col(f"__ok_{k}") == F.col(f"__nk_{k}") for k in keys],
    )
    in_old = F.col(f"__ok_{keys[0]}").isNotNull()
    in_new = F.col(f"__nk_{keys[0]}").isNotNull()
    differs = reduce(
        lambda a, b: a | b,
        [
            ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
            for c in compare_cols
        ],
    )
    change = (
        F.when(~in_old, F.lit("insert"))
        .when(~in_new, F.lit("delete"))
        .when(differs, F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    return o.join(n, on, "full_outer").select(
        *[
            F.coalesce(F.col(f"__ok_{k}"), F.col(f"__nk_{k}")).alias(k)
            for k in keys
        ],
        change.alias("change"),
        *[F.col(f"old_{c}") for c in compare_cols],
        *[F.col(f"new_{c}") for c in compare_cols],
    )
