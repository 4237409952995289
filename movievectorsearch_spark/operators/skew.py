"""Skew handling: salted two-phase aggregation and salted joins.

The reference never faces skew (corpus ~hundreds of rows); at 100 TB a
hot key (one event_type carrying half the events, one label holding
half the embeddings) pins a single reducer. Two standard cures, both
pure DataFrame:

- **Salted aggregation**: group by (key, salt) first — the hot key's
  rows spread over ``n_salts`` reducers — then re-aggregate by key.
  Works for any algebraic aggregate (sum/count/min/max); results are
  IDENTICAL to the direct groupBy, so it is oracle-checkable.
- **Salted skew join**: replicate the small side ``n_salts`` times with
  an explicit salt column and salt the big side randomly... except
  random salting breaks reproducibility, so here the big side's salt
  is a DETERMINISTIC hash of a row id — same spread, stable results.

AQE's skew-join splitting (enabled in session.py) handles sort-merge
skew automatically at runtime; these explicit forms are for the cases
AQE can't see (aggregation skew, broadcast-ineligible dimension
explosion) and for pinning the strategy in a saved plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deterministic_salt(id_col: Column, n_salts: int) -> Column:
    """Stable salt from a row id — reproducible spread (xxhash64 is
    seed-stable within a Spark version; for cross-engine oracles the
    salt never appears in the output, only in the shuffle key)."""
    return F.pmod(F.xxhash64(id_col), F.lit(n_salts))


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple],
    id_col: str,
    n_salts: int = 8,
) -> DataFrame:
    """Two-phase aggregation: phase 1 groups by (key, salt) spreading
    hot keys over ``n_salts`` partial reducers; phase 2 merges partials
    by key. ``aggs`` maps output name → (op, input) with op in
    {'count', 'sum', 'min', 'max'}.

    count re-merges with sum; min/max re-merge with themselves. The
    result is bit-identical to the direct groupBy for integer inputs
    (sums are associative), which is what makes this oracle-checkable.
    """
    salt = deterministic_salt(F.col(id_col), n_salts)
    phase1_aggs, phase2_aggs = [], []
    for out, (op, col) in aggs.items():
        p = f"__p_{out}"
        if op == "count":
            phase1_aggs.append(F.count(col).alias(p))
            phase2_aggs.append(F.sum(p).alias(out))
        elif op == "sum":
            phase1_aggs.append(F.sum(col).alias(p))
            phase2_aggs.append(F.sum(p).alias(out))
        elif op == "min":
            phase1_aggs.append(F.min(col).alias(p))
            phase2_aggs.append(F.min(p).alias(out))
        elif op == "max":
            phase1_aggs.append(F.max(col).alias(p))
            phase2_aggs.append(F.max(p).alias(out))
        else:
            raise ValueError(f"non-algebraic op {op!r} cannot be salted")
    partial = df.withColumn("__salt", salt).groupBy(*key_cols, "__salt").agg(
        *phase1_aggs
    )
    return partial.groupBy(*key_cols).agg(*phase2_aggs)


def salted_join_small_side(
    big: DataFrame,
    small: DataFrame,
    key: str,
    big_id_col: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew equi-join: the small side is replicated ``n_salts``× with a
    salt column; the big side computes the same deterministic salt, so
    each (key, salt) bucket holds ~1/n of the hot key's rows. Use when
    the small side is too big to broadcast but the join key is skewed.
    """
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    small_rep = small.select("*", salts)
    big_salted = big.withColumn(
        "__salt", deterministic_salt(F.col(big_id_col), n_salts).cast("int")
    )
    return big_salted.join(small_rep, [key, "__salt"]).drop("__salt")
