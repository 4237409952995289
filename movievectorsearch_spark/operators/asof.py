"""As-of (nearest-earlier) join.

SURVEY.md §2.3 records that the reference implements no as-of/interval
joins at all; this operator is part of the training-pipeline tier — the
time-series join a 100 TB event log needs (attach the most recent
quote/click/config to each trade/purchase/sample).

Scale strategy: a naive range join ``l.ts >= r.ts`` plans as a
broadcast-nested-loop (O(|L|·|R|) pair work). Instead we use the
sort-merge formulation: tag both sides, union them, and take a per-key
running ``last(payload, ignorenulls)`` ordered by (ts, side). That is

- ONE hash exchange on the join key (both sides co-partitioned),
- one sort within each partition (ts, side),
- zero pair-wise work — each row is touched once.

The plan survives arbitrary key cardinality and arbitrary skew between
the two sides' timestamps; state per key is a single struct, so the same
shape lifts to Structured Streaming (``applyInPandasWithState``) for the
online variant.

Semantics match DuckDB ``ASOF JOIN`` (l ⋈ r on key AND l.ts >= r.ts):
for every left row, the right row with the greatest right.ts <= left.ts
for the same key. Ties at equal ts are inclusive (the right row at
exactly left.ts matches). The right side must be unique per (key, ts) —
pre-aggregate if it isn't; the query registry's ``events_asof_join``
oracle-checks this operator against DuckDB's native ASOF JOIN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts: str = "ts",
    right_cols: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """For each ``left`` row, attach the most recent ``right`` row with
    ``right.ts <= left.ts`` per ``on`` key.

    Returns left's columns plus ``asof_ts`` (the matched right
    timestamp) and ``right_cols``. ``how='inner'`` drops left rows with
    no earlier right row; ``how='left'`` keeps them with nulls.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on and c != ts]

    reserved = {"asof_ts", "__side", "__payload", "__m"}
    clash = (set(right_cols) | reserved) & {c for c in left.columns if c not in on}
    clash |= reserved & set(right_cols)
    if clash:
        raise ValueError(
            f"asof_join output would contain duplicate column(s) {sorted(clash)}; "
            "rename the right-side columns (right_cols) before joining"
        )

    payload = F.struct(
        F.col(ts).alias("asof_ts"), *[F.col(c) for c in right_cols]
    )
    r_tagged = right.select(
        *on,
        F.col(ts).alias(ts),
        F.lit(0).alias("__side"),
        payload.alias("__payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in on and c != ts],
    )
    payload_type = r_tagged.schema["__payload"].dataType
    l_tagged = left.select(
        *on,
        F.col(ts).alias(ts),
        F.lit(1).alias("__side"),
        F.lit(None).cast(payload_type).alias("__payload"),
        *[F.col(c) for c in left.columns if c not in on and c != ts],
    )

    u = l_tagged.unionByName(r_tagged)
    # right rows sort before left rows at equal ts => inclusive match
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("__m", F.last("__payload", ignorenulls=True).over(w))
    out = matched.filter(F.col("__side") == 1)
    if how == "inner":
        out = out.filter(F.col("__m").isNotNull())
    elif how != "left":
        raise ValueError(f"unsupported how={how!r}")
    return out.select(
        *on,
        ts,
        *[c for c in left.columns if c not in on and c != ts],
        F.col("__m.asof_ts").alias("asof_ts"),
        *[F.col(f"__m.{c}").alias(c) for c in right_cols],
    )
