"""Vector kernels as native Catalyst expressions.

The reference computes cosine similarity with sklearn over NumPy
(reference backend/ai_service.py:44-57). Here the kernel is a pure SQL
expression — ``zip_with`` + ``aggregate`` — so it runs inside
whole-stage codegen on executors, vectorizes with the rest of the
stage, and needs no Python worker or Arrow exchange. At 100 TB the
difference between this and a row-at-a-time Python UDF is the whole
game: the expression form scans embeddings at parquet-read speed.

All arithmetic is forced to DOUBLE (the stored vectors are float32) so
results are reproducible and match the DuckDB oracle bit-for-bit
modulo a final rounding.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return v.cast("array<double>")


def vector_lit(vec: Sequence[float]) -> Column:
    """A literal query vector as array<double>."""
    return F.array(*[F.lit(float(x)) for x in vec])


def dot(a: Column, b: Column) -> Column:
    """Dot product, sequential left-fold (same order as the oracle)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """cos(a,b) = a·b / (|a||b|); NULL if either norm is zero.

    Semantics of reference ai_service.py:49-52 (sklearn
    cosine_similarity), re-expressed declaratively.
    """
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0.0, dot(a, b) / denom)


def l2_normalize(a: Column) -> Column:
    """Unit-normalize; pre-step for LSH-based ANN (cosine → euclidean)."""
    n = l2_norm(a)
    return F.when(n != 0.0, F.transform(_as_double(a), lambda x: x / n))


def dot_sql(a: str, b: str) -> str:
    """DuckDB-dialect mirror of :func:`dot` (for oracle_sql)."""
    return (
        f"list_reduce(list_transform(list_zip({a}::DOUBLE[], {b}::DOUBLE[]),"
        f" p -> p[1] * p[2]), (acc, x) -> acc + x)"
    )


def cosine_sql(a: str, b: str) -> str:
    """DuckDB-dialect mirror of :func:`cosine_similarity`."""
    norm = "sqrt(list_reduce(list_transform({v}::DOUBLE[], x -> x*x), (a,b) -> a+b))"
    na, nb = norm.format(v=a), norm.format(v=b)
    return f"CASE WHEN {na} * {nb} <> 0 THEN ({dot_sql(a, b)}) / ({na} * {nb}) END"
