"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual registry lives in movievectorsearch_spark/plans/queries.py —
one named plan per operator from SURVEY.md §2, each citing the
reference file:line it re-expresses.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from movievectorsearch_spark.plans import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §7 minimum slice): the reference's
    vector-search read path — films view (documents ⋈ embeddings) →
    status filter → cosine vs a fixed query vector → ranked-then-
    unranked order → top-20 projection."""
    return Q.search_vector(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents — one per registered
    query (as of round 6 every entry has one; engine-specific values
    like sketch estimates are gated via bound/invariant columns the
    oracle emits as constants)."""
    return Q.oracle_sql()
