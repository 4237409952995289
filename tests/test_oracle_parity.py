"""The local replica of the driver's t2 gate: every registered query
runs on Spark AND its DuckDB oracle at sf0.001 and must match on
row-count + columns + order-insensitive values."""

from __future__ import annotations

import pytest

from movievectorsearch_spark.plans import queries as Q
from movievectorsearch_spark.testing import compare

NAMES = sorted(Q.QUERIES)


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(name, spark, duck, sf_dir):
    spec = Q.QUERIES[name]
    sdf = spec["spark"](spark, sf_dir).toPandas()
    if spec["sql"] is None:
        # rows-only check for non-SQL-expressible ops
        assert len(sdf) >= 0
        return
    odf = duck.sql(spec["sql"]).df()
    problems = compare(sdf, odf)
    assert not problems, f"{name}: " + "; ".join(problems[:4])


def test_every_query_has_unique_name():
    assert len(NAMES) == len(set(NAMES))


def test_entry_smoke(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns  # stable schema
    assert set(E.oracle_sql()) <= set(E.queries())


def test_bench_names_are_registered():
    from bench import BENCH_QUERIES

    missing = [n for n in BENCH_QUERIES if n not in Q.QUERIES]
    assert not missing, missing


def test_zero_rows_only_entries():
    """Round 6 converted the last two rows-only entries to
    oracle-backed bound checks — every registry entry must now carry
    an oracle_sql so the driver hash-compares all of them."""
    rows_only = [n for n in NAMES if Q.QUERIES[n]["sql"] is None]
    assert rows_only == []
