"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at a
given SF, compare row-count + sorted-columns value content.

Usage: python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, ".")

from movievectorsearch_spark.catalog import TABLES, table_path
from movievectorsearch_spark.plans import queries as Q
from movievectorsearch_spark.session import get_spark
from movievectorsearch_spark.testing import compare as _compare


def compare(name: str, sdf, odf) -> list[str]:
    return _compare(sdf, odf)


def main():
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.001"
    names = [a for a in args if "/" not in a] or list(Q.QUERIES)

    spark = get_spark(cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )

    n_pass = n_fail = n_noracle = 0
    for name in names:
        spec = Q.QUERIES[name]
        try:
            sdf = spec["spark"](spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: SPARK ERROR {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if spec["sql"] is None:
            print(f"rows  {name}: {len(sdf)} rows (no oracle)")
            n_noracle += 1
            continue
        try:
            odf = con.sql(spec["sql"]).df()
        except Exception as e:
            print(f"FAIL  {name}: ORACLE ERROR {type(e).__name__}: {e}")
            n_fail += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems[:4]))
            n_fail += 1
        else:
            print(f"PASS  {name} ({len(sdf)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
