"""ORC source/sink.

Completes the columnar-interchange matrix (parquet: catalog.py /
partitioned.py / bucketing.py; CSV: csvio.py; JSON:
registry.read_json_profiles). ORC is Spark-native (vectorized reader,
predicate pushdown, column pruning — the same scan contract as
parquet), so the engine treats it as a first-class landing format for
data arriving from Hive/Trino-era warehouses.

Scale notes:

- The vectorized ORC reader (``spark.sql.orc.impl=native``, default)
  gives the same whole-stage-codegen scan path as parquet; filters
  show up as ``PushedFilters`` identically.
- Like every sink here, writes go through a job-committer protocol —
  a half-written directory is never visible to readers.
- DuckDB cannot read ORC, so the oracle for ``orc_roundtrip_agg`` runs
  on the ORIGINAL parquet: a PASS proves the ORC round trip is
  lossless (doubles, timestamps, nested arrays).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

__all__ = ["write_orc", "read_orc"]


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str, schema: StructType | str | None = None) -> DataFrame:
    """Read ORC; pass the expected schema to enforce it (reader still
    prunes columns/pushes filters — the schema is a contract check, not
    an inference pass)."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.orc(path)
