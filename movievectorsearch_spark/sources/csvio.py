"""CSV source/sink with enforced schemas.

Rounds out the source matrix (parquet: catalog.py / partitioned.py /
bucketing.py; JSON: registry.read_json_profiles; streaming file source:
streaming/events.py). The reference has no file sources at all — its
only ingest is per-document Mongo upserts (movie_generator.py:452-467)
— but a standalone engine needs the interchange formats.

Scale rules encoded here:

- **Never infer schemas.** ``inferSchema`` is an extra full pass over
  the data before the real job starts (at 100 TB: a second 100 TB
  scan). Readers take an explicit DDL/StructType.
- CSV has no column statistics, no predicate pushdown beyond
  partition directories, and no columnar pruning — it is an ingest
  format. The pattern is: land CSV → one pass → parquet (see
  ``partitioned.write_partitioned``); everything downstream reads
  parquet.
- Doubles survive the round trip: Spark writes shortest-round-trip
  decimal representations (Java ``Double.toString``), so read-back
  values are bit-identical — ``csv_roundtrip_agg`` proves it against
  the parquet-sourced oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

__all__ = ["write_csv", "read_csv"]

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write ``df`` as headered CSV. Timestamps serialize at full
    microsecond precision so a read-back with the same format is
    lossless."""
    (
        df.write.mode(mode)
        .option("header", True)
        .option("timestampFormat", _TS_FMT)
        .csv(path)
    )


def read_csv(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    """Read headered CSV with an ENFORCED schema (no inference pass)."""
    return (
        spark.read.schema(schema)
        .option("header", True)
        .option("timestampFormat", _TS_FMT)
        .csv(path)
    )
