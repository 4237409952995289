"""JSON-lines source/sink with enforced schemas.

The interchange-format sibling of csvio.py (CSV) and orcio.py (ORC);
the reference's only JSON I/O is the single-object profile file
(search.py:64-74, covered by registry.read_json_profiles). JSON-lines
is the shape external corpora actually arrive in (one document object
per line, splittable, append-friendly), so the engine needs a lossless
read path for it.

Scale rules, same as CSV:

- **Never infer schemas** — inference is a second full pass (at
  100 TB: a second 100 TB scan) AND it type-guesses per file, so two
  ingest batches can disagree. Readers take an explicit schema.
- JSON is an ingest format: no column statistics, no pushdown, no
  pruning — land it, take one pass, write parquet; everything
  downstream reads parquet.
- Doubles survive: Spark serializes shortest-round-trip decimal forms,
  so read-back values are bit-identical (jsonl_roundtrip_agg proves it
  against the parquet-sourced oracle). Timestamps are written at full
  microsecond precision with an explicit format, never the
  locale-dependent default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

__all__ = ["write_jsonl", "read_jsonl"]

_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write ``df`` as JSON-lines (one object per line, splittable)."""
    (
        df.write.mode(mode)
        .option("timestampFormat", _TS_FMT)
        # TIMESTAMP_NTZ columns format via the separate NTZ option; its
        # default truncates to millis, silently losing micros.
        .option("timestampNTZFormat", _TS_FMT)
        .json(path)
    )


def read_jsonl(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    """Read JSON-lines with an ENFORCED schema (no inference pass)."""
    return (
        spark.read.schema(schema)
        .option("timestampFormat", _TS_FMT)
        .option("timestampNTZFormat", _TS_FMT)
        .json(path)
    )
