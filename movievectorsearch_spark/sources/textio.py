"""Plain-text-lines source/sink.

The last cell of the interchange matrix (parquet / partitioned /
bucketed / CSV / JSON-lines / ORC — see csvio.py's scale notes): raw
``text`` files, one record per line, no schema at all. This is what
web-scale corpus drops actually look like before the first structuring
pass (WET files, log shards), so the engine needs the land-text →
parse-once → parquet path.

Same scale rules as CSV, but stricter: a text file has ONE string
column, no header, no types — every field must be re-derived by
parsing. The writer packs records as tab-separated lines (tabs inside
the payload are folded to spaces — the payload is free text, the key
fields are not); the reader splits with a bounded ``split(limit)`` so
payload tabs could never corrupt key fields anyway. No inference, no
second pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_doc_lines", "read_doc_lines"]


def write_doc_lines(docs: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Serialize (doc_id, lang, source, text) docs as one TSV line each.

    Field folding keeps the one-record-per-line invariant for ARBITRARY
    input: tabs AND newlines in the payload fold to spaces (an embedded
    newline would otherwise split one record into two physical lines),
    and every field is null-coalesced to '' — concat_ws silently SKIPS
    nulls, which would shift the remaining fields left one column on
    read-back."""
    def fold(c):
        # EVERY field folds separator characters, not just the payload —
        # a tab inside lang/source would shift columns, a newline inside
        # any field would split one record into two physical lines
        return F.regexp_replace(F.coalesce(c, F.lit("")), "[\t\r\n]", " ")

    line = F.concat_ws(
        "\t",
        F.coalesce(F.col("doc_id").cast("string"), F.lit("")),
        fold(F.col("lang")),
        fold(F.col("source")),
        fold(F.col("text")),
    )
    docs.select(line.alias("value")).write.mode(mode).text(path)


def read_doc_lines(spark: SparkSession, path: str) -> DataFrame:
    """Parse TSV doc lines back to typed columns. split(limit=4) keeps
    any residual tabs inside the payload."""
    parts = F.split(F.col("value"), "\t", 4)
    return spark.read.text(path).select(
        parts.getItem(0).cast("bigint").alias("doc_id"),
        parts.getItem(1).alias("lang"),
        parts.getItem(2).alias("source"),
        parts.getItem(3).alias("text"),
    )
