"""Sentence-splitting UDTF — the table-function corner of the §2.11
UDF surface (SURVEY.md §2.11 lists plain UDF / pandas_udf / mapInPandas;
a Python UDTF is the remaining Spark shape), and the chunking step of a
training-data pipeline: documents → one row per sentence, with the raw
split ordinal preserved so chunk order survives the shuffle.

Semantics are engine-portable by construction: split on runs of
terminators ``[.!?]+`` (no lookbehind — DuckDB's RE2 has none), keep
the RAW split index as ``pos`` (so both engines number identically even
after empty fragments are dropped), trim only ``space/tab/CR/LF``
(DuckDB ``trim(x, chars)`` parity — Python's bare ``str.strip()`` trims
more unicode whitespace than DuckDB's default).

Scale: ``useArrow=True`` ships input batches Arrow-encoded; the UDTF is
a per-row generator with no state, so it parallelizes per-partition
with zero shuffle — the lateral join is a narrow transformation.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

SENT_BOUNDARY = r"[.!?]+"
TRIM_CHARS = " \t\n\r"
_SPLIT = re.compile(SENT_BOUNDARY)


@udtf(returnType="pos bigint, sentence string, n_chars bigint", useArrow=True)
class SplitSentences:
    def eval(self, text):
        if text is None:
            return
        for i, raw in enumerate(_SPLIT.split(text)):
            s = raw.strip(TRIM_CHARS)
            if s:
                yield i, s, len(s)


def register(spark) -> None:
    spark.udtf.register("split_sentences", SplitSentences)
