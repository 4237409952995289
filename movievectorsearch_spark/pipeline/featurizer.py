"""Deterministic local embedding featurizer — the test stand-in for the
reference's external embedding call (``create_embedding``,
ai_service.py:23-42; SURVEY.md §2.9 V5).

Design: seeded hash projection. Each token hashes (portable polynomial
hash) into one of ``dim`` buckets with a ±1 sign bit; the doc vector is
the L2-normalized bucket-count vector. Properties that matter:
- fully deterministic (oracle/test friendly),
- pure Column expressions → runs at scan speed, and the REAL embedding
  model swaps in as a ``mapInPandas`` stage with the same signature
  (text column in, array<double> out) without touching the plan shape.

The external-model variant (`embed_with_model`) shows that boundary:
an Arrow-batched iterator UDF — the only place the pipeline leaves the
JVM — kept out of tests and benchmarks.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from movievectorsearch_spark.functions.hashing import P, poly_hash
from movievectorsearch_spark.functions.text import tokens

DEFAULT_DIM = 64


def hash_embed(text: Column, dim: int = DEFAULT_DIM) -> Column:
    """text → unit-norm array<double> of size ``dim``.

    counts[j] = sum over tokens of sign, where bucket = h % dim,
    sign = +1 if (h // dim) % 2 == 0 else -1. One fold over the token
    hashes building the whole bucket array — NOT one aggregate per
    bucket, which would re-hash every token ``dim`` times (interpreted
    higher-order functions do no common-subexpression elimination).

    SCALE NOTE (round 7, measured): even in this single-fold form the
    interpreted lambda costs ~20 ms/row on ~500-char docs (the fold
    rebuilds a dim-wide array per token and an O(1)-slot slice+concat
    update measured within 4% — the per-element interpreter dispatch
    dominates, not the array shape). Fine for the small ingest batches
    this backs; for corpus-scale embedding use :func:`hash_embed_arrow`
    (bit-equal by construction and by test, ~100x per row) — the same
    Arrow boundary a real embedding model would occupy.
    """
    tok_h = F.transform(tokens(text), lambda t: poly_hash(t))
    zeros = F.array_repeat(F.lit(0.0), dim)
    counts = F.aggregate(
        tok_h,
        zeros,
        lambda acc, h: F.zip_with(
            acc,
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda x, j: x
            + F.when(
                h % dim == j,
                F.when((h / dim).cast("bigint") % 2 == 0, 1.0).otherwise(-1.0),
            ).otherwise(0.0),
        ),
    )
    norm = F.sqrt(F.aggregate(counts, F.lit(0.0), lambda a, x: a + x * x))
    return F.when(norm != 0.0, F.transform(counts, lambda x: x / norm))


def embed_documents(
    docs: DataFrame, text_col: str = "text", dim: int = DEFAULT_DIM,
    out_col: str = "embedding",
) -> DataFrame:
    return docs.withColumn(out_col, hash_embed(F.col(text_col), dim))


def hash_embed_arrow(text: Column, dim: int = DEFAULT_DIM) -> Column:
    """Arrow-batched twin of :func:`hash_embed` — BIT-EQUAL output
    (tests/test_ingest.py proves exact equality over the corpus), built
    for corpus-scale embedding where the interpreted fold's ~20 ms/row
    is the bottleneck.

    Why bit-equal is achievable: the bucket counts are small exact
    integers (order-independent sums), the norm is a sqrt of an exact
    integer-valued double, and the final division is one IEEE op per
    slot — no accumulation-order surface. Tokenization and the
    polynomial hash are replayed in integer Python matching the JVM
    semantics EXACTLY, beyond ASCII (round-7 advisor):

    - Java ``\\s`` is ASCII-only, so the split pattern is the literal
      class ``[ \\t\\n\\x0b\\f\\r]+`` — Python's Unicode-aware ``\\s``
      would also split on NBSP/U+2028 and diverge;
    - Spark ``trim`` strips only ' ' (verified: ``\\t``/``\\n``/NBSP
      survive), so ``strip(' ')``, not bare ``strip()``;
    - Spark ``split(col, '')`` + ``ascii`` yield full CODE POINTS even
      for astral chars (verified: one 128512 element for U+1F600, not
      two surrogates), so Python ``ord`` is the correct fold unit.

    tests/test_ingest.py covers NBSP / U+2028 / emoji / combining-mark
    rows against the Column form.

    This is the same plan position a REAL embedding model occupies
    (embed_with_model below): one Arrow batch in, one array column out
    — swapping the fake for the model touches nothing else.
    """
    from pyspark.sql.types import ArrayType, DoubleType

    @F.pandas_udf(ArrayType(DoubleType()))
    def _embed(texts):
        import numpy as np
        import pandas as pd
        import re

        # Java \s, not Python \s: ASCII whitespace only (see docstring)
        ws = re.compile("[ \t\n\x0b\f\r]+")

        def one(t):
            if t is None:
                t = ""
            counts = np.zeros(dim)
            for tok in ws.split(t.strip(" ").lower()):
                if not tok:
                    continue
                acc = 0
                for ch in tok:
                    acc = (acc * 31 + ord(ch)) % P
                counts[acc % dim] += 1.0 if (acc // dim) % 2 == 0 else -1.0
            norm = float(np.sqrt(np.dot(counts, counts)))
            if norm == 0.0:
                return None
            return list(counts / norm)

        return pd.Series([one(t) for t in texts])

    return _embed(text)


def embed_with_model(
    docs: DataFrame,
    call_model: Callable[[list[str]], list[list[float]]],
    text_col: str = "text",
    out_col: str = "embedding",
) -> DataFrame:
    """The production boundary: batch texts through an external
    embedding model inside ``mapInPandas`` (Arrow-batched; one HTTP
    call per batch, not per row — the reference does one call per text,
    movie_generator.py:425-450, which cannot scale)."""
    import pandas as pd
    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    # build a NEW StructType — StructType.add mutates in place, and
    # df.schema hands back the DataFrame's cached schema object
    schema = StructType(
        list(docs.schema.fields) + [StructField(out_col, ArrayType(DoubleType()))]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = call_model(pdf[text_col].tolist())
            yield pdf

    return docs.mapInPandas(run, schema=schema)
