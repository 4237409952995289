"""Batch-vectorized Arrow twin of :func:`functions.hashing.poly_hash`.

The relational ``poly_hash`` — ``split(s, '') → transform(ascii) →
aggregate fold`` — dispatches an interpreted JVM lambda per CHARACTER
(HOFs are CodegenFallback), which is fine for short keys but dominates
whole-row/whole-text hashing: table_checksum_audit spends ~2 s at
sf0.1 folding ~25 M characters one dispatch at a time. This kernel
computes the identical values with one NumPy pass per Arrow batch,
using the same closed-form modular prefix-hash the shingle kernel
(operators/shingle_arrow.py) established:

    h(s) = Σ c_j · 31^{n-1-j} mod P
         = 31^{n-1} · (S[n] − S[0]) mod P,   S[k] = Σ_{j<k} c_j·31^{−j}

with all rows of a batch concatenated into ONE code-point array, so
the per-row hash is two fancy-indexed lookups — no per-character (or
even per-row) Python work. 31 is invertible mod the prime P, the
inverse powers come from the same O(log n) doubling table, every
intermediate stays below 2^52, and code points are replayed via UTF-32
exactly like the proven twins (pipeline/featurizer.hash_embed_arrow,
operators/shingle_arrow.shingle_hash_rows). Bit-equal to the
relational fold row-for-row, including ``poly_hash('') = 0`` and
``poly_hash(NULL) = NULL`` (tests/test_functions.py).

The relational form remains the DuckDB-oracle mirror; this is the
scale path for operators that hash entire rows or documents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from movievectorsearch_spark.functions.hashing import P
from movievectorsearch_spark.operators.shingle_arrow import _geom_table

__all__ = ["poly_hash_rows_arrow"]

_INV31 = pow(31, P - 2, P)  # P prime → Fermat inverse


def _hash_flat(texts) -> "np.ndarray":
    """poly_hash of every string in ``texts`` (an ordered flat list),
    via ONE concatenated code-point array and the closed-form modular
    prefix hash — the kernel's core math, factored out so batch shapes
    (scalar rows, token arrays) can share it. Empty string hashes to 0,
    matching ``poly_hash('') = 0``."""
    import numpy as np

    joined = "".join(texts)
    codes = np.frombuffer(
        joined.encode("utf-32-le"), dtype="<u4"
    ).astype(np.int64)
    lens = np.fromiter(
        (len(t) for t in texts), dtype=np.int64, count=len(texts)
    )
    ends = np.cumsum(lens)
    starts = ends - lens
    total = int(ends[-1]) if len(ends) else 0
    pw = _geom_table(31, max(total - 1, 0))
    ipw = _geom_table(_INV31, max(total - 1, 0))
    # S[k] = Σ_{j<k} c_j·31^{−j} mod P, taken as a RAW int64 cumsum.
    # The real invariant (r11 ADVICE): the cumsum may wrap past 2^63 on
    # a batch over ~4.3e9 chars, but s_cum[ends] - s_cum[starts] is
    # computed in two's-complement int64, so the PER-ROW difference is
    # exact as long as one row's weight sum < 2^63 (each w < P ≈ 2^31 ⇒
    # rows up to ~4.3e9 chars are safe). Do NOT "fix" the overflow by
    # reducing the cumsum mod P or changing dtype — the wraparound
    # subtraction is what keeps this exact.
    w = codes * ipw[:total] % P
    s_cum = np.concatenate([np.zeros(1, np.int64), np.cumsum(w)])
    h = (
        (s_cum[ends] - s_cum[starts]) % P
        * pw[np.maximum(ends - 1, 0)]
        % P
    )
    return np.where(lens == 0, 0, h)


def poly_hash_rows_arrow(
    df: DataFrame, expr: Column, *carry: str
) -> DataFrame:
    """``(… carry cols …, h)``: poly_hash of ``expr`` per row.

    ``carry`` names pass-through columns (must exist on ``df``); the
    output schema is ``carry + (h: bigint)``. One mapInPandas over
    exactly the needed columns (guide §4.1: project before the opaque
    function) — the string bytes cross the Arrow boundary once and are
    hashed batch-at-a-time.
    """
    import numpy as np  # noqa: F401  (kernel-side import check at build)

    from pyspark.sql.types import LongType, StructField, StructType

    # r11 ADVICE: a carry column named 'h' or '__s' would silently be
    # overwritten by the kernel's own columns — refuse loudly instead.
    clash = {"h", "__s"}.intersection(carry)
    if clash:
        raise ValueError(
            f"carry columns {sorted(clash)} collide with the kernel's "
            "output columns ('h', '__s') — rename them upstream"
        )
    in_df = df.select(*[F.col(c) for c in carry], expr.alias("__s"))
    schema = StructType(
        [in_df.schema[c] for c in carry] + [StructField("h", LongType())]
    )

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            vals = pdf["__s"]
            isnull = vals.isna().to_numpy()
            texts = ["" if n else t for t, n in zip(vals, isnull)]
            h = _hash_flat(texts)
            out = {c: pdf[c] for c in carry}
            harr = pd.array(h, dtype="Int64")
            if isnull.any():
                harr[isnull] = pd.NA
            out["h"] = harr
            yield pd.DataFrame(out)

    return in_df.mapInPandas(kernel, schema=schema)
