"""Portable deterministic hashing.

The dedup/fingerprint operators (MinHash, SimHash, rolling-hash
fingerprints) need a hash function that produces IDENTICAL values in
Spark and in the DuckDB oracle. Spark's ``hash()`` (Murmur3) and
DuckDB's ``hash()`` do not agree, so we use a polynomial rolling hash
over character codes, expressed with ``transform``/``aggregate``
lambdas in both dialects. It stays a native JVM expression in Spark —
no Python UDF — which is what keeps MinHash viable over 100 TB of text.

h(s) = fold(ascii chars c: acc = (acc * 31 + c) mod P),  P = 2^31 - 1 prime-ish
MinHash permutations: h_i(x) = (A_i * x + B_i) mod P  (classic affine family)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

P = 2_147_483_647  # 2^31 - 1 (Mersenne prime) — keeps acc*31+c inside int64


def poly_hash(col: Column) -> Column:
    """Polynomial rolling hash of a string column → bigint in [0, P)."""
    chars = F.split(col, "")
    return F.aggregate(
        F.transform(chars, lambda c: F.ascii(c).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, c: (acc * 31 + c) % F.lit(P),
    )


def poly_hash_sql(expr: str) -> str:
    """DuckDB mirror of :func:`poly_hash`."""
    return (
        f"list_reduce(list_prepend(0::BIGINT, "
        f"list_transform(string_split({expr}, ''), c -> ascii(c)::BIGINT)), "
        f"(acc, c) -> (acc * 31 + c) % {P})"
    )


def int_mix(col: Column) -> Column:
    """Portable integer mixer: bigint → pseudo-uniform bigint in [0, P).

    One LCG affine step then a modular square fold — the square supplies
    the non-linearity a pure affine chain lacks (affine∘affine is still
    affine, so consecutive inputs would land on an arithmetic
    progression). All intermediates stay below 2^62: operands are < P <
    2^31, so h*1103515245 < 2.4e18 and h*h < 4.7e18, both inside int64
    in Spark and DuckDB alike. This is the integer-domain replacement
    for ``poly_hash(concat_ws(...))`` in hot per-row paths — no string
    materialization, same cross-engine determinism.
    """
    h = (((col % F.lit(P)) + F.lit(P)) % F.lit(P)) * F.lit(
        1_103_515_245
    ) + F.lit(12_345)
    h = h % F.lit(P)
    return (h * h + h * F.lit(31)) % F.lit(P)


def int_mix_sql(expr: str) -> str:
    """DuckDB mirror of :func:`int_mix` (the LCG step is repeated
    textually because the square needs it twice and this must stay a
    single scalar expression usable inside any clause)."""
    h = (
        f"((((CAST({expr} AS BIGINT) % {P}) + {P}::BIGINT) % {P})"
        f" * 1103515245::BIGINT + 12345) % {P}"
    )
    return f"((({h}) * ({h}) + ({h}) * 31) % {P})"


# Affine permutation coefficients for MinHash: deterministic, odd A.
def minhash_coeffs(n: int, seed: int = 42) -> list[tuple[int, int]]:
    """n (A, B) pairs from a tiny deterministic LCG (no RNG dependency)."""
    coeffs = []
    state = seed
    for _ in range(n):
        state = (state * 1_103_515_245 + 12_345) % (1 << 31)
        a = (state | 1) % P or 1
        state = (state * 1_103_515_245 + 12_345) % (1 << 31)
        b = state % P
        coeffs.append((a, b))
    return coeffs


def minhash_permute(base_hash: Column, a: int, b: int) -> Column:
    """h_i(x) = (a*x + b) mod P over a base hash column."""
    return (base_hash * F.lit(a) + F.lit(b)) % F.lit(P)


def minhash_permute_sql(expr: str, a: int, b: int) -> str:
    return f"(({expr}) * {a} + {b}) % {P}"
