"""Unit tests for the expression builders against pure-Python models."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from movievectorsearch_spark.functions.hashing import P, minhash_coeffs, poly_hash
from movievectorsearch_spark.functions.text import (
    clean_text,
    normalize_key,
    slug_id,
    tokens,
    word_shingles,
)
from movievectorsearch_spark.functions.vector import (
    cosine_similarity,
    dot,
    l2_norm,
    l2_normalize,
    vector_lit,
)


def py_poly_hash(s: str) -> int:
    acc = 0
    for ch in s:
        acc = (acc * 31 + ord(ch)) % P
    return acc


def test_poly_hash_matches_python_model(spark):
    samples = ["", "a", "hello world", "The quick brown fox", "doc 42"]
    df = spark.createDataFrame([(s,) for s in samples], "s STRING")
    got = {r["s"]: r["h"] for r in df.select("s", poly_hash(F.col("s")).alias("h")).collect()}
    for s in samples:
        assert got[s] == py_poly_hash(s), s


def test_poly_hash_arrow_twin_bit_equal(spark):
    """The batch-vectorized kernel (functions/hashing_arrow.py) must
    reproduce the relational fold exactly — including the empty-string
    zero, NULL passthrough, long strings (several fold wraps past P),
    and non-ASCII code points (UTF-32 replay)."""
    from movievectorsearch_spark.functions.hashing_arrow import (
        poly_hash_rows_arrow,
    )

    samples = [
        (1, ""),
        (2, None),
        (3, "a"),
        (4, "hello world|42|O|12345"),
        (5, "The quick brown fox jumps over the lazy dog " * 40),
        (6, "naïve café — ünïcode ✓ 𝒳"),
        (7, "|||"),
    ]
    df = spark.createDataFrame(samples, "k INT, s STRING")
    rel = {
        r["k"]: r["h"]
        for r in df.select("k", poly_hash(F.col("s")).alias("h")).collect()
    }
    arrow = {
        r["k"]: r["h"]
        for r in poly_hash_rows_arrow(df, F.col("s"), "k").collect()
    }
    assert arrow == rel
    # and both match the Python model on non-null rows
    for k, s in samples:
        if s is not None:
            assert arrow[k] == py_poly_hash(s), k


def py_int_mix(x: int) -> int:
    h = ((x % P) + P) % P
    h = (h * 1_103_515_245 + 12_345) % P
    return (h * h + h * 31) % P


def test_int_mix_matches_python_model_and_duckdb(spark):
    """int_mix is the integer-domain portable hash (poisson bootstrap
    draws): Spark expression, DuckDB SQL mirror, and the Python model
    must agree exactly, including negatives and values past P."""
    import duckdb

    from movievectorsearch_spark.functions import int_mix, int_mix_sql

    vals = [0, 1, 42, -7, -P, P - 1, P, P + 5, 10**12, 123456789]
    df = spark.createDataFrame([(v,) for v in vals], "x BIGINT")
    got = {
        r["x"]: r["h"]
        for r in df.select("x", int_mix(F.col("x")).alias("h")).collect()
    }
    duck = list(
        duckdb.sql(
            "SELECT " + ", ".join(int_mix_sql(str(v)) for v in vals)
        ).fetchall()[0]
    )
    for v, d in zip(vals, duck):
        assert got[v] == py_int_mix(v) == d, v


def test_int_mix_uniform_enough_for_bootstrap(spark):
    """The Poisson-bootstrap inversion needs u = int_mix(id*37+b) % 1e6
    to look uniform: over 20k draws the empirical Poisson(1) weight
    frequencies must sit near the true pmf (a pure-affine mixer fails
    this badly for consecutive ids)."""
    from movievectorsearch_spark.functions import int_mix

    df = spark.range(20000).select(
        (int_mix((F.col("id") % P) * 37 + F.col("id") % 32) % 1_000_000).alias("u")
    )
    p0 = df.filter(F.col("u") < 367879).count() / 20000
    assert abs(p0 - 0.3679) < 0.02


def test_minhash_coeffs_deterministic_and_odd():
    c1 = minhash_coeffs(16)
    c2 = minhash_coeffs(16)
    assert c1 == c2
    assert all(a % 2 == 1 for a, _ in c1)
    assert len({(a, b) for a, b in c1}) == 16


def test_clean_text(spark):
    cases = [
        ("**Bold Title**", "Bold Title"),
        ("1. The  Matrix ", "The Matrix"),
        ("'quoted' _under_  *star*", "quoted under star"),
        ("42. Some Movie", "Some Movie"),
    ]
    df = spark.createDataFrame([(a,) for a, _ in cases], "s STRING")
    got = [r["c"] for r in df.select(clean_text(F.col("s")).alias("c")).collect()]
    assert got == [e for _, e in cases]


def test_normalize_key_and_slug(spark):
    df = spark.createDataFrame([("  The Matrix  ", 1999)], "t STRING, y INT")
    row = df.select(
        normalize_key(F.col("t")).alias("k"),
        slug_id(F.trim(F.col("t")), F.col("y")).alias("slug"),
    ).collect()[0]
    assert row["k"] == "the matrix"
    assert row["slug"] == "the_matrix_1999"


def test_tokens_and_shingles(spark):
    df = spark.createDataFrame([("The quick  Brown fox jumps",)], "s STRING")
    row = df.select(
        tokens(F.col("s")).alias("t"),
        word_shingles(F.col("s"), 3).alias("sh"),
    ).collect()[0]
    assert row["t"] == ["the", "quick", "brown", "fox", "jumps"]
    assert row["sh"] == [
        "the quick brown",
        "quick brown fox",
        "brown fox jumps",
    ]
    # short text → single joined shingle
    short = spark.createDataFrame([("one two",)], "s STRING")
    assert short.select(word_shingles(F.col("s"), 3).alias("sh")).collect()[0][
        "sh"
    ] == ["one two"]


def test_cosine_matches_numpy(spark):
    rng = np.random.RandomState(0)
    a = rng.uniform(-1, 1, 16)
    b = rng.uniform(-1, 1, 16)
    expected = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    df = spark.range(1)
    got = df.select(
        cosine_similarity(vector_lit(a.tolist()), vector_lit(b.tolist())).alias("c"),
        dot(vector_lit(a.tolist()), vector_lit(b.tolist())).alias("d"),
        l2_norm(vector_lit(a.tolist())).alias("n"),
    ).collect()[0]
    assert abs(got["c"] - expected) < 1e-12
    assert abs(got["d"] - float(a @ b)) < 1e-12
    assert abs(got["n"] - float(np.linalg.norm(a))) < 1e-12


def test_cosine_zero_vector_is_null(spark):
    df = spark.range(1)
    got = df.select(
        cosine_similarity(vector_lit([0.0, 0.0]), vector_lit([1.0, 2.0])).alias("c")
    ).collect()[0]
    assert got["c"] is None


def test_l2_normalize_unit_norm(spark):
    df = spark.range(1)
    got = df.select(
        l2_norm(l2_normalize(vector_lit([3.0, 4.0]))).alias("n")
    ).collect()[0]
    assert abs(got["n"] - 1.0) < 1e-12


def test_split_sentences_udtf(spark):
    from movievectorsearch_spark.functions.sentences import register

    register(spark)
    spark.createDataFrame(
        [(1, "Hello there. How are you?? Fine! "), (2, None), (3, "...")],
        "doc_id INT, text STRING",
    ).createOrReplaceTempView("udtf_unit")
    rows = spark.sql(
        "SELECT doc_id, s.pos, s.sentence FROM udtf_unit d, "
        "LATERAL split_sentences(d.text) s ORDER BY doc_id, pos"
    ).collect()
    # raw split ordinals survive empty-fragment drops; null/empty texts emit nothing
    assert [(r.doc_id, r.pos, r.sentence) for r in rows] == [
        (1, 0, "Hello there"),
        (1, 1, "How are you"),
        (1, 2, "Fine"),
    ]
