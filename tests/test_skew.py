"""Salted aggregation / skew-join: salting must be invisible in
results and must actually spread the hot key."""

from __future__ import annotations

from pyspark.sql import functions as F

from movievectorsearch_spark.catalog import load_table
from movievectorsearch_spark.operators.skew import (
    deterministic_salt,
    salted_agg,
    salted_join_small_side,
)


def test_salted_agg_equals_direct(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    direct = {
        r["event_type"]: (r["n"], r["mn"], r["mx"])
        for r in e.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.min("user_id").alias("mn"),
            F.max("user_id").alias("mx"),
        )
        .collect()
    }
    salted = {
        r["event_type"]: (r["n"], r["mn"], r["mx"])
        for r in salted_agg(
            e,
            ["event_type"],
            {"n": ("count", "event_id"), "mn": ("min", "user_id"), "mx": ("max", "user_id")},
            id_col="event_id",
            n_salts=8,
        ).collect()
    }
    assert salted == direct


def test_salt_actually_spreads(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    n_buckets = (
        e.select(deterministic_salt(F.col("event_id"), 8).alias("s"))
        .distinct()
        .count()
    )
    assert n_buckets == 8


def test_salted_join_equals_plain_join(spark):
    big = spark.createDataFrame(
        [(i, "hot" if i % 10 else "cold") for i in range(1000)], "id INT, k STRING"
    )
    small = spark.createDataFrame(
        [("hot", 1.5), ("cold", 2.5)], "k STRING, weight DOUBLE"
    )
    plain = sorted(
        tuple(r) for r in big.join(small, "k").select("id", "weight").collect()
    )
    salted = sorted(
        tuple(r)
        for r in salted_join_small_side(big, small, "k", "id", n_salts=4)
        .select("id", "weight")
        .collect()
    )
    assert salted == plain


def test_non_algebraic_op_rejected(spark, sf_dir):
    import pytest

    e = load_table(spark, sf_dir, "events")
    with pytest.raises(ValueError, match="non-algebraic"):
        salted_agg(e, ["event_type"], {"x": ("avg", "value")}, "event_id")
