"""Error bounds for the mergeable-sketch operators
(operators/sketch.py). Sketch output is engine-specific, so the
registry entries are rows-only; these tests supply the correctness
evidence: estimates must sit inside the structures' published bounds
relative to exact counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from movievectorsearch_spark.catalog import load_table
from movievectorsearch_spark.operators.sketch import (
    cms_build,
    cms_estimate,
    hll_rollup,
)


def test_hll_rollup_within_relative_error(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", "ts")
    )
    est = {
        r.event_type: r.est_distinct
        for r in hll_rollup(e, ["event_type"], "day", "user_id").collect()
    }
    exact = {
        r.event_type: r.n
        for r in e.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for k, n in exact.items():
        # lgk=12 → ~1.6% RSE; 5% is > 3 sigma
        assert abs(est[k] - n) <= max(2, 0.05 * n), (k, est[k], n)


def test_hll_union_equals_single_sketch_domain(spark, sf_dir):
    """Union of per-day sketches must estimate the same set as one
    global sketch — mergeability, the property that lets sketches be
    persisted per partition grain."""
    e = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", "ts")
    )
    merged = {
        r.event_type: r.est_distinct
        for r in hll_rollup(e, ["event_type"], "day", "user_id").collect()
    }
    single = {
        r.event_type: r.est
        for r in e.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12)))
            .cast("bigint")
            .alias("est")
        )
        .collect()
    }
    assert merged == single


def test_cms_bounds(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    eps = 0.001
    total = e.count()
    sketch = cms_build(e, "event_type", eps=eps)
    exact = {
        r.event_type: r.n
        for r in e.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    for k, n in exact.items():
        est = cms_estimate(spark, sketch, k)
        assert est >= n, "CMS must never underestimate"
        assert est <= n + eps * total + 1

    # a key never seen must estimate ~0 (≤ eps·N collisions)
    assert cms_estimate(spark, sketch, "no_such_event") <= eps * total
