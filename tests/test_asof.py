"""as-of join operator semantics (operators/asof.py) on crafted rows:
inclusive ties, per-key isolation, inner-vs-left behavior, and the
plan contract (no nested-loop / cartesian)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from movievectorsearch_spark.operators.asof import asof_join


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts(10), "l-a"),
            (1, _ts(20), "l-b"),
            (1, _ts(5), "l-early"),   # before any right row
            (2, _ts(10), "l-other-key"),
        ],
        "k int, ts timestamp, lval string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts(8), 100.0),
            (1, _ts(20), 200.0),      # exact tie with l-b
            (2, _ts(9), 300.0),
        ],
        "k int, ts timestamp, rval double",
    )
    return left, right


def test_inner_matches(frames):
    left, right = frames
    out = asof_join(left, right, on=["k"], ts="ts", right_cols=["rval"])
    rows = {r.lval: (r.asof_ts, r.rval) for r in out.collect()}
    # l-early has no earlier right row -> dropped under inner
    assert set(rows) == {"l-a", "l-b", "l-other-key"}
    assert rows["l-a"] == (_ts(8), 100.0)
    # inclusive: right row at exactly left.ts matches
    assert rows["l-b"] == (_ts(20), 200.0)
    # keys do not bleed into each other
    assert rows["l-other-key"] == (_ts(9), 300.0)


def test_left_keeps_unmatched(frames):
    left, right = frames
    out = asof_join(left, right, on=["k"], ts="ts", right_cols=["rval"], how="left")
    rows = {r.lval: r.rval for r in out.collect()}
    assert len(rows) == 4
    assert rows["l-early"] is None


def test_no_pairwise_plan(frames):
    left, right = frames
    out = asof_join(left, right, on=["k"], ts="ts")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_bad_how_rejected(frames):
    left, right = frames
    with pytest.raises(ValueError):
        asof_join(left, right, on=["k"], ts="ts", how="full")


def test_key_with_no_right_rows(spark):
    left = spark.createDataFrame([(9, _ts(10), "only-left")], "k int, ts timestamp, lval string")
    right = spark.createDataFrame([(1, _ts(5), 1.0)], "k int, ts timestamp, rval double")
    assert asof_join(left, right, on=["k"], ts="ts").count() == 0
    kept = asof_join(left, right, on=["k"], ts="ts", how="left").collect()
    assert len(kept) == 1 and kept[0].rval is None


def test_colliding_right_cols_rejected(spark, frames=None):
    left = spark.createDataFrame([(1, _ts(1), 1.0)], "k int, ts timestamp, price double")
    right = spark.createDataFrame([(1, _ts(0), 2.0)], "k int, ts timestamp, price double")
    with pytest.raises(ValueError, match="duplicate column"):
        asof_join(left, right, on=["k"], ts="ts")


def test_first_touch_attribution_semantics(spark):
    """A purchase attributes to the user's earliest event within the
    preceding hour; with no prior activity it attributes to itself."""
    from movievectorsearch_spark.plans import queries as Q

    rows = Q.QUERIES["first_touch_attribution"]["spark"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows, "expected purchases in the fixture"
    for r in rows:
        assert 0 <= r.purchase_sec - r.touch_sec <= 3600
        # self-attribution only when the touch IS the purchase
        if r.touch_event_id == r.event_id:
            assert r.touch_type == "purchase"


def test_burst_detection_zscores_match_model(spark):
    """Every flagged hour's z-score re-derives from exact hourly counts."""
    from pyspark.sql import functions as SF

    from movievectorsearch_spark.catalog import load_table
    from movievectorsearch_spark.plans import queries as Q

    sf = "/root/testdata/sf0.001"
    got = Q.QUERIES["events_burst_detection"]["spark"](spark, sf).collect()
    hourly = (
        load_table(spark, sf, "events")
        .groupBy("event_type", SF.date_trunc("hour", "ts").alias("h"))
        .agg(SF.count("*").alias("c"))
        .collect()
    )
    by_type: dict = {}
    for r in hourly:
        by_type.setdefault(r.event_type, []).append(r.c)
    for r in got:
        cs = by_type[r.event_type]
        n = len(cs)
        mean = sum(cs) / n
        var = sum(c * c for c in cs) / n - mean * mean
        z = (r.c - mean) / var**0.5
        assert z > 3
        assert abs(z - r.zscore) < 1e-6, (r, z)
