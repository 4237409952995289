"""Runtime bloom-filter join pruning (Catalyst InjectRuntimeFilter).

At 100 TB the classic fact⋈filtered-dim join reads the whole fact
table, shuffles it, and only then drops the ~99% of rows whose keys
the filtered dimension never contained. Spark's runtime filter fixes
this declaratively: the optimizer builds a bloom filter over the
dimension's join keys (a scalar subquery, `bloom_filter_agg`) and
injects `might_contain` as a semi-join-reduction predicate on the FACT
side, evaluated at the scan — before the shuffle.

Nothing in our query code has to change for this; the point of these
tests is to prove our join shapes are eligible. The production
thresholds (creation side ≤ 10 MB plan-size, application side ≥ 10 GB
scan) are exactly right for a real cluster and exactly wrong for
sf0.01 fixtures, so the tests scope-set permissive thresholds; the
engine leaves the defaults alone.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F

from movievectorsearch_spark.catalog import load_table

_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "50MB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
    # runtime filters target shuffle joins; broadcast joins read the
    # fact side anyway, so force the shuffle path for the assertion
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@contextmanager
def _scoped_confs(spark, confs):
    old = {}
    for k, v in confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _fact_dim_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .count()
    )


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString().lower()


def test_bloom_filter_injected_on_fact_side(spark, sf_dir):
    with _scoped_confs(spark, _CONFS):
        plan = _executed(_fact_dim_join(spark, sf_dir))
    assert "might_contain" in plan, "runtime bloom filter not injected"
    assert "bloom_filter_agg" in plan, "creation-side sketch missing"


def test_join_result_unchanged_by_runtime_filter(spark, sf_dir):
    with _scoped_confs(spark, _CONFS):
        filtered = _fact_dim_join(spark, sf_dir).collect()
    off = dict(_CONFS)
    off["spark.sql.optimizer.runtime.bloomFilter.enabled"] = "false"
    with _scoped_confs(spark, off):
        plain = _fact_dim_join(spark, sf_dir).collect()
        assert "might_contain" not in _executed(_fact_dim_join(spark, sf_dir))
    assert sorted(map(tuple, filtered)) == sorted(map(tuple, plain))
