"""Z-order (Morton) clustering (sources/layout.py): range filters on
EITHER of the two cluster columns must skip files, where single-column
sort-clustering only serves its own column — asserted with scan
metrics, not plan text."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from movievectorsearch_spark.catalog import load_table
from movievectorsearch_spark.sources.layout import (
    morton_interleave,
    scan_output_rows,
    write_sort_clustered,
    write_zorder_clustered,
)


def test_morton_interleave_model(spark):
    cases = [(0, 0), (1, 0), (0, 1), (3, 3), (1 << 20, 0), (0, 1 << 20),
             (0x7FFFFFFF, 0), (12345, 67890)]

    def model(a, b):
        z = 0
        for i in range(31):
            z |= ((a >> i) & 1) << (2 * i) | ((b >> i) & 1) << (2 * i + 1)
        return z

    df = spark.createDataFrame(cases, "a BIGINT, b BIGINT").select(
        "a", "b", morton_interleave(F.col("a"), F.col("b")).alias("z")
    )
    for r in df.collect():
        assert r.z == model(r.a, r.b), (r.a, r.b, r.z)


@pytest.fixture(scope="module")
def zlayouts(spark, sf_dir, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("zorder"))
    e = load_table(spark, sf_dir, "events").withColumn(
        "cents", F.round(F.col("value") * 100, 0).cast("bigint")
    )
    write_zorder_clustered(e, base + "/z", "user_id", "cents", num_files=16)
    write_sort_clustered(e, base + "/single", "user_id", num_files=16)
    lo_u, hi_u, lo_c, hi_c = e.agg(
        F.min("user_id"), F.max("user_id"), F.min("cents"), F.max("cents")
    ).collect()[0]
    # slices sized relative to the observed ranges so the test holds at
    # any SF (sf0.001 has only 15 distinct users)
    u_cut = lo_u + max(1, (hi_u - lo_u) // 8)
    c_lo = lo_c + (hi_c - lo_c) // 5
    c_hi = lo_c + 3 * (hi_c - lo_c) // 10
    return base, e, u_cut, c_lo, c_hi


def _user_slice(df, u_cut):
    return df.filter(F.col("user_id") < u_cut)


def _cents_slice(df, c_lo, c_hi):
    return df.filter((F.col("cents") >= c_lo) & (F.col("cents") < c_hi))


def test_zorder_serves_both_dimensions(spark, zlayouts):
    base, e, u_cut, c_lo, c_hi = zlayouts
    total = e.count()
    z = spark.read.parquet(base + "/z")
    zu = scan_output_rows(_user_slice(z, u_cut))
    zc = scan_output_rows(_cents_slice(z, c_lo, c_hi))
    assert zu < 0.6 * total, f"user-dim not pruned: {zu}/{total}"
    assert zc < 0.6 * total, f"cents-dim not pruned: {zc}/{total}"


def test_single_column_sort_serves_only_its_own(spark, zlayouts):
    base, e, u_cut, c_lo, c_hi = zlayouts
    total = e.count()
    s = spark.read.parquet(base + "/single")
    su = scan_output_rows(_user_slice(s, u_cut))
    sc = scan_output_rows(_cents_slice(s, c_lo, c_hi))
    assert su < 0.6 * total, "sorted column should prune"
    # the unsorted dimension spans every file → no skipping at all
    assert sc == total, (sc, total)
    # and the z layout must beat single-column on that dimension
    zc = scan_output_rows(_cents_slice(spark.read.parquet(base + "/z"), c_lo, c_hi))
    assert zc < sc


def test_zorder_layout_loses_no_rows(spark, zlayouts):
    base, e, *_ = zlayouts
    z = spark.read.parquet(base + "/z")
    assert z.count() == e.count()
    a = sorted(r.event_id for r in e.select("event_id").collect())
    b = sorted(r.event_id for r in z.select("event_id").collect())
    assert a == b
