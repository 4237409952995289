"""Sort-clustered layout (sources/layout.py): range filters must
actually skip row groups — asserted with scan metrics, not plan text."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from movievectorsearch_spark.catalog import load_table
from movievectorsearch_spark.sources.layout import (
    scan_output_rows,
    write_sort_clustered,
)


@pytest.fixture(scope="module")
def layouts(spark, sf_dir, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("layout"))
    e = load_table(spark, sf_dir, "events")
    write_sort_clustered(e, base + "/clustered", "value")
    e.repartition(8).write.mode("overwrite").parquet(base + "/unclustered")
    return base, e.count()


def _range_filter(df):
    return df.filter((F.col("value") >= 100) & (F.col("value") < 110))


def test_clustered_range_scan_skips_row_groups(spark, layouts):
    base, total = layouts
    clustered = scan_output_rows(_range_filter(spark.read.parquet(base + "/clustered")))
    unclustered = scan_output_rows(
        _range_filter(spark.read.parquet(base + "/unclustered"))
    )
    # random layout: every row group spans the full value range → no skip
    assert unclustered == total
    # clustered layout: only row groups overlapping [100, 110) are read
    assert clustered < total / 2, (clustered, total)


def test_clustered_layout_loses_no_rows(spark, layouts):
    base, total = layouts
    assert spark.read.parquet(base + "/clustered").count() == total


def test_clustered_files_have_disjoint_ranges(spark, layouts):
    """Each output file owns a narrow value range (the reason skipping
    works): per-file [min, max] spans must not all cover the global
    range."""
    base, _ = layouts
    per_file = (
        spark.read.parquet(base + "/clustered")
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    )
    assert len(per_file) > 1
    spans = sorted((r["lo"], r["hi"]) for r in per_file)
    # consecutive files overlap at most at the boundary value
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2 or abs(hi1 - lo2) < 1e-9, (hi1, lo2)
