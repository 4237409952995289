"""Table maintenance (sources/maintenance.py): compaction rewrites to
fewer files without changing data; schema-evolution reads/unions null
absent columns instead of failing or position-matching."""

from __future__ import annotations

from pyspark.sql import functions as F

from movievectorsearch_spark.catalog import load_table
from movievectorsearch_spark.sources import maintenance as M


def test_compact_preserves_data_and_reduces_files(spark, sf_dir, tmp_path):
    path = str(tmp_path / "frag")
    e = load_table(spark, sf_dir, "events").limit(500).cache()
    # fragment: many tiny files
    e.repartition(20).write.mode("overwrite").parquet(path)
    assert M.parquet_file_count(path) >= 20

    checksum = lambda df: (
        df.agg(
            F.count("*").alias("n"),
            F.sum(F.crc32(F.col("event_id").cast("string"))).alias("c"),
        ).collect()[0]
    )
    before_sum = checksum(spark.read.parquet(path))
    nb, na = M.compact_table(spark, path, target_mb=256)
    assert nb >= 20 and na == 1  # 500 rows ≪ 256 MB → one file
    after_sum = checksum(spark.read.parquet(path))
    assert (before_sum["n"], before_sum["c"]) == (after_sum["n"], after_sum["c"])


def test_schema_evolution_read_and_union(spark, tmp_path):
    path = str(tmp_path / "evolve")
    v1 = spark.createDataFrame([(1, "a")], "id INT, name STRING")
    v2 = spark.createDataFrame([(2, "b", 9.5)], "id INT, name STRING, score DOUBLE")
    v1.write.mode("overwrite").parquet(path)
    v2.write.mode("append").parquet(path)

    merged = M.read_evolved(spark, path)
    assert set(merged.columns) == {"id", "name", "score"}
    by_id = {r["id"]: r["score"] for r in merged.collect()}
    assert by_id[1] is None and by_id[2] == 9.5

    u = M.union_evolving([v1, v2.select("score", "id", "name")])  # reordered cols
    got = {r["id"]: (r["name"], r["score"]) for r in u.collect()}
    assert got == {1: ("a", None), 2: ("b", 9.5)}
