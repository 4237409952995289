"""Source/sink surface (S1-S6) + text-analysis operators."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from movievectorsearch_spark.catalog import load_table
from movievectorsearch_spark.operators.textanalysis import document_profile
from movievectorsearch_spark.sources import registry as R

PROFILE = {
    "_id": "sample_user",
    "reviews": [{"movie_title": "Heat", "rating": 5, "text": "great"}],
    "watched_movies": ["Heat", "Ronin"],
    "liked_movies": ["Heat"],
    "favorite_genres": ["thriller", "noir"],
}


def test_read_json_profile_and_point_lookup(spark, tmp_path):
    p = tmp_path / "sample_profile.json"
    p.write_text(json.dumps(PROFILE))
    profiles = R.read_json_profiles(spark, str(p))
    row = R.get_profile(profiles, "sample_user").collect()[0]
    assert row["_id"] == "sample_user"
    assert row["watched_movies"] == ["Heat", "Ronin"]
    assert row["reviews"][0]["rating"] == 5
    # miss → empty (reference returns None, search.py:72-74)
    assert R.get_profile(profiles, "nobody").count() == 0


def test_count_table(spark, sf_dir):
    df = load_table(spark, sf_dir, "orders")
    assert R.count_table(df) == df.count()
    n_f = R.count_table(df, F.col("o_orderstatus") == "F")
    assert 0 < n_f < df.count()


def test_write_parquet_partitioned(spark, sf_dir, tmp_path):
    df = load_table(spark, sf_dir, "documents").limit(100)
    out = str(tmp_path / "docs_by_lang")
    R.write_parquet(df, out, partition_by=["lang"])
    back = spark.read.parquet(out)
    assert back.count() == 100
    # partition pruning: reading one lang touches only that dir
    langs = [r["lang"] for r in df.select("lang").distinct().collect()]
    one = back.filter(F.col("lang") == langs[0])
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or one.count() > 0


def test_document_profile_columns(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(50)
    prof = document_profile(d).collect()
    assert len(prof) == 50
    for r in prof:
        assert r["n_tokens"] >= 0
        assert 0.0 <= r["quality"] <= 1.0
        assert r["fingerprint"] is not None
        assert r["lang_guess"] in {"en", "es", "de", "fr", "zh", "und"}


# ---------------------------------------------------------------------------
# text-lines source/sink (sources/textio.py)
# ---------------------------------------------------------------------------

def test_text_roundtrip_preserves_fields_and_folds_tabs(spark, tmp_path):
    from movievectorsearch_spark.sources.textio import (
        read_doc_lines,
        write_doc_lines,
    )

    rows = [
        (1, "en", "srcA", "plain text body"),
        (2, "de", "srcB", "tab\there and\tthere"),
        (3, "en", "srcA", "trailing"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, source string, text string")
    path = str(tmp_path / "docs")
    write_doc_lines(df, path)
    back = {r.doc_id: r for r in read_doc_lines(spark, path).collect()}
    assert back[1].text == "plain text body"
    assert back[2].text == "tab here and there"  # tabs folded to spaces
    assert back[2].lang == "de" and back[2].source == "srcB"
    assert len(back) == 3


def test_text_roundtrip_survives_newlines_and_nulls(spark, tmp_path):
    """Regression: newlines in ANY field must not split records; null
    key fields must not shift columns (concat_ws skips nulls)."""
    from movievectorsearch_spark.sources.textio import (
        read_doc_lines,
        write_doc_lines,
    )

    rows = [
        (1, "en", "web\nnews", "body one"),
        (2, None, "srcB", "line1\nline2"),
        (3, "de", None, "tab\tinside"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string"
    )
    path = str(tmp_path / "docs2")
    write_doc_lines(df, path)
    back = {r.doc_id: r for r in read_doc_lines(spark, path).collect()}
    assert len(back) == 3                       # no record splitting
    assert back[1].source == "web news"
    assert back[2].lang == "" and back[2].text == "line1 line2"
    assert back[3].source == "" and back[3].text == "tab inside"
