"""Ingestion dataflow: parse → validate → dedup → derive → embed →
upsert (reference curator loop, movie_generator.py:182-238)."""

from __future__ import annotations

from pyspark.sql import functions as F

from movievectorsearch_spark.pipeline.featurizer import embed_documents, hash_embed
from movievectorsearch_spark.pipeline.ingest import (
    dedup_against,
    derive_columns,
    ingest_batch,
    parse_movie_text,
)
from movievectorsearch_spark.operators.upsert import upsert_latest_wins

RAW_OK = """TITLE: **The Matrix**
YEAR: released 1999
DIRECTOR: The Wachowskis
CAST: Keanu Reeves, Carrie-Anne Moss, , Laurence Fishburne
GENRES: scifi, action
PLOT: A hacker discovers reality is a simulation."""

RAW_BAD_YEAR = """TITLE: Mystery Film
YEAR: ancient times
DIRECTOR: Nobody
CAST: A, B
GENRES: drama
PLOT: No year anywhere."""

RAW_NO_TITLE = """TITLE:
YEAR: 2001
DIRECTOR: X
CAST: Y
GENRES: Z
PLOT: Title missing, row must be rejected."""


def test_parse_movie_text(spark):
    raw = spark.createDataFrame(
        [(RAW_OK,), (RAW_BAD_YEAR,), (RAW_NO_TITLE,)], "raw_text STRING"
    )
    rows = {r["title"]: r for r in parse_movie_text(raw).collect()}
    assert set(rows) == {"The Matrix", "Mystery Film"}  # empty title rejected
    m = rows["The Matrix"]
    assert m["year"] == 1999
    assert m["cast"] == ["Keanu Reeves", "Carrie-Anne Moss", "Laurence Fishburne"]
    assert m["genres"] == ["scifi", "action"]
    assert rows["Mystery Film"]["year"] == 2000  # patched (P6)


def test_derive_columns(spark):
    raw = spark.createDataFrame([(RAW_OK,)], "raw_text STRING")
    row = derive_columns(parse_movie_text(raw)).collect()[0]
    assert row["id"] == "the_matrix_1999"
    assert row["description"] == row["plot"]
    assert row["structured_enrichment"]["themes"] == ["scifi", "action"]
    assert row["processing_status"] == "enriched"


def test_dedup_against(spark):
    cands = spark.createDataFrame(
        [
            ("The Matrix", 1999),   # exact dup (case-insensitive)
            ("The Matrrix", 1999),  # fuzzy dup (ratio > 0.85, same year)
            ("Solaris", 1972),      # fresh
        ],
        "title STRING, year INT",
    )
    existing = spark.createDataFrame(
        [("the matrix", 1999)], "title STRING, year INT"
    )
    out = [r["title"] for r in dedup_against(cands, existing).collect()]
    assert out == ["Solaris"]


def test_ingest_batch_end_to_end(spark):
    raw = spark.createDataFrame([(RAW_OK,), (RAW_BAD_YEAR,)], "raw_text STRING")
    existing = spark.createDataFrame(
        [("the matrix", 1999)], "title STRING, year INT"
    )
    out = ingest_batch(raw, existing).collect()
    assert [r["title"] for r in out] == ["Mystery Film"]
    emb = out[0]["embedding"]
    assert len(emb) == 64
    assert abs(sum(x * x for x in emb) - 1.0) < 1e-9  # unit norm


def test_hash_embed_deterministic(spark, sf_dir):
    from movievectorsearch_spark.catalog import load_table

    d = load_table(spark, sf_dir, "documents").limit(20)
    e1 = {r["doc_id"]: r["embedding"] for r in embed_documents(d).select("doc_id", "embedding").collect()}
    e2 = {r["doc_id"]: r["embedding"] for r in embed_documents(d).select("doc_id", "embedding").collect()}
    assert e1 == e2
    dims = {len(v) for v in e1.values()}
    assert dims == {64}


def test_upsert_latest_wins(spark):
    base = spark.createDataFrame(
        [("A", 2000, "old", "2024-01-01 00:00:00"), ("B", 2001, "keep", "2024-01-01 00:00:00")],
        "title STRING, year INT, director STRING, created_at STRING",
    ).withColumn("created_at", F.col("created_at").cast("timestamp"))
    incoming = spark.createDataFrame(
        [("a", 2000, "new", "2024-01-02 00:00:00"), ("C", 2002, "ins", "2024-01-02 00:00:00")],
        "title STRING, year INT, director STRING, created_at STRING",
    ).withColumn("created_at", F.col("created_at").cast("timestamp"))
    out = {r["title"].lower(): r["director"] for r in upsert_latest_wins(base, incoming).collect()}
    assert out == {"a": "new", "b": "keep", "c": "ins"}


def test_upsert_equal_timestamp_prefers_incoming(spark):
    ts = "2024-01-01 00:00:00"
    base = spark.createDataFrame(
        [("A", 2000, "old", ts)], "title STRING, year INT, director STRING, created_at STRING"
    ).withColumn("created_at", F.col("created_at").cast("timestamp"))
    incoming = spark.createDataFrame(
        [("A", 2000, "new", ts)], "title STRING, year INT, director STRING, created_at STRING"
    ).withColumn("created_at", F.col("created_at").cast("timestamp"))
    out = upsert_latest_wins(base, incoming).collect()
    assert len(out) == 1 and out[0]["director"] == "new"


def test_hash_embed_arrow_bit_equal(spark, sf_dir):
    """The Arrow-batched featurizer twin must be BIT-equal to the
    pure-Column fold over the whole fixture corpus (plus edge rows),
    or it cannot stand in at the model boundary."""
    from pyspark.sql import functions as F

    from movievectorsearch_spark.catalog import load_table
    from movievectorsearch_spark.pipeline.featurizer import (
        hash_embed,
        hash_embed_arrow,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    edge = spark.createDataFrame(
        [
            (-1, ""),
            (-2, "   "),
            (-3, "\tOne\ntwo  THREE\n"),
            (-4, None),
            # non-ASCII parity (round-7 advisor): NBSP and U+2028 are
            # whitespace to Python \s but NOT to Java \s (must stay
            # inside the token); astral chars must hash as one code
            # point; trim must strip only ' '
            (-5, "café touch nbsp and ls"),
            (-6, "emoji \U0001F600mid tok\U0001F680en"),
            (-9, "İstanbul STRASSE ß ǅungla"),
            (-10, " \ttab-not-trimmed\n "),
            (-7, " leading-nbsp kept "),
            (-8, "combining i̇ mark ǅungla"),
        ],
        "doc_id INT, text STRING",
    )
    both = (
        d.unionByName(edge.withColumn("doc_id", F.col("doc_id").cast("long")))
        .withColumn("col_emb", hash_embed(F.col("text")))
        .withColumn("arrow_emb", hash_embed_arrow(F.col("text")))
        .collect()
    )
    for r in both:
        assert r.col_emb == r.arrow_emb, r.doc_id
