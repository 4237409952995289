"""The reference search read-path semantics (SURVEY.md §3.1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from movievectorsearch_spark.catalog import films_view
from movievectorsearch_spark.operators.search import (
    MAX_LIMIT,
    browse,
    clamp_limit,
    vector_search,
)
from movievectorsearch_spark.operators.subtopics import genre_groups, has_natural_split
from movievectorsearch_spark.plans.queries import QUERY_VEC


def test_clamp_limit():
    # reference search.py:16 — min(user_limit or 20, 100)
    assert clamp_limit(None) == 20
    assert clamp_limit(0) == 20
    assert clamp_limit(5) == 5
    assert clamp_limit(500) == MAX_LIMIT


def test_browse_filters_status_and_projects(spark, sf_dir):
    films = films_view(spark, sf_dir, register=False)
    rows = browse(films, limit=10).collect()
    assert len(rows) == 10
    for r in rows:
        assert r["processing_status"] in ("enriched", "llm_generated")
        assert r["director"] != "" or r["director"] == ""  # column exists
        assert r["similarity"] == 0.0  # coalesced default
    # skip advances the deterministic order
    page2 = browse(films, limit=10, skip=10).collect()
    assert [r["id"] for r in page2] != [r["id"] for r in rows]


def test_vector_search_ranked_then_unranked(spark, sf_dir):
    films = films_view(spark, sf_dir, register=False)
    rows = vector_search(films, QUERY_VEC, limit=50).collect()
    assert len(rows) == 50
    sims = [r["similarity"] for r in rows]
    # scored block is sorted desc; the coalesce maps unscored → 0.0 at
    # the projection, but scored rows always precede unscored ones
    scored = [s for s in sims if s != 0.0]
    assert scored == sorted(scored, reverse=True)


def test_vector_search_director_coalesce(spark, sf_dir):
    films = films_view(spark, sf_dir, register=False)
    rows = vector_search(films, QUERY_VEC, limit=100).collect()
    # every row resolves a director through the coalesce chain
    # (director, directors[0], '') — reference search.py:51
    assert all(r["director"] is not None for r in rows)
    assert any(r["director"].startswith("dir_") for r in rows)


def test_genre_groups_semantics(spark):
    movies = spark.createDataFrame(
        [
            ("A", ["drama", "action"]),
            ("B", ["drama"]),
            ("C", ["drama", "comedy"]),
            ("D", ["action"]),
            ("E", ["noir"]),  # singleton → dropped by HAVING n>=2
        ],
        "title STRING, genres ARRAY<STRING>",
    )
    groups = genre_groups(movies, min_groups=2, max_groups=3)
    rows = groups.collect()
    assert [r["subtheme"] for r in rows] == ["drama films", "action films"]
    assert rows[0]["movies"] == ["A", "B", "C"]
    assert rows[0]["n"] == 3
    assert abs(rows[0]["confidence"] - 3 / 5) < 1e-12
    assert has_natural_split(groups, 2) is True
