"""Genre sub-grouping — ``POST /api/analyze-subtopics`` (reference
routes.py:103-139, operator A4 in SURVEY.md §2.4).

explode(genres) → groupBy(genre) → collect member titles + count →
HAVING count ≥ 2 → ORDER BY count DESC → LIMIT max_groups →
confidence = n/total. The reference's Python-dict iteration order is
replaced by an explicit total order (count desc, genre asc) so results
are deterministic (SURVEY.md §7 Hard parts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def genre_groups(
    movies: DataFrame,
    min_groups: int = 2,
    max_groups: int = 3,
    genres_col: str = "genres",
    title_col: str = "title",
) -> DataFrame:
    """Returns (subtheme, movies, n, confidence) rows, largest first."""
    total = movies.count()
    exploded = movies.select(
        F.col(title_col).alias("title"), F.explode(genres_col).alias("genre")
    )
    groups = (
        exploded.groupBy("genre")
        .agg(
            F.sort_array(F.collect_list("title")).alias("movies"),
            F.count("*").alias("n"),
        )
        .filter(F.col("n") >= 2)  # routes.py:128
        .orderBy(F.desc("n"), F.asc("genre"))
        .limit(max_groups)  # routes.py:126-127
        .select(
            F.concat(F.col("genre"), F.lit(" films")).alias("subtheme"),
            "movies",
            "n",
            (F.col("n") / F.lit(float(total))).alias("confidence"),
        )
    )
    return groups


def has_natural_split(groups: DataFrame, min_groups: int = 2) -> bool:
    """routes.py:137 — enough groups to split?"""
    return groups.count() >= min_groups
