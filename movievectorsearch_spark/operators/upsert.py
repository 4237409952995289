"""Upsert / MERGE emulation — reference ``store_movie``
(movie_generator.py:452-467): ``update_one({title, year}, $set,
upsert=True)``, i.e. latest-wins per natural key.

Without Delta Lake in this container the same semantics are a
union + per-key latest-wins window (SURVEY.md §2.1 S7). The window
tiebreak is (created_at DESC, is_new DESC) so equal timestamps resolve
deterministically toward the incoming batch — MongoDB's $set would
likewise overwrite.

At scale this is the standard copy-on-write MERGE: one shuffle on the
key; with the base table bucketed by (title_key, year) the shuffle
drops to the (small) incoming side only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from movievectorsearch_spark.functions.text import normalize_key


def upsert_latest_wins(
    base: DataFrame,
    incoming: DataFrame,
    title_col: str = "title",
    year_col: str = "year",
    ts_col: str = "created_at",
) -> DataFrame:
    """Return base MERGE incoming on (lower(trim(title)), year)."""
    tagged_base = base.withColumn("__is_new", F.lit(0))
    tagged_new = incoming.withColumn("__is_new", F.lit(1))
    unioned = tagged_base.unionByName(tagged_new, allowMissingColumns=True)
    key = [normalize_key(F.col(title_col)), F.col(year_col)]
    w = Window.partitionBy(*key).orderBy(F.desc(ts_col), F.desc("__is_new"))
    return (
        unioned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__is_new")
    )
