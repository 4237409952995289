"""The reference's whole curator lifecycle as one Spark dataflow.

movie_generator.py's loop (§3.2 of SURVEY.md) is: generate (LLM text)
→ parse → dedup vs the growing corpus → enrich/derive → embed → upsert,
checkpointed every 5 records. Here each stage is already built; this
module composes them end-to-end with the ``moviegen`` Python DataSource
standing in for the LLM (same role as the deterministic featurizer for
embeddings — SURVEY.md §7 Hard parts):

- :func:`render_movie_text` — the *inverse* of the parser: structured
  rows → the ``TITLE:/YEAR:/.../PLOT:`` text blob the reference's LLM
  emits (movie_generator.py:340-368), with markdown noise injected so
  the F1 cleaner has real work. Generation + rendering gives
  ground-truth-labeled parser input: parse(render(x)) is
  oracle-checkable against x (moviegen_curate_roundtrip).
- :func:`curate_batch` — generate → render → ingest_batch (parse,
  validate, exact+fuzzy dedup vs existing, derive, embed).
- :func:`curate_stream` — the same dataflow as a rate-limited stream
  with foreachBatch MERGE into a parquet corpus: per micro-batch the
  dedup reads the CURRENT corpus state (the reference's seen-set
  refresh, movie_generator.py:510-511) and the offset log replaces the
  pickle checkpoint (ST1-ST3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movievectorsearch_spark.operators.upsert import upsert_latest_wins
from movievectorsearch_spark.pipeline.ingest import ingest_batch


def render_movie_text(movies: DataFrame) -> DataFrame:
    """Structured movie rows → the reference's line-structured LLM
    response format, with deterministic markdown artifacts (``**``
    emphasis, ``NN. `` numbering) that the F1 cleaner must strip."""
    return movies.select(
        F.concat_ws(
            "\n",
            F.concat(F.lit("1. TITLE: **"), F.col("title"), F.lit("**")),
            F.concat(F.lit("YEAR: "), F.col("year").cast("string")),
            F.concat(F.lit("DIRECTOR: "), F.col("director")),
            F.concat(F.lit("CAST: "), F.array_join("cast", ", ")),
            F.concat(F.lit("GENRES: "), F.array_join("genres", ", ")),
            F.concat(F.lit("PLOT: "), F.col("plot")),
        ).alias("raw_text")
    )


def generated(spark: SparkSession, count: int, partitions: int = 8) -> DataFrame:
    from movievectorsearch_spark.sources import moviegen

    moviegen.register(spark)
    return (
        spark.read.format("moviegen")
        .option("count", count)
        .option("numPartitions", partitions)
        .load()
    )


def curate_batch(
    spark: SparkSession,
    count: int,
    existing: DataFrame,
    embed_dim: int = 64,
) -> DataFrame:
    """Generate ``count`` records and run the full curate dataflow
    against ``existing`` (title/year columns required). Returns new
    enriched+embedded rows ready for upsert."""
    raw = render_movie_text(generated(spark, count))
    return ingest_batch(raw, existing, embed_dim=embed_dim)


def curate_stream(
    spark: SparkSession,
    corpus_path: str,
    checkpoint: str,
    count: int = 500,
    rows_per_batch: int = 100,
    embed_dim: int = 64,
):
    """Streaming curator: rate-limited generation, per-micro-batch
    dedup against the *current* corpus, latest-wins upsert rewrite.
    Returns the StreamingQuery; the corpus parquet at ``corpus_path``
    is the reference's `films` collection."""
    import os

    from movievectorsearch_spark.sources import moviegen
    from movievectorsearch_spark.streaming.sink_upsert import (
        atomic_swap,
        recover_table,
    )

    moviegen.register(spark)
    stream = (
        spark.readStream.format("moviegen")
        .option("count", count)
        .option("rowsPerBatch", rows_per_batch)
        .load()
    )

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark_ = batch_df.sparkSession
        recover_table(corpus_path)
        if os.path.isdir(corpus_path):
            existing = spark_.read.parquet(corpus_path)
        else:
            existing = spark_.createDataFrame(
                [], "title string, year int, created_at timestamp"
            )
        fresh = ingest_batch(
            render_movie_text(batch_df), existing, embed_dim=embed_dim
        )
        if not os.path.isdir(corpus_path):
            fresh.write.mode("overwrite").parquet(corpus_path)
        else:
            merged = upsert_latest_wins(existing, fresh)
            # rename-aside swap: no instant where the only copy is gone
            atomic_swap(merged, corpus_path)

    return (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .start()
    )
