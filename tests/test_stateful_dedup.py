"""applyInPandasWithState fuzzy dedup: state persists across
micro-batches, novel titles only, fuzzy matches suppressed."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from movievectorsearch_spark.streaming.stateful import (
    _lev_ratio,
    stateful_fuzzy_dedup,
)


def test_lev_ratio_model():
    assert _lev_ratio("the matrix", "the matrix") == 1.0
    assert _lev_ratio("", "") == 1.0
    assert _lev_ratio("abc", "xyz") == 0.0
    assert _lev_ratio("the matrix", "the matrrix") == pytest.approx(1 - 1 / 11)


@pytest.fixture()
def stream_run(spark, tmp_path):
    """Drive two micro-batches through the stateful operator (one
    parquet file per trigger via maxFilesPerTrigger) and return the
    emitted rows."""

    def run(batches: list[list[tuple]]):
        src = tmp_path / "src"
        for i, rows in enumerate(batches):
            spark.createDataFrame(
                [(b, t, i) for (b, t) in rows],
                "block BIGINT, title_key STRING, batch_id INT",
            ).coalesce(1).write.mode("append").parquet(str(src))
        stream = (
            spark.readStream.schema("block BIGINT, title_key STRING, batch_id INT")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        out = stateful_fuzzy_dedup(stream)
        q = (
            out.writeStream.outputMode("append")
            .format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return spark.read.parquet(str(tmp_path / "out")).collect()

    return run


def test_stateful_dedup_across_batches(stream_run):
    rows = stream_run(
        [
            # batch 0: originals + one in-batch fuzzy dup
            # ratio('the matrix','the matrrix') = 1 - 1/11 ≈ 0.909 ≥ 0.85
            [(2000, "the matrix"), (2000, "the matrrix"), (2001, "heat")],
            # batch 1: exact dup across batches, a fuzzy dup of the
            # batch-0 survivor (ratio('the matrix','the  matrix') via
            # 'thhe matrix' = 1 - 1/11), and one novel title
            [(2000, "the matrix"), (2000, "thhe matrix"), (2001, "ronin")],
        ]
    )
    got = {(r["block"], r["title_key"]): r["first_seen_batch"] for r in rows}
    assert set(got) == {
        (2000, "the matrix"),
        (2001, "heat"),
        (2001, "ronin"),
    }
    # cross-batch state: the novel title surfaced in the later batch
    assert got[(2001, "ronin")] == 1
    assert got[(2000, "the matrix")] == 0


def test_stateful_dedup_within_one_batch(stream_run):
    """In-batch dedup in a single micro-batch (applyInPandasWithState
    is streaming-only in Spark 4 — batch callers use the batch dedup
    operators instead)."""
    # ratio('alphabet','alphabett') = 1 - 1/9 ≈ 0.889 ≥ 0.85 → fuzzy dup
    rows = stream_run(
        [[(1, "alphabet"), (1, "alphabet"), (1, "alphabett"), (1, "omega")]]
    )
    assert {r["title_key"] for r in rows} == {"alphabet", "omega"}
