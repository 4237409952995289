"""transformWithStateInPandas running totals (streaming/tws.py):
cross-batch accumulation, checkpoint-restart persistence, and the
final-state == batch-twin contract."""

from __future__ import annotations

import importlib.util

import pytest
from pyspark.sql import functions as F

from movievectorsearch_spark.streaming.tws import (
    ROCKSDB_PROVIDER,
    running_user_totals,
)

# transformWithState's JVM<->Python state channel is protobuf-encoded;
# without the protobuf package the driver worker cannot start
def _has_protobuf() -> bool:
    try:
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        return False


pytestmark = pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithStateInPandas requires the protobuf package",
)

_SCHEMA = "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE"
_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"


@pytest.fixture()
def tws_run(spark, tmp_path):
    """Append parquet batches, run the stream availableNow (one file
    per trigger), return all emitted update rows with batch ids."""
    old = spark.conf.get(_PROVIDER_KEY, None)
    spark.conf.set(_PROVIDER_KEY, ROCKSDB_PROVIDER)

    def run(batches):
        src = tmp_path / "src"
        for rows in batches:
            spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode(
                "append"
            ).parquet(str(src))
        stream = (
            spark.readStream.schema(_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        out = running_user_totals(stream)
        sink = str(tmp_path / "out")

        def write_batch(df, batch_id):
            # file sinks reject update mode; land each micro-batch's
            # update rows via foreachBatch instead
            df.write.mode("append").parquet(sink)

        q = (
            out.writeStream.outputMode("update")
            .foreachBatch(write_batch)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return spark.read.parquet(sink).collect()

    yield run
    if old is None:
        spark.conf.unset(_PROVIDER_KEY)
    else:
        spark.conf.set(_PROVIDER_KEY, old)


def _finals(rows):
    """Highest (total, n) per user — running totals are monotone, so
    the max IS the last emission."""
    out = {}
    for r in rows:
        cur = out.get(r.user_id)
        if cur is None or (r.total_cents, r.n_purchases) > cur:
            out[r.user_id] = (r.total_cents, r.n_purchases)
    return out


def test_totals_accumulate_across_batches(spark, tws_run):
    b1 = [(1, 10, "purchase", 5.25), (2, 10, "click", 99.0), (3, 11, "purchase", 2.00)]
    b2 = [(4, 10, "purchase", 1.75), (5, 12, "purchase", 10.00)]
    rows = tws_run([b1, b2])
    assert _finals(rows) == {10: (700, 2), 11: (200, 1), 12: (1000, 1)}
    # user 10 emitted once per touching batch: 525 then 700
    u10 = sorted(r.total_cents for r in rows if r.user_id == 10)
    assert u10 == [525, 700]


def test_state_survives_checkpoint_restart(spark, tws_run, tmp_path):
    rows = tws_run([[(1, 20, "purchase", 3.00)]])
    assert _finals(rows)[20] == (300, 1)
    # second invocation appends a new batch and REUSES the checkpoint:
    # only the new file is processed, against restored state
    rows = tws_run([[(1, 20, "purchase", 3.00)], [(2, 20, "purchase", 4.50)]])
    assert _finals(rows)[20] == (750, 2)


def test_final_state_matches_batch_twin(spark, tws_run, sf_dir):
    from movievectorsearch_spark.catalog import load_table

    e = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type", "value")
        .limit(400)
    )
    rows = [tuple(r) for r in e.collect()]
    third = max(1, len(rows) // 3)
    emitted = tws_run([rows[:third], rows[third : 2 * third], rows[2 * third :]])
    twin = {
        r.user_id: (r.c, r.n)
        for r in spark.createDataFrame(rows, _SCHEMA)
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("c"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    assert _finals(emitted) == twin
