"""Python DataSource API tests (sources/moviegen.py): partition
parallelism, filter pushdown that actually prunes generation, stream
rate limiting, and checkpoint resume with no reprocessing.
"""

from __future__ import annotations

import time

import pytest

from movievectorsearch_spark.sources import moviegen
from movievectorsearch_spark.sources.moviegen import (
    GreaterThanOrEqual,
    LessThan,
    MovieGenReader,
    gen_row,
)


@pytest.fixture()
def mg(spark):
    moviegen.register(spark)
    return spark


def test_batch_read_matches_generator(mg):
    df = (
        mg.read.format("moviegen")
        .option("count", 120)
        .option("numPartitions", 5)
        .load()
    )
    rows = df.orderBy("gen_id").collect()
    assert len(rows) == 120
    for r in rows[:25]:
        gid, title, year, director, cast, genres, plot = gen_row(r.gen_id)
        assert (r.title, r.year, r.director, r["cast"], r.genres, r.plot) == (
            title, year, director, cast, genres, plot
        )
    # partition-parallel: 5 requested splits
    assert df.rdd.getNumPartitions() == 5


def test_push_filters_narrows_generated_ranges():
    # unit-level: the reader prunes ordinals BEFORE generation
    r = MovieGenReader({"count": "1000", "numPartitions": "4"})
    leftover = list(
        r.pushFilters(
            [GreaterThanOrEqual(("gen_id",), 600), LessThan(("gen_id",), 680)]
        )
    )
    assert leftover == []  # both handled by the source
    parts = r.partitions()
    covered = sorted((p.lo, p.hi) for p in parts)
    assert covered[0][0] == 600 and covered[-1][1] == 680
    total = sum(hi - lo for lo, hi in covered)
    assert total == 80  # only the filtered range is ever generated


def test_pushdown_results_correct_end_to_end(mg):
    df = (
        mg.read.format("moviegen")
        .option("count", 500)
        .load()
        .filter("gen_id >= 450 AND gen_id < 470")
    )
    got = sorted(r.gen_id for r in df.collect())
    assert got == list(range(450, 470))


def test_stream_rate_limit_and_drain(mg, tmp_path):
    q = (
        mg.readStream.format("moviegen")
        .option("count", 250)
        .option("rowsPerBatch", 100)
        .load()
        .writeStream.format("memory")
        .queryName("mg_drain")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        for _ in range(120):
            if mg.sql("SELECT count(*) c FROM mg_drain").first().c >= 250:
                break
            time.sleep(1)
    finally:
        q.stop()
    row = mg.sql(
        "SELECT count(*) c, count(DISTINCT gen_id) d FROM mg_drain"
    ).first()
    assert (row.c, row.d) == (250, 250)
    sizes = [int(p["numInputRows"]) for p in q.recentProgress if p["numInputRows"]]
    assert max(sizes) <= 100  # admission control held every batch


def test_stream_checkpoint_resume_no_reprocessing(mg, tmp_path):
    # a FILE sink: the memory sink refuses checkpoint recovery
    ck = str(tmp_path / "ck2")
    out = str(tmp_path / "out")

    def run(target):
        q = (
            mg.readStream.format("moviegen")
            .option("count", 300)
            .option("rowsPerBatch", 75)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .start()
        )
        try:
            # generous budget: the full suite saturates local[32], and a slow
            # micro-batch under load must not read as a correctness failure
            for _ in range(600):
                try:
                    if mg.read.parquet(out).count() >= target:
                        break
                except Exception:
                    pass  # sink dir not created yet
                time.sleep(0.5)
        finally:
            # stop() can raise a stop-timeout when the suite saturates
            # local[32]; the query still terminates — retry once and keep
            # a slow stop from reading as a correctness failure
            try:
                q.stop()
            except Exception:
                time.sleep(5)
                try:
                    q.stop()
                except Exception:
                    pass
            q.awaitTermination(60)
        return mg.read.parquet(out)

    got1 = run(150).count()  # stop mid-corpus
    assert got1 >= 150
    final = run(300)  # same checkpoint: resumes, completes the corpus
    rows = final.select("gen_id").collect()
    ids = sorted(r.gen_id for r in rows)
    # exactly-once across the restart: no gap, no duplicate
    assert ids == list(range(300))


def test_read_between_offsets_returns_iterator():
    """Replay-path contract: on a prefetch-cache miss the wrapper hands
    readBetweenOffsets' return value straight to the harness, which
    rejects lists — so this must be a real iterator (the cache-hit path
    masked a list return, flaking only when replay was exercised)."""
    from movievectorsearch_spark.sources.moviegen import MovieGenStreamReader

    r = MovieGenStreamReader({"count": "10", "rowsPerBatch": "4"})
    it = r.readBetweenOffsets({"index": 0}, {"index": 4})
    assert iter(it) is it and hasattr(it, "__next__")
    assert len(list(it)) == 4
    drained, off = r.read({"index": 10})
    assert iter(drained) is drained  # drained poll: also a real iterator
    assert off == {"index": 10}


def test_moviegen_reads_when_session_disables_filter_pushdown(spark):
    """Regression for CORRECTNESS_r05's only reds: the driver harness
    builds its own session with spark.sql.python.filterPushdown.enabled
    left false, and Spark 4 then refuses to initialize any Python
    DataSource reader that implements pushFilters()
    (DATA_SOURCE_PUSHDOWN_DISABLED). _moviegen_df must flip the conf on
    the session it is handed, not rely on our own session factory."""
    from movievectorsearch_spark.plans.queries import _moviegen_df

    key = "spark.sql.python.filterPushdown.enabled"
    prev = spark.conf.get(key)
    try:
        spark.conf.set(key, "false")  # simulate the driver's session
        df = _moviegen_df(spark)
        assert df.limit(5).count() == 5
        assert spark.conf.get(key) == "true"  # _moviegen_df enabled it
        # and the pushed-filter path itself works under the repaired conf
        spark.conf.set(key, "false")
        n = _moviegen_df(spark).filter("gen_id < 100").count()
        assert n == 100
    finally:
        spark.conf.set(key, prev)


def test_curate_roundtrip_first_in_pushdown_disabled_session(spark):
    """Regression for CORRECTNESS_r07's only red: pipeline/curator.py
    generated() was a SECOND moviegen entry point without the conf
    guard, so moviegen_curate_roundtrip failed whenever the driver's
    50-slot sample drew it WITHOUT its sibling queries (every earlier
    green was session-ordering luck). The guard now lives in
    moviegen.register() — the single choke point — so running the FULL
    roundtrip builder first-in-session with the conf false must work."""
    from movievectorsearch_spark.plans.queries import QUERIES

    key = "spark.sql.python.filterPushdown.enabled"
    prev = spark.conf.get(key)
    try:
        spark.conf.set(key, "false")  # simulate the driver's fresh session
        df = QUERIES["moviegen_curate_roundtrip"]["spark"](
            spark, "/root/testdata/sf0.001"
        )
        assert df.count() > 0
        assert spark.conf.get(key) == "true"  # register() enabled it
        # the other register() caller too: curator.generated directly
        spark.conf.set(key, "false")
        from movievectorsearch_spark.pipeline.curator import generated

        assert generated(spark, 32).count() == 32
    finally:
        spark.conf.set(key, prev)
