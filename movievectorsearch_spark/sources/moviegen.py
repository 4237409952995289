"""Synthetic movie-record source via the Python DataSource API (Spark 4).

The reference's ingestion loop *generates* its input (LLM call per
record — movie_generator.py:240-327) and feeds it to parse→dedup→
enrich→upsert. In Spark the generator IS a source: this module
registers ``moviegen`` as a first-class pluggable data source
(``spark.dataSource.register``), so the generation stage plugs into the
engine as ``spark.read.format("moviegen")`` / ``spark.readStream`` —
partition-parallel, filter-pushdown-capable, and (in the stream form)
checkpoint/resumable with rate limiting, the idiomatic upgrade of the
curator's checkpoint/sleep loop (movie_generator.py:106-180, 527;
SURVEY.md §2.10 ST1/ST3).

Records derive from the row ordinal through a pure int64 LCG chain
(A·x+C mod 2³¹ — same family as functions/hashing.minhash_coeffs), so:

- every partition generates independently (no coordination, no driver
  data) — the property that makes a generator source scale to any
  partition count;
- the stream and the batch read produce byte-identical rows;
- a DuckDB oracle reproduces the whole table from ``range(N)``
  (moviegen_source_agg hash-checks it end-to-end).

Titles collide on purpose (s1 mod TITLE_MOD) — the downstream dedup
operators need duplicate-bearing input.
"""

from __future__ import annotations

import json
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)

A = 1_103_515_245
C = 12_345
M = 1 << 31
TITLE_MOD = 10_000
GENRES = [
    "drama", "comedy", "thriller", "scifi", "horror",
    "romance", "action", "documentary", "noir", "western",
]

_SCHEMA = (
    "gen_id bigint, title string, year int, director string, "
    "cast array<string>, genres array<string>, plot string"
)


def _lcg(x: int) -> int:
    return (x * A + C) % M


def gen_row(gen_id: int) -> tuple:
    """The record for ordinal ``gen_id`` — pure arithmetic, mirrored
    verbatim by the DuckDB oracle SQL (plans/queries.py)."""
    s1 = _lcg(gen_id)
    s2 = _lcg(s1)
    s3 = _lcg(s2)
    tnum = s1 % TITLE_MOD
    title = f"movie {tnum}"
    year = 1900 + s1 % 130
    director = f"dir_{s2 % 200}"
    cast = [f"actor_{(s2 + i) % 500}" for i in range(s1 % 4 + 3)]
    genres = [GENRES[(s3 + j) % 10] for j in range(s3 % 3 + 1)]
    plot = f"plot of movie {tnum} in genre {genres[0]}"
    return (gen_id, title, year, director, cast, genres, plot)


class _RangePartition(InputPartition):
    def __init__(self, lo: int, hi: int):
        self.lo, self.hi = lo, hi


class MovieGenReader(DataSourceReader):
    """Batch reader: N row-range partitions, gen_id filter pushdown."""

    def __init__(self, options):
        self.count = int(options.get("count", 1000))
        self.num_partitions = int(options.get("numPartitions", 8))
        self.lo, self.hi = 0, self.count

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        # Handle gen_id range predicates by narrowing [lo, hi) — the
        # generator never materializes pruned ordinals (the source-level
        # analog of parquet row-group pruning). Everything else is
        # returned for Spark to evaluate post-scan.
        for f in filters:
            col = getattr(f, "attribute", None)
            if col == ("gen_id",) and isinstance(
                f, (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)
            ) and isinstance(f.value, int):
                if isinstance(f, EqualTo):
                    self.lo = max(self.lo, f.value)
                    self.hi = min(self.hi, f.value + 1)
                elif isinstance(f, GreaterThan):
                    self.lo = max(self.lo, f.value + 1)
                elif isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, f.value)
                elif isinstance(f, LessThan):
                    self.hi = min(self.hi, f.value)
                else:
                    self.hi = min(self.hi, f.value + 1)
            else:
                yield f

    def partitions(self) -> Sequence[InputPartition]:
        lo, hi = self.lo, max(self.lo, self.hi)
        n = max(1, self.num_partitions)
        step = max(1, -(-(hi - lo) // n)) if hi > lo else 1
        parts = [
            _RangePartition(s, min(s + step, hi)) for s in range(lo, hi, step)
        ]
        return parts or [_RangePartition(0, 0)]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for gen_id in range(partition.lo, partition.hi):
            yield gen_row(gen_id)


class MovieGenStreamReader(SimpleDataSourceStreamReader):
    """Micro-batched stream over the same ordinal space: offsets are row
    indexes, ``rowsPerBatch`` is the per-batch admission limit (ST3),
    and the offset log in the stream checkpoint gives exactly-once
    resume (ST1) — no pickle files, no SIGINT handlers. The simple
    reader contract (read(start) → rows + next offset) makes the rate
    limit and restart semantics correct by construction; deterministic
    regeneration makes ``readBetweenOffsets`` replay exact. Generation
    parallelism is the batch reader's job — a rate-limited stream is
    driver-paced by definition."""

    def __init__(self, options):
        self.count = int(options.get("count", 1000))
        self.rows_per_batch = int(options.get("rowsPerBatch", 100))

    def initialOffset(self) -> dict:
        return {"index": 0}

    def read(self, start: dict):
        lo = start["index"]
        hi = min(lo + self.rows_per_batch, self.count)
        if hi == lo:
            # drained: end == start, and Spark's prefetch cache probes
            # THIS value with next(it) to verify emptiness — it must be
            # an actual iterator, not a list (TypeError otherwise, which
            # kills the query on the first poll after the corpus
            # completes)
            return iter(()), {"index": hi}
        # a non-empty batch is cached as-is and iterated later, so a
        # plain (picklable) list is fine here
        return [gen_row(i) for i in range(lo, hi)], {"index": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # exact replay on recovery: same ordinals → same bytes. MUST be
        # an actual iterator: on a prefetch-cache miss the wrapper hands
        # this return value straight to the harness, which rejects lists
        # (DATA_SOURCE_INVALID_RETURN_TYPE) — the cache-hit path made a
        # list APPEAR to work, flaking only when replay was exercised.
        # (read()'s non-empty batch stays a list on purpose: getCache
        # re-serves entries via copy.copy, which is only safe for lists.)
        return iter([gen_row(i) for i in range(start["index"], end["index"])])

    def commit(self, end: dict) -> None:
        pass


class MovieGenDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "moviegen"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> MovieGenReader:
        return MovieGenReader(self.options)

    def simpleStreamReader(self, schema) -> MovieGenStreamReader:
        return MovieGenStreamReader(self.options)


def register(spark) -> None:
    """Idempotent session-level registration.

    Also flips ``spark.sql.python.filterPushdown.enabled`` on: Spark 4
    refuses to initialize any Python DataSource reader implementing
    ``pushFilters()`` (DATA_SOURCE_PUSHDOWN_DISABLED) while that conf is
    false — the default in sessions we don't build ourselves (e.g. the
    driver harness). Setting it HERE, at the single registration choke
    point, covers every read path (queries.py:_moviegen_df,
    pipeline/curator.generated, curate_stream, and any future caller);
    round 7's only driver red was a second entry point that lacked the
    guard and had only ever been green by session-ordering luck."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(MovieGenDataSource)


def moviegen_oracle_sql(count: int) -> str:
    """DuckDB SQL reproducing the full generated table from range() —
    the arithmetic mirror of :func:`gen_row`."""
    genres_sql = "[" + ", ".join(f"'{g}'" for g in GENRES) + "]"
    return f"""
SELECT gen_id,
       'movie ' || (s1 % {TITLE_MOD})::VARCHAR AS title,
       CAST(1900 + s1 % 130 AS INTEGER) AS year,
       'dir_' || (s2 % 200)::VARCHAR AS director,
       list_transform(range(0, s1 % 4 + 3),
                      i -> 'actor_' || ((s2 + i) % 500)::VARCHAR) AS "cast",
       list_transform(range(0, s3 % 3 + 1),
                      j -> ({genres_sql})[(s3 + j) % 10 + 1]) AS genres,
       'plot of movie ' || (s1 % {TITLE_MOD})::VARCHAR || ' in genre '
         || ({genres_sql})[s3 % 10 + 1] AS plot
FROM (
  SELECT gen_id, s1, (s1 * {A} + {C}) % {M} AS s2,
         (((s1 * {A} + {C}) % {M}) * {A} + {C}) % {M} AS s3
  FROM (
    SELECT t.range AS gen_id, (t.range * {A} + {C}) % {M} AS s1
    FROM range(0, {count}) t
  )
)
"""
