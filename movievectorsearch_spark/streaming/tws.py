"""Arbitrary stateful streaming with ``transformWithStateInPandas``
(Spark 4's successor to ``applyInPandasWithState``).

The operator: per-user RUNNING SPEND TOTALS over the purchase stream —
the streaming analog of the curator's forever-growing per-key progress
state (ST1/ST2, movie_generator.py:106-180), done with typed,
checkpointed, TTL-capable state instead of a driver pickle.

Why this API over ``applyInPandasWithState`` for new operators:

- **Typed composable state** (ValueState / ListState / MapState per
  name) instead of one opaque tuple — each state var is schema'd and
  evolvable independently.
- **State TTL** (``ttlDurationMs``) — idle keys expire inside the state
  store instead of via hand-rolled timeout branches; at 100 TB of
  users this is what bounds the store.
- **Timers** (processing/event time) for scheduled emission, decoupled
  from data arrival.
- Requires the RocksDB state store provider — which is also the right
  provider at scale (incremental checkpoints, spill-to-disk state;
  the default HDFS-backed map keeps all state on-heap).

Determinism contract (test-enforced): after any sequence of
micro-batches, the LAST emitted row per user equals the plain batch
``groupBy(user).agg(sum, count)`` over everything ingested — batch
boundaries must not be observable in final state.

Runtime requirement: transformWithState's control plane speaks
protobuf between the JVM and the Python state server, so the
``protobuf`` package must be installed (tests/test_tws.py skips
cleanly where it isn't; the applyInPandasWithState operator in
streaming/stateful.py has no such dependency and remains the
exercised-everywhere stateful path).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

OUTPUT_SCHEMA = "user_id BIGINT, total_cents BIGINT, n_purchases BIGINT"
_STATE_SCHEMA = "total_cents BIGINT, n_purchases BIGINT"

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class RunningTotalsProcessor(StatefulProcessor):
    """Per-user running (cents, count) in a ValueState; emits the
    updated totals once per user per micro-batch that touches them."""

    def __init__(self, ttl_ms: int | None = None):
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", _STATE_SCHEMA, self._ttl_ms)

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        cents, n = (self._totals.get() or (0, 0)) if self._totals.exists() else (0, 0)
        for pdf in rows:
            # 2-decimal inputs: *100 lands within 1e-10 of an integer,
            # so round() here and Spark's HALF_UP agree
            cents += int(pdf["value"].mul(100).round().astype("int64").sum())
            n += len(pdf)
        self._totals.update((cents, n))
        yield pd.DataFrame(
            {"user_id": [key[0]], "total_cents": [cents], "n_purchases": [n]}
        )

    def close(self) -> None:
        pass


def running_user_totals(
    stream: DataFrame, ttl_ms: int | None = None
) -> DataFrame:
    """Purchase stream → per-user running totals (update mode).

    Callers must run the query with the RocksDB state store provider
    (``ROCKSDB_PROVIDER``) — transformWithState requires it, and it is
    the provider a 100 TB deployment wants anyway.
    """
    purchases = stream.filter(stream.event_type == "purchase").select(
        "user_id", "value"
    )
    return purchases.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
