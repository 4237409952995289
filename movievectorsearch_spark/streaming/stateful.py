"""Custom stateful streaming operator: incremental fuzzy dedup with
``applyInPandasWithState``.

This is the streaming form of the reference curator's in-memory
seen-set + fuzzy check (ST2, movie_generator.py:199-212): each
micro-batch's candidate titles are compared against per-group state
(every title previously accepted in that group), exact-then-fuzzy, and
only novel titles are emitted and added to state.

Scale design: state is keyed by the SAME blocking key the batch dedup
uses (the year band — here the generic ``block_col``), so each state
partition holds only its block's titles and the shuffle is one
hash-partition by block. The reference's global Python set (unbounded,
single-process) becomes partitioned, checkpointed state.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("block", LongType()),
        StructField("title_key", StringType()),
        StructField("first_seen_batch", IntegerType()),
    ]
)

STATE_SCHEMA = StructType([StructField("seen", ArrayType(StringType()))])


def _lev_ratio(a: str, b: str) -> float:
    """Pure-Python Levenshtein ratio (same definition as
    operators.dedup.levenshtein_ratio)."""
    if not a and not b:
        return 1.0
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return 1.0 - prev[-1] / max(len(a), len(b))


def make_dedup_fn(threshold: float = 0.85):
    """Builds the per-group stateful function. Emits only titles that
    are neither exactly nor fuzzily present in group state."""
    import pandas as pd

    def dedup_titles(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        seen: list[str] = list(state.get[0]) if state.exists else []
        seen_set = set(seen)
        out_keys: list[str] = []
        batch_ids: list[int] = []
        for pdf in pdfs:
            for tkey, batch_id in zip(pdf["title_key"], pdf["batch_id"]):
                if tkey in seen_set:
                    continue
                if any(_lev_ratio(tkey, s) >= threshold for s in seen):
                    continue
                seen.append(tkey)
                seen_set.add(tkey)
                out_keys.append(tkey)
                batch_ids.append(int(batch_id))
        state.update((seen,))
        yield pd.DataFrame(
            {
                "block": [key[0]] * len(out_keys),
                "title_key": out_keys,
                "first_seen_batch": batch_ids,
            }
        )

    return dedup_titles


def stateful_fuzzy_dedup(
    candidates: DataFrame,
    block_col: str = "block",
    threshold: float = 0.85,
) -> DataFrame:
    """candidates(block, title_key, batch_id) → novel titles only.
    Streaming-only (applyInPandasWithState rejects batch queries);
    state persists across micro-batches via the checkpoint. Batch
    callers use operators.dedup instead."""
    return candidates.groupBy(block_col).applyInPandasWithState(
        make_dedup_fn(threshold),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
