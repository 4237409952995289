"""Streaming incremental dedup against a persisted signature store.

The streaming twin of ``incremental_dedup_store`` (plans/queries.py):
documents arrive as a stream; each micro-batch computes MinHash
signatures for ONLY the arriving docs, probes the parquet signature
store with the cross-table LSH band join
(operators/dedup.py:minhash_lsh_pairs_between), appends the surviving
(novel) docs to the output, and appends signatures to the store — so
later batches dedup against everything seen so far, including earlier
stream batches.

Why foreachBatch and not a stateful operator: the dedup state here is
the signature TABLE (kilobytes per doc, unbounded horizon, shared with
batch jobs), which belongs in storage, not in per-query streaming state
— the watermark-bounded/stateful variants for in-flight horizons live
in streaming/events.py and streaming/stateful.py. Replay behavior is
governed entirely by the append ORDER (Restart note below).

Store coverage: the store receives signatures for every STORE-novel doc
— including docs suppressed by the within-batch self-probe. LSH band
collision is not transitive, so a later doc can collide with the
suppressed duplicate's signature without colliding with the kept one;
storing both keeps recall. Only the doc OUTPUT applies the within-batch
keep-smallest rule.

Scale shape per batch: signature build scans only the batch; the probe
is an equi-join of (batch bands) against (store bands) — never a scan
of historical text. Store growth is one small parquet file per batch;
compaction is sources/maintenance.py's job.

Restart note: signatures append BEFORE docs. A replayed batch's docs
collide with their own stored signatures and are dropped, so the output
never contains duplicates; a crash exactly between the two appends
loses that batch's doc emission (at-most-once for the crash window —
the store keeps the signature, the doc never lands). Duplicated
signatures from replays are harmless: the store probe is a DISTINCT
band join. True exactly-once across the crash window needs a
transactional table format (Delta/Iceberg) for the pair of appends;
with plain parquet, no-duplicates is the invariant this module
guarantees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movievectorsearch_spark.operators.dedup import (
    minhash_lsh_pairs,
    minhash_lsh_pairs_between,
    minhash_signature,
)

__all__ = ["start_incremental_dedup"]


def _store_exists(spark: SparkSession, path: str) -> bool:
    try:
        spark.read.parquet(path).schema
        return True
    except Exception:
        return False


def start_incremental_dedup(
    spark: SparkSession,
    docs_stream: DataFrame,
    store_path: str,
    out_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
):
    """Start the stream. ``docs_stream`` must carry (id_col, text_col).
    Returns the StreamingQuery; novel docs land in ``out_path``."""

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        sess = batch.sparkSession
        sig = minhash_signature(batch, id_col, text_col, num_hashes, shingle_n)
        sig.persist()  # consumed by the store probe, self-probe, and append
        try:
            if _store_exists(sess, store_path):
                store_sig = sess.read.parquet(store_path)
                hits = minhash_lsh_pairs_between(
                    sig, store_sig, id_col, num_hashes, bands
                ).select(F.col("new_id").alias(id_col)).distinct()
                store_novel = sig.select(id_col).join(hits, id_col, "left_anti")
            else:
                store_novel = sig.select(id_col)
            # WITHIN-batch dedup for the OUTPUT only: two dups arriving
            # in the same micro-batch both miss the store (their
            # signatures aren't appended yet) — a band self-probe keeps
            # the smallest id of each match group. Signatures still
            # append for BOTH (see Store coverage in the module doc).
            within = minhash_lsh_pairs(sig, id_col, num_hashes, bands).select(
                F.col("b_id").alias(id_col)
            ).distinct()
            emit_ids = store_novel.join(within, id_col, "left_anti")
            # EAGER materialization, not lazy persist: both id sets are
            # derived from an anti-join against the store READ, and the
            # second write below re-executes any lazy plan — after the
            # signature append, a lazy re-read would see the batch's own
            # just-appended signatures and drop every novel doc as a
            # "duplicate" of itself. localCheckpoint truncates the
            # lineage so the writes consume the pre-append snapshot.
            store_novel = store_novel.localCheckpoint(eager=True)
            emit_ids = emit_ids.localCheckpoint(eager=True)
            novel_sig = sig.join(store_novel, id_col)
            novel_docs = batch.join(emit_ids, id_col)
            # ORDER MATTERS for the replay guard: signatures append
            # FIRST. A crash between the two appends leaves the
            # signature committed but the doc unemitted; on replay the
            # doc collides with its own stored signature and is dropped
            # — at-most-once for that crash window, never duplicated.
            # (Doc-first would make the same window at-least-once: doc
            # emitted, signature missing, replay re-emits.)
            novel_sig.write.mode("append").parquet(store_path)
            novel_docs.write.mode("append").parquet(out_path)
        finally:
            sig.unpersist()

    return (
        docs_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
