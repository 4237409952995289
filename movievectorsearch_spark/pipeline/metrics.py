"""Job metrics: the reference's driver-side telemetry re-expressed as
Spark accumulators.

A5 (success-rate stats, movie_generator.py:518/539/749) and A6 (running
LLM token-cost sums, movie_generator.py:319-321, 415-417, 443-444)
accumulate per-record Python counters. Here the counters are
``LongAccumulator``s updated inside the Arrow-batched stages, so they
aggregate across executors for free and read on the driver after each
action. Streaming jobs surface the same numbers via
``StreamingQueryListener`` (progress events) instead.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

# reference cost model (movie_generator.py:319-320, 443):
# gpt-4o-mini $0.15/1M input + $0.60/1M output; $0.10/1M embedding tokens
COST_PER_M_INPUT = 0.15
COST_PER_M_OUTPUT = 0.60
COST_PER_M_EMBED = 0.10


class TokenCostTracker:
    """Accumulator-backed token/cost accounting for external-model
    stages (the engine's A6)."""

    def __init__(self, spark: SparkSession):
        sc = spark.sparkContext
        self.input_tokens = sc.accumulator(0)
        self.output_tokens = sc.accumulator(0)
        self.embed_tokens = sc.accumulator(0)
        self.records_ok = sc.accumulator(0)
        self.records_failed = sc.accumulator(0)

    @property
    def total_cost(self) -> float:
        return (
            self.input_tokens.value / 1e6 * COST_PER_M_INPUT
            + self.output_tokens.value / 1e6 * COST_PER_M_OUTPUT
            + self.embed_tokens.value / 1e6 * COST_PER_M_EMBED
        )

    @property
    def success_rate(self) -> float:
        """A5: completed / attempted (movie_generator.py:518)."""
        done = self.records_ok.value
        total = done + self.records_failed.value
        return done / total if total else 0.0


def embed_with_accounting(
    docs: DataFrame,
    tracker: TokenCostTracker,
    text_col: str = "text",
    out_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """The accounted embedding stage: deterministic featurizer standing
    in for the model call, with token counts flowing through
    accumulators exactly where a real client would report usage."""
    import pandas as pd
    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    # build a NEW StructType — StructType.add mutates in place, and
    # df.schema hands back the DataFrame's cached schema object
    schema = StructType(
        list(docs.schema.fields) + [StructField(out_col, ArrayType(DoubleType()))]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib

        for pdf in batches:
            pdf = pdf.copy()
            embs = []
            for text in pdf[text_col]:
                toks = (text or "").split()
                tracker.embed_tokens.add(len(toks))
                tracker.records_ok.add(1)
                h = hashlib.sha256((text or "").encode()).digest()
                vec = [
                    int.from_bytes(h[(i * 2) % 30 : (i * 2) % 30 + 2], "big")
                    / 65535.0
                    - 0.5
                    for i in range(dim)
                ]
                embs.append(vec)
            pdf[out_col] = embs
            yield pdf

    return docs.mapInPandas(run, schema)


def observed_qc_row(docs: DataFrame):
    """Single-pass QC metrics via ``Dataset.observe`` — the third leg
    of the telemetry tier next to accumulators (TokenCostTracker) and
    StreamingQueryListener: named aggregate expressions are evaluated
    INSIDE the running job (no second scan of the corpus), then read
    on the driver after the action completes. At 100 TB this is how an
    ingest writes its output AND its datasheet row in one pass.

    Returns ``(observed_df, finish)``: run any full action on
    ``observed_df`` (write, count), then call ``finish()`` for a
    one-row DataFrame of the exact-integer metrics — creating it from
    the observed dict is driver-side but bounded (one row).
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation("qc")
    observed = docs.observe(
        obs,
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
        F.sum(
            F.when(F.length(F.trim("text")) == 0, 1).otherwise(0)
        ).cast("bigint").alias("n_empty"),
        # DISTINCT aggregates are rejected in observed metrics
        # (INVALID_OBSERVED_METRICS) — stick to plain folds
        F.max("n_chars").cast("bigint").alias("max_chars"),
    )

    def finish():
        got = obs.get
        spark = docs.sparkSession
        return spark.createDataFrame(
            [
                (
                    int(got["n_docs"]),
                    int(got["sum_chars"]),
                    int(got["n_empty"]),
                    int(got["max_chars"]),
                )
            ],
            "n_docs bigint, sum_chars bigint, n_empty bigint, max_chars bigint",
        )

    return observed, finish
