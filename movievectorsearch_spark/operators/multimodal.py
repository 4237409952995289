"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

The reference has no media pipeline (its only binary-ish asset is the
poster URL string, routes.py:43); this module is the large-training-
data-pipeline tier: the schema, partitioning, UDF signatures and batch
shapes are real and tested, while the actual codec calls are stubbed
(the container ships no image/audio libs) behind ``decode_image`` /
``decode_audio`` raising ``NotImplementedError``, with a deterministic
fake (`fake_decode_meta`) driving tests and plans.

Scale design
------------
- media bytes travel ONCE per stage through Arrow record batches;
  metadata-only transformations never touch the blob column (column
  pruning keeps it out of the scan entirely — verified by ReadSchema).
- decode/resize/frame-sample are ``mapInPandas`` iterator UDFs: one
  Python worker per partition, one Arrow exchange per batch, never
  per-row pickling.
- ``spark.sql.files.maxPartitionBytes`` governs blob-scan split size;
  partition the table by media_type so type-specific stages prune.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # 'image' | 'audio' | 'video'
        StructField("content", BinaryType()),     # opaque encoded bytes
        StructField("mime", StringType()),
        StructField("width", IntegerType()),      # NULL for audio
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),   # NULL for image
    ]
)

META_FIELDS = [
    StructField("n_bytes", LongType()),
    StructField("sha256", StringType()),
]


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from documents: the text bytes
    stand in for encoded content (same trick the tests/oracle use)."""
    doc_id = F.col("doc_id")
    mtype = (
        F.when(doc_id % 3 == 0, "image")
        .when(doc_id % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        doc_id.alias("media_id"),
        mtype.alias("media_type"),
        F.encode("text", "utf-8").alias("content"),
        F.when(mtype == "image", "image/png")
        .when(mtype == "audio", "audio/wav")
        .otherwise("video/mp4")
        .alias("mime"),
        F.when(mtype != "audio", (doc_id % 640 + 64).cast("int")).alias("width"),
        F.when(mtype != "audio", (doc_id % 480 + 48).cast("int")).alias("height"),
        F.when(mtype != "image", (doc_id * 37 % 90_000).cast("bigint"))
        .alias("duration_ms"),
    )


def content_meta(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Metadata pass that never leaves the JVM: byte length + sha256.
    Pure expressions → runs at scan speed; the blob is read but never
    crosses into Python."""
    return df.withColumn("n_bytes", F.length(content_col).cast("bigint")).withColumn(
        "sha256", F.sha2(F.col(content_col), 256)
    )


# ---------------------------------------------------------------------------
# codec boundary — stubbed (no media libs in this container)
# ---------------------------------------------------------------------------

def decode_image(content: bytes) -> "object":
    """REAL decode hook (PIL/opencv slot in here). Stubbed: the
    container has no imaging libs."""
    raise NotImplementedError(
        "image decode requires an imaging library (PIL/opencv); "
        "this container ships none — use fake_decode_meta for tests"
    )


def decode_audio(content: bytes) -> "object":
    raise NotImplementedError(
        "audio decode requires an audio library (soundfile/librosa); "
        "this container ships none — use fake_decode_meta for tests"
    )


def fake_decode_meta(content: bytes) -> dict:
    """Deterministic stand-in for a decoder: derives pseudo decode
    metadata from the bytes themselves (stable across runs/engines)."""
    h = hashlib.sha256(content or b"").digest()
    return {
        "decoded_w": int.from_bytes(h[0:2], "big") % 1920 + 1,
        "decoded_h": int.from_bytes(h[2:4], "big") % 1080 + 1,
        "n_channels": h[4] % 4 + 1,
    }


DECODED_SCHEMA = "media_id BIGINT, decoded_w INT, decoded_h INT, n_channels INT"


def decode_batch(
    media: DataFrame,
    decoder=fake_decode_meta,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """The decode stage: Arrow-batched ``mapInPandas``. The real
    decoder drops in without touching the plan shape."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            metas = [decoder(c) for c in pdf[content_col]]
            out = pd.DataFrame(metas)
            out.insert(0, id_col, pdf[id_col].values)
            yield out

    return media.select(id_col, content_col).mapInPandas(run, DECODED_SCHEMA)


RESIZED_SCHEMA = "media_id BIGINT, out_w INT, out_h INT, content BINARY"


def resize_batch(
    media: DataFrame, max_side: int = 256, content_col: str = "content"
) -> DataFrame:
    """Resize stage plumbing: computes the target geometry JVM-side
    (aspect-preserving clamp to ``max_side``) and ships bytes through
    the stubbed recode (identity here; a real imaging lib slots into
    ``_recode``). Geometry math never needs Python."""
    import pandas as pd

    def _recode(content: bytes, w: int, h: int) -> bytes:
        # real impl: decode → resample(w, h) → re-encode
        return content

    scale = F.least(
        F.lit(1.0),
        F.lit(float(max_side)) / F.greatest(F.col("width"), F.col("height")),
    )
    with_target = media.filter(F.col("width").isNotNull()).select(
        "media_id",
        content_col,
        F.ceil(F.col("width") * scale).cast("int").alias("out_w"),
        F.ceil(F.col("height") * scale).cast("int").alias("out_h"),
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["content"] = [
                _recode(c, w, h)
                for c, w, h in zip(pdf[content_col], pdf["out_w"], pdf["out_h"])
            ]
            yield pdf[["media_id", "out_w", "out_h", "content"]]

    return with_target.mapInPandas(run, RESIZED_SCHEMA)


def frame_sample_plan(
    media: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Frame-sampling plumbing for video rows: expands each video into
    (media_id, frame_idx, ts_ms) rows with ``sequence``+``explode`` —
    pure JVM; the per-frame decode then joins this plan against the
    decode stage. At scale the explode is the fan-out point: repartition
    by media_id AFTER it so one video's frames don't pin one task."""
    vids = media.filter(
        (F.col("media_type") == "video") & F.col("duration_ms").isNotNull()
    )
    n_frames = (F.col("duration_ms") / every_ms).cast("bigint")
    return (
        vids.select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0).cast("bigint"), n_frames)
            ).alias("frame_idx"),
        )
        .withColumn("ts_ms", F.col("frame_idx") * every_ms)
    )


def embed_media(
    decoded: DataFrame, dim: int = 16, id_col: str = "media_id"
) -> DataFrame:
    """Deterministic pseudo-embedding from decode metadata (the slot a
    CLIP-style encoder occupies; Arrow-batched like decode_batch)."""
    import pandas as pd

    schema = f"{id_col} BIGINT, embedding ARRAY<DOUBLE>"

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            embs = []
            for _, r in pdf.iterrows():
                seed = (int(r["decoded_w"]) * 31 + int(r["decoded_h"])) * 31 + int(
                    r["n_channels"]
                )
                vec, state = [], seed
                for _ in range(dim):
                    state = (state * 1_103_515_245 + 12_345) % (1 << 31)
                    vec.append(state / float(1 << 31) - 0.5)
                embs.append(vec)
            yield pd.DataFrame({id_col: pdf[id_col].values, "embedding": embs})

    return decoded.mapInPandas(run, schema)
