"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed with Arrow-batched ``mapInPandas``.

The decode step itself (image/audio libs) is STUBBED — this container
has no codecs — but everything Spark-side is real and tested: schema,
batch iteration, partition-preserving transform, deterministic fake
feature extraction so results are verifiable.

Real deployment swaps ``_decode_stub`` for PIL/ffmpeg calls; the Spark
plumbing (arrow batch shape, output schema, partitioning) is unchanged.
At 100 TB: ``mapInPandas`` streams Arrow batches per partition — memory
is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``; repartition
by a size-balanced key first when payloads are skewed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: output schema of the feature extractor
MEDIA_FEATURES_SCHEMA = (
    "doc_id bigint, modality string, byte_len bigint, frame_w bigint, frame_h bigint"
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Build the multimodal shape from a text table: payload =
    utf-8 bytes of the text (deterministic fake media), modality by
    doc_id. Real pipelines read payloads from object-store parquet."""
    return df.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, F.lit("image")).otherwise(F.lit("audio")).alias("modality"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
    )


def _decode_stub(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for an image/audio decoder.

    Would be ``PIL.Image.open(io.BytesIO(payload)).size`` in production;
    here: fake dimensions derived from the byte length so the driver can
    verify the plumbing end-to-end.
    """
    n = len(payload)
    return (n % 640, n % 480)


def extract_media_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``mapInPandas`` keeps partitioning intact (no shuffle) and transfers
    whole Arrow batches — the only sane way to run per-payload Python at
    scale (row-at-a-time UDFs would serialize every blob separately).
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = pdf["content"].map(_decode_stub)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "byte_len": pdf["content"].map(len).astype("int64"),
                    "frame_w": dims.map(lambda d: d[0]).astype("int64"),
                    "frame_h": dims.map(lambda d: d[1]).astype("int64"),
                }
            )

    return media.mapInPandas(extract, schema=MEDIA_FEATURES_SCHEMA)


RESIZED_SCHEMA = "doc_id bigint, modality string, content binary, out_w int, out_h int"


def _resize_stub(payload: bytes, w: int, h: int) -> bytes:
    """Deterministic stand-in for an image resize (would be
    ``PIL.Image.resize`` in production): truncate/cycle the bytes to the
    target 'pixel count' so output sizes are exact and verifiable."""
    target = w * h
    if not payload:
        return b"\x00" * target
    reps = target // len(payload) + 1
    return (payload * reps)[:target]


def resize_media(media: DataFrame, w: int = 64, h: int = 64) -> DataFrame:
    """Resize transform over the binary column — 1:1 Arrow-batched
    ``mapInPandas``; the payload column stays binary end-to-end (no
    base64 round-trips), and partitioning is preserved."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "content": pdf["content"].map(lambda p: _resize_stub(p, w, h)),
                    "out_w": w,
                    "out_h": h,
                }
            )

    return media.mapInPandas(resize, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = "doc_id bigint, frame_idx int, frame binary"
FRAME_BYTES = 256  # stub 'frame' size


def sample_frames(media: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame sampling (video-style 1→N fan-out) via ``mapInPandas``:
    each payload splits into fixed-size chunks ('frames'); every Nth is
    emitted as its own row. Demonstrates the expanding batch shape —
    the output iterator yields MORE rows than the input batch, which
    ``mapInPandas`` supports natively (unlike scalar pandas_udf).

    In production the chunker is an ffmpeg keyframe iterator; the Spark
    contract (schema, fan-out, bounded Arrow batches) is identical."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, blobs = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
                n_frames = max(1, len(payload) // FRAME_BYTES)
                for i in range(0, n_frames, every_n):
                    ids.append(doc_id)
                    idxs.append(i)
                    blobs.append(payload[i * FRAME_BYTES:(i + 1) * FRAME_BYTES])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": blobs})

    return media.mapInPandas(frames, schema=FRAMES_SCHEMA)
