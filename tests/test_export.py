"""Training-shard export (operators/export.py): contiguous-id layout,
size bounds, manifest integrity."""

from __future__ import annotations

from pyspark.sql import functions as F

from mysql2clickhouse_spark.operators.export import curated_docs, export_shards
from mysql2clickhouse_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_export_shards_layout_and_manifest(spark, tmp_path):
    d = load_table(spark, SF, "documents").select("doc_id", "text")
    curated = curated_docs(d)
    n_kept = curated.count()
    manifest = export_shards(spark, curated, str(tmp_path / "out"), rows_per_file=17)
    rows = sorted(manifest.collect(), key=lambda r: r["min_id"])
    assert sum(r["n_rows"] for r in rows) == n_kept
    assert all(r["n_rows"] <= 17 for r in rows)
    assert len(rows) >= n_kept // 17
    # contiguous non-overlapping id ranges
    for a, b in zip(rows, rows[1:]):
        assert a["max_id"] < b["min_id"]
    # manifest digests match the data
    data = spark.read.parquet(str(tmp_path / "out" / "data"))
    redo = {
        r["shard"]: r["m"]
        for r in data.select(F.input_file_name().alias("shard"), "doc_id")
        .groupBy("shard")
        .agg(
            F.md5(F.concat_ws(",", F.sort_array(F.collect_list("doc_id")))).alias("m")
        )
        .collect()
    }
    assert all(redo[r["shard"]] == r["ids_md5"] for r in rows)


def test_curated_docs_gate_and_dedup(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again ok"),
            (2, "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG AGAIN AND AGAIN OK"),
            (3, "short"),
        ],
        "doc_id bigint, text string",
    )
    out = curated_docs(docs).collect()
    # case-insensitive exact dup keeps the min id; the short doc is gated out
    assert [r["doc_id"] for r in out] == [1]


def test_export_shards_jsonl_layout_roundtrip(spark, tmp_path):
    """gzip JSON-Lines export: same contiguous non-overlapping layout
    and digest-certified manifest as parquet, files really are
    .json.gz, and the schema-pinned read-back round-trips every column
    exactly (ids, text, token counts, rounded scores)."""
    import os

    from mysql2clickhouse_spark.operators.export import export_shards_jsonl

    d = load_table(spark, SF, "documents").select("doc_id", "text")
    curated = curated_docs(d)
    n_kept = curated.count()
    out = str(tmp_path / "out")
    manifest = export_shards_jsonl(spark, curated, out, rows_per_file=17)
    rows = sorted(manifest.collect(), key=lambda r: r["min_id"])
    assert sum(r["n_rows"] for r in rows) == n_kept
    assert all(r["n_rows"] <= 17 for r in rows)
    for a, b in zip(rows, rows[1:]):
        assert a["max_id"] < b["min_id"]
    shards = [f for f in os.listdir(out + "/data") if f.endswith(".json.gz")]
    assert len(shards) == len(rows)

    back = spark.read.schema(curated.schema).json(out + "/data")
    assert back.schema == curated.schema
    # exact round-trip: bag equality on every column
    assert back.exceptAll(curated).isEmpty()
    assert curated.exceptAll(back).isEmpty()


def test_export_shards_tar_layout_members_and_manifest(spark, tmp_path):
    """WebDataset-style tar export: contiguous non-overlapping id
    ranges, HARD rows_per_file bound (partitions roll to new tars),
    per-doc .txt/.json member pairs, digest-certified manifest, and a
    parse-level read-back that round-trips ids, token counts, and text
    bytes."""
    import hashlib
    import io
    import json
    import os
    import tarfile

    from mysql2clickhouse_spark.operators.export import (
        export_shards_tar,
        tar_member_rows,
    )

    d = load_table(spark, SF, "documents").select("doc_id", "text")
    curated = curated_docs(d)
    n_kept = curated.count()
    out = str(tmp_path / "out")
    manifest = export_shards_tar(spark, curated, out, rows_per_file=17)
    rows = sorted(manifest.collect(), key=lambda r: r["min_id"])
    assert sum(r["n_rows"] for r in rows) == n_kept
    assert all(r["n_rows"] <= 17 for r in rows)        # hard bound
    for a, b in zip(rows, rows[1:]):                   # contiguous layout
        assert a["max_id"] < b["min_id"]

    # files really are tars named by their first doc id
    files = sorted(os.listdir(os.path.join(out, "data")))
    assert files == sorted(r["shard"] for r in rows)
    assert all(f.startswith("shard-") and f.endswith(".tar") for f in files)
    assert not any(f.endswith(".__tmp") for f in files)

    # member-level inspection of one tar: txt+json pairs, id-sorted,
    # reproducible headers (mtime/uid pinned)
    first = rows[0]
    with tarfile.open(os.path.join(out, "data", first["shard"])) as tf:
        members = tf.getmembers()
        names = [m.name for m in members]
        keys = sorted({n.rsplit(".", 1)[0] for n in names})
        assert len(names) == 2 * first["n_rows"]
        assert keys == sorted(keys)
        assert all(m.mtime == 0 and m.uid == 0 for m in members)
        meta = json.loads(tf.extractfile(keys[0] + ".json").read())
        assert meta["n_tokens"] > 0 and "quality_score" in meta

    # parse-level read-back certifies the manifest (what a trainer
    # would extract, not what the writer claims)
    parsed = tar_member_rows(spark, os.path.join(out, "data"))
    redo = {
        r["shard"]: (r["n"], r["t"], r["m"])
        for r in parsed.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_tokens").alias("t"),
            F.md5(F.concat_ws(",", F.sort_array(F.collect_list("doc_id")))).alias("m"),
        )
        .collect()
    }
    for r in rows:
        assert redo[r["shard"]] == (r["n_rows"], r["n_tokens"], r["ids_md5"])

    # text bytes round-trip: parsed member md5 == md5 of the curated text
    joined = (
        parsed.join(curated.select("doc_id", "text"), "doc_id")
        .withColumn("want", F.md5(F.col("text")))
        .filter(F.col("text_md5") != F.col("want"))
    )
    assert joined.count() == 0


def test_export_shards_tar_rewrite_is_idempotent(spark, tmp_path):
    """Re-running the export over the same input produces byte-identical
    tars (mtime pinned, temp-name + os.replace promote) — the property
    that makes task retries and speculative duplicates safe."""
    import hashlib
    import os

    from mysql2clickhouse_spark.operators.export import export_shards_tar

    d = load_table(spark, SF, "documents").select("doc_id", "text")
    curated = curated_docs(d)
    out = str(tmp_path / "out")

    def digest_all():
        dd = os.path.join(out, "data")
        return {
            f: hashlib.md5(open(os.path.join(dd, f), "rb").read()).hexdigest()
            for f in os.listdir(dd)
        }

    export_shards_tar(spark, curated, out, rows_per_file=17)
    first = digest_all()
    export_shards_tar(spark, curated, out, rows_per_file=17)
    assert digest_all() == first


def test_export_shards_tar_binary_payloads(spark, tmp_path):
    """Multimodal form: payload_col writes raw BINARY members named by
    the per-row modality extension; bytes round-trip exactly through
    the tar and the json member carries the metadata."""
    import io
    import json
    import os
    import tarfile

    from mysql2clickhouse_spark.operators.export import export_shards_tar

    rows = [
        (1, "image", bytes([0xFF, 0xD8, 0x00, 0x42]), 4),
        (2, "audio", b"RIFF....WAVE", 12),
        (3, "image", b"", 0),  # empty payload must survive
    ]
    media = spark.createDataFrame(
        rows, "doc_id bigint, modality string, content binary, n_tokens bigint"
    )
    out = str(tmp_path / "out")
    manifest = export_shards_tar(
        spark, media, out, rows_per_file=10,
        payload_col="content", ext_col="modality",
    )
    rows_m = manifest.collect()
    assert sum(r["n_rows"] for r in rows_m) == 3
    shard = rows_m[0]["shard"]
    with tarfile.open(os.path.join(out, "data", shard)) as tf:
        names = sorted(m.name for m in tf.getmembers())
        assert names == [
            "000000000001.image", "000000000001.json",
            "000000000002.audio", "000000000002.json",
            "000000000003.image", "000000000003.json",
        ]
        assert tf.extractfile("000000000001.image").read() == bytes(
            [0xFF, 0xD8, 0x00, 0x42]
        )
        assert tf.extractfile("000000000003.image").read() == b""
        meta = json.loads(tf.extractfile("000000000002.json").read())
        assert meta["modality"] == "audio" and meta["n_tokens"] == 12


def test_export_shards_tar_unicode_byte_exact(spark, tmp_path):
    """Byte-exactness across the utf-8 edge cases a real corpus hits:
    multibyte scripts, emoji, newlines, tabs, long runs — every .txt
    member must hold exactly the utf-8 encoding of the source text."""
    import os
    import tarfile

    from mysql2clickhouse_spark.operators.export import export_shards_tar

    texts = [
        "plain ascii",
        "héllo wörld — ünïcode",
        "日本語のテキストです",
        "emoji 🙂🚀 and \t tabs\nand newlines\n",
        "mixed Ω≈ç√∫˜µ≤≥÷ " * 50,
    ]
    rows = [(i, t, len(t.split())) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, n_tokens bigint")
    out = str(tmp_path / "out")
    export_shards_tar(spark, df, out, rows_per_file=100)
    shard = os.listdir(os.path.join(out, "data"))[0]
    with tarfile.open(os.path.join(out, "data", shard)) as tf:
        for i, t in enumerate(texts):
            got = tf.extractfile(f"{i:012d}.txt").read()
            assert got == t.encode("utf-8"), i
