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
