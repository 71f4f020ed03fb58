"""Training-shard export — the TERMINAL stage of the curation pipeline:
gate → dedup → write right-sized shards + a manifest a downstream
trainer can consume incrementally and verify.

A 100 TB curation job does not end at a DataFrame; it ends at a
directory of size-bounded files plus a manifest (per-shard row counts,
token totals, id ranges, content digests) that lets the training side
(a) schedule shards independently, (b) resume partially-consumed
epochs, and (c) detect truncated/corrupted shards without re-reading
the corpus. This module provides that layout on plain parquet:

- shards are ``repartitionByRange(doc_id)`` + sorted, so each file
  covers a CONTIGUOUS id range (manifest ranges are non-overlapping —
  a reader can binary-search its slice) and parquet min/max stats stay
  tight;
- ``maxRecordsPerFile`` bounds shard size from above; the range
  partition count bounds file count from below (same O9 discipline as
  the runner's ``compact_small_files``);
- the manifest is derived by ONE read-back scan of the written files
  (``input_file_name()`` groupBy) — counts, token sums, id ranges, and
  an order-insensitive id digest per shard;
- everything reuses the gate/dedup semantics of ``corpus_curation``
  (plans/extensions.py), so the kept-set is oracle-checkable.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import langid_col, quality_score_cols


def curated_docs(
    docs: DataFrame,
    min_tokens: int = 8,
    min_quality: float = 0.3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gate + exact-dedup (keep min id per content hash), KEEPING the
    text — the exportable curated set. Same semantics as
    ``corpus_curation`` (one scan, gate before the only shuffle)."""
    q = quality_score_cols(F.col(text_col))
    feat = docs.select(
        id_col,
        text_col,
        F.md5(F.lower(F.col(text_col))).alias("content_hash"),
        q["n_tokens"].alias("n_tokens"),
        q["quality_score"].alias("quality_score"),
        langid_col(F.col(text_col)).alias("lang_guess"),
    ).filter(
        (F.col("n_tokens") >= min_tokens) & (F.col("quality_score") >= min_quality)
    )
    kept = feat.groupBy("content_hash").agg(
        F.min_by(
            F.struct(id_col, text_col, "n_tokens", "quality_score", "lang_guess"),
            F.col(id_col),
        ).alias("__row")
    )
    return kept.select(
        F.col(f"__row.{id_col}").alias(id_col),
        F.col(f"__row.{text_col}").alias(text_col),
        "content_hash",
        F.col("__row.n_tokens").alias("n_tokens"),
        F.col("__row.quality_score").alias("quality_score"),
        F.col("__row.lang_guess").alias("lang_guess"),
    )


def manifest_over(data: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-shard manifest derived from ONE read-back scan of written
    files: counts, token sums, id ranges, and an order-insensitive id
    digest keyed by ``input_file_name()`` — format-agnostic (any source
    Spark can read back gets the same certification)."""
    return (
        data.select(
            F.input_file_name().alias("shard"),
            F.col(id_col),
            F.col("n_tokens"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.min(id_col).alias("min_id"),
            F.max(id_col).alias("max_id"),
            F.md5(
                F.concat_ws(",", F.sort_array(F.collect_list(F.col(id_col))))
            ).alias("ids_md5"),
        )
    )


def _export(
    spark: SparkSession,
    curated: DataFrame,
    out_dir: str,
    rows_per_file: int,
    id_col: str,
    fmt: str,
) -> DataFrame:
    """Shared write path: contiguous-id shards + read-back-derived
    manifest; ``fmt`` picks parquet or gzip JSON-Lines."""
    import math

    n = curated.count()
    nfiles = max(1, math.ceil(n / rows_per_file))
    data_dir = os.path.join(out_dir, "data")
    writer = (
        curated.repartitionByRange(nfiles, id_col)
        .sortWithinPartitions(id_col)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", rows_per_file)
    )
    if fmt == "jsonl":
        writer.option("compression", "gzip").json(data_dir)
        # read back with the WRITER's schema: JSON carries no types, and
        # an inferred schema could silently widen/reorder columns
        data = spark.read.schema(curated.schema).json(data_dir)
    else:
        writer.parquet(data_dir)
        data = spark.read.parquet(data_dir)
    manifest = manifest_over(data, id_col)
    manifest.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "manifest")
    )
    return spark.read.parquet(os.path.join(out_dir, "manifest"))


def export_shards(
    spark: SparkSession,
    curated: DataFrame,
    out_dir: str,
    rows_per_file: int = 500_000,
    id_col: str = "doc_id",
) -> DataFrame:
    """Write ``curated`` as contiguous-id parquet shards under
    ``out_dir/data`` and a per-shard manifest under ``out_dir/manifest``.
    Returns the manifest DataFrame (shard, n_rows, n_tokens, min_id,
    max_id, ids_md5).

    The shard count derives from an upper row bound carried by ONE
    count of the curated frame (bounded work — the frame is the gated
    output, already smaller than the corpus); file sizes are enforced
    by ``maxRecordsPerFile`` regardless."""
    return _export(spark, curated, out_dir, rows_per_file, id_col, "parquet")


def export_shards_jsonl(
    spark: SparkSession,
    curated: DataFrame,
    out_dir: str,
    rows_per_file: int = 500_000,
    id_col: str = "doc_id",
) -> DataFrame:
    """Same contiguous-id shard layout + certified manifest, written as
    gzip-compressed JSON-Lines — the wire format most LLM training
    stacks ingest directly (one JSON object per line, one ``.json.gz``
    per shard; a WebDataset-style consumer tars the shard directory
    as-is). Same manifest schema as the parquet path, so the trainer's
    resume/verify logic is format-agnostic.

    Scale note: gzip is NOT splittable — one shard = one read task —
    which is exactly why the layout bounds rows per file; size
    ``rows_per_file`` so a shard decompresses in one worker's memory."""
    return _export(spark, curated, out_dir, rows_per_file, id_col, "jsonl")


def export_shards_tar(
    spark: SparkSession,
    curated: DataFrame,
    out_dir: str,
    rows_per_file: int = 500_000,
    id_col: str = "doc_id",
    text_col: str = "text",
    payload_col: str | None = None,
    ext_col: str | None = None,
) -> DataFrame:
    """WebDataset-style tar shards — the layout multimodal/LLM training
    loaders (webdataset, torchdata) stream directly: one ``.tar`` per
    shard, per document a payload member plus a ``{id}.json`` member
    (typed metadata incl. ``n_tokens``), members id-sorted inside each
    tar so a sequential reader sees the same contiguous-id discipline
    as the parquet layout.

    Payload member: ``{id}.txt`` holding the utf-8 text by default;
    pass ``payload_col`` (a BINARY column — image/audio/video bytes)
    to write raw media members instead, with the member extension
    taken per-row from ``ext_col`` (e.g. the ``modality`` column) —
    the multimodal shape webdataset was built for. Metadata columns
    (everything that is not the id or the payload) ride in the json
    member either way.

    Spark-side shape: ``repartitionByRange(id)`` + sort, then ONE
    ``mapInPandas`` pass per partition streams Arrow batches into the
    tar(s) and emits the per-shard manifest rows — write and manifest
    derivation are the same single pass (the parquet path needs a
    read-back scan because the parquet writer owns the files; here the
    UDF does, so it counts/digests as it writes). A partition rolls to
    a new tar at ``rows_per_file`` so the size bound is HARD, not
    best-effort. Tars are written temp-name + ``os.replace`` (task
    retries and speculative duplicates are idempotent: same sorted
    input ⇒ same bytes, mtime/uid pinned to 0 for reproducibility).
    Certification (``corpus_export_tar``) re-reads the tars via
    Spark's binaryFile source and proves the manifest against the
    parsed members.

    Sink contract: ``out_dir`` must be a directory path every executor
    can write (local/NFS here; on HDFS/S3 mount or fuse — the tar
    bytes themselves are location-agnostic). The manifest digest is
    the same ``md5(sorted ids joined by ',')`` the parquet manifest
    uses, so trainer-side verify logic stays format-agnostic."""
    import math

    n = curated.count()
    nfiles = max(1, math.ceil(n / rows_per_file))
    data_dir = os.path.join(out_dir, "data")
    os.makedirs(data_dir, exist_ok=True)
    body_col = payload_col or text_col
    meta_cols = [c for c in curated.columns if c not in (id_col, body_col)]
    manifest_schema = (
        "shard string, n_rows bigint, n_tokens bigint,"
        " min_id bigint, max_id bigint, ids_md5 string"
    )

    def write_tars(batches):
        import hashlib
        import json as _json
        import tarfile

        import pandas as pd

        state = {"tar": None, "tmp": None, "path": None, "name": None}
        ids: list[int] = []
        ntok = 0

        def _add(tar, name, payload: bytes) -> None:
            info = tarfile.TarInfo(name)
            info.size = len(payload)
            info.mtime = 0  # reproducible bytes across retries
            info.uid = info.gid = 0
            info.uname = info.gname = ""
            import io as _io

            tar.addfile(info, _io.BytesIO(payload))

        def _close_current():
            nonlocal ids, ntok
            state["tar"].close()
            os.replace(state["tmp"], state["path"])  # atomic promote
            digest = hashlib.md5(
                ",".join(str(i) for i in sorted(ids)).encode()
            ).hexdigest()
            row = pd.DataFrame(
                [
                    {
                        "shard": state["name"],
                        "n_rows": len(ids),
                        "n_tokens": ntok,
                        "min_id": min(ids),
                        "max_id": max(ids),
                        "ids_md5": digest,
                    }
                ]
            )
            state["tar"] = None
            ids, ntok = [], 0
            return row

        for pdf in batches:
            for rec in pdf.to_dict("records"):
                if state["tar"] is None:
                    doc_id = int(rec[id_col])
                    state["name"] = f"shard-{doc_id:012d}.tar"
                    state["path"] = os.path.join(data_dir, state["name"])
                    state["tmp"] = state["path"] + ".__tmp"
                    state["tar"] = tarfile.open(state["tmp"], "w")
                doc_id = int(rec[id_col])
                key = f"{doc_id:012d}"
                if payload_col is not None:
                    body = bytes(rec[payload_col] or b"")
                    ext = str(rec[ext_col]) if ext_col else "bin"
                else:
                    body = str(rec[text_col]).encode("utf-8")
                    ext = "txt"
                _add(state["tar"], f"{key}.{ext}", body)
                meta = {c: rec[c] for c in meta_cols}
                meta["n_tokens"] = int(rec["n_tokens"])
                _add(
                    state["tar"],
                    key + ".json",
                    _json.dumps(meta, sort_keys=True, default=str).encode("utf-8"),
                )
                ids.append(doc_id)
                ntok += int(rec["n_tokens"])
                if len(ids) >= rows_per_file:
                    yield _close_current()
        if state["tar"] is not None:
            yield _close_current()

    manifest = (
        curated.repartitionByRange(nfiles, id_col)
        .sortWithinPartitions(id_col)
        .mapInPandas(write_tars, manifest_schema)
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "manifest")
    )
    return spark.read.parquet(os.path.join(out_dir, "manifest"))


def tar_member_rows(spark: SparkSession, data_dir: str) -> DataFrame:
    """Read-back side of the tar certification: parse every written
    ``.tar`` via Spark's binaryFile source into one row per document
    member — (shard, doc_id, n_tokens, text_md5) — so the manifest can
    be recomputed from what a trainer would actually read. The payload
    member is whichever sibling of the ``.json`` metadata member shares
    its key (``.txt`` for text exports, the per-row extension for
    binary/multimodal ones); ``text_md5`` digests its raw bytes either
    way. One task per shard (a tar is one object; the export bounds its
    size), parsing in Arrow batches, no driver-side loop."""
    bins = spark.read.format("binaryFile").load(os.path.join(data_dir, "*.tar"))

    def parse(batches):
        import hashlib
        import io as _io
        import json as _json
        import tarfile

        import pandas as pd

        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                shard = str(path).rsplit("/", 1)[-1]
                with tarfile.open(fileobj=_io.BytesIO(bytes(content))) as tf:
                    texts: dict[str, str] = {}
                    metas: dict[str, dict] = {}
                    for m in tf.getmembers():
                        key, _, kind = m.name.rpartition(".")
                        data = tf.extractfile(m).read()
                        if kind == "json":
                            metas[key] = _json.loads(data)
                        else:  # the payload member (.txt or media ext)
                            texts[key] = hashlib.md5(data).hexdigest()
                    for key, meta in metas.items():
                        out.append(
                            {
                                "shard": shard,
                                "doc_id": int(key),
                                "n_tokens": int(meta["n_tokens"]),
                                "text_md5": texts.get(key, ""),
                            }
                        )
            if out:
                yield pd.DataFrame(out)

    return bins.select("path", "content").mapInPandas(
        parse, "shard string, doc_id bigint, n_tokens bigint, text_md5 string"
    )
