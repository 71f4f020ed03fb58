"""Driver-checkable Structured Streaming queries (SURVEY §2.7).

Until this module, the streaming path was pytest-covered only — the
driver's oracle harness never executed a StreamingQuery. These two
entries run REAL streams (readStream → writeStream, availableNow) to a
parquet sink inside the query callable, then return the sink read-back,
so the value-hash compare certifies streaming semantics end-to-end:

- ``stream_latest_state``: the ``applyInPandasWithState`` stateful
  latest-row operator over a multi-batch changelog stream. The final
  state per key is the global argmax by ``seq`` REGARDLESS of how files
  land in micro-batches (update-mode re-emissions are folded by a
  read-back argmax) — which is what makes a custom stateful operator
  oracle-checkable in plain SQL.
- ``stream_windowed_counts``: watermarked tumbling-window counts
  (append mode). Append emission needs the watermark to pass a
  window's end, so a bounded run would withhold the tail windows; a
  sentinel "closer" event 4 h past the last real window boundary
  advances the final watermark beyond every real window, and
  availableNow's no-data
  micro-batch (the engine's end-of-stream eviction pass) flushes them.
  Every REAL window therefore finalizes and the result equals a plain
  per-hour GROUP BY — oracle-checkable.

Reference parity: the stream itself is the ``--stop-never`` binlog tail
(/root/reference/binlog2sql_util.py:125-126); the watermark contract is
the reference's "data older than now-2h is final" freshness promise
(doc_old_duplicates.md:179-185).

Scale notes: state size is one row per live key (not stream length);
the windowed agg shuffles once on (window, table); the changelog
staging write is sf-bounded here but on a cluster the stream reads the
real changelog directory — no per-query staging.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import REGISTRY
from ..session import scratch_dir
from ..sources.changelog import CHANGELOG_VIEW_SQL, changelog_from_events
from ..sources.tables import load_table
from .extensions import N_QUERIES as _ann_N_QUERIES
from .extensions import TOPK as _ann_TOPK
from ..streaming.windows import stateful_latest_state, windowed_event_counts

#: the registry's table→apply-mode mapping as a SQL CASE — built from
#: the SAME registry the stream-static join broadcasts, so the oracle
#: cannot drift from the engine's routing policy
_POLICY_CASE = " ".join(
    f"WHEN '{name}' THEN '{pol.apply_mode}'" for name, pol in REGISTRY.items()
)

CHANGELOG_DDL = (
    "op string, schema_name string, table_name string, key bigint, seq bigint,"
    " file_seq bigint, ts timestamp, value double, event_type string"
)

#: closer-event horizon past date_trunc('hour', max(ts)). Anchoring on
#: the window boundary (not raw max(ts)) makes the final watermark
#: strictly exceed the last real window's end by a full hour no matter
#: where max(ts) falls inside its hour: with max(ts) exactly on the
#: boundary, a raw max(ts)+3h closer gives watermark == window end and
#: append mode's strict eviction would withhold that window — a
#: data-dependent oracle flake. Must exceed watermark delay + window.
CLOSER_HOURS = 4
WATERMARK = "2 hours"
WINDOW = "1 hour"


def _stage_changelog(spark: SparkSession, sf_dir: str, n_files: int, closer: bool) -> str:
    """Write the changelog derived from ``events`` into a fresh temp dir
    as ``n_files`` parquet files (micro-batch granularity for the file
    source). With ``closer`` a single sentinel row at max(ts)+3h is
    appended (table ``__closer__``) to advance the final watermark."""
    cl = changelog_from_events(load_table(spark, sf_dir, "events"))
    out = os.path.join(scratch_dir("m2c_stream_"), "changelog")
    cl.repartition(n_files, "file_seq").write.mode("overwrite").parquet(out)
    if closer:
        sentinel = cl.agg(F.max("ts").alias("mx")).select(
            F.lit("I").alias("op"),
            F.lit("matomo").alias("schema_name"),
            F.lit("__closer__").alias("table_name"),
            F.lit(-1).cast("bigint").alias("key"),
            F.lit(-1).cast("bigint").alias("seq"),
            F.lit(-1).cast("bigint").alias("file_seq"),
            (
                F.date_trunc("hour", F.col("mx"))
                + F.expr(f"INTERVAL {CLOSER_HOURS} HOURS")
            ).alias("ts"),
            F.lit(0.0).alias("value"),
            F.lit("closer").alias("event_type"),
        )
        sentinel.coalesce(1).write.mode("append").parquet(out)
    return out


def _run_to_sink(stream_df: DataFrame, base: str, output_mode: str) -> str:
    """availableNow run of ``stream_df`` into a parquet sink; returns the
    sink path after termination. The no-data micro-batch at end-of-
    stream performs the final watermark eviction for append mode.

    The parquet sink only accepts append mode, so update-mode streams
    (stateful operators re-emitting keys) go through ``foreachBatch``
    appending each micro-batch's update rows — the standard pattern for
    landing update-mode output on an append-only store."""
    sink = os.path.join(base, "sink")
    ckpt = os.path.join(base, "ckpt")
    writer = stream_df.writeStream.option("checkpointLocation", ckpt)
    if output_mode == "update":
        writer = writer.outputMode("update").foreachBatch(
            lambda batch_df, _id: batch_df.write.mode("append").parquet(sink)
        )
    else:
        writer = writer.outputMode(output_mode).format("parquet").option("path", sink)
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination()
    return sink


def stream_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator, end-to-end: changelog files →
    readStream (2 files per trigger → multiple micro-batches) →
    ``applyInPandasWithState`` latest-row fold → update-mode sink.

    Update mode re-emits a key every micro-batch that touches it, so the
    sink holds one row per (key, micro-batch); the final state is the
    max-``seq`` row per key — folded here with one window pass. ``seq``
    is globally unique (event_id), so the argmax is tie-free and the
    result is invariant to file→batch assignment."""
    cl_dir = _stage_changelog(spark, sf_dir, n_files=4, closer=False)
    stream = (
        spark.readStream.schema(CHANGELOG_DDL)
        .option("maxFilesPerTrigger", 2)
        .parquet(cl_dir)
    )
    # The state store allocates one partition (RocksDB/HDFS instance +
    # one Arrow worker round-trip per micro-batch) per shuffle
    # partition; a stateful query sizes this to its live-key volume, not
    # the session default (the checkpoint pins it for the query's
    # lifetime anyway). 8 partitions vs the session's 32 measured
    # 18.9 s → ~7 s at sf0.01. Restored after the bounded run.
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        sink = _run_to_sink(
            stateful_latest_state(stream), os.path.dirname(cl_dir), "update"
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    emitted = spark.read.parquet(sink)
    w = Window.partitionBy("key").orderBy(F.col("seq").desc())
    return (
        emitted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("key", "seq", "ts", "value", "event_type", "deleted")
    )


def stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window counts over a real stream (append
    mode), closed out by the sentinel event so every real window
    finalizes. Returns (win_start, win_end, table_name, cnt) for the
    real tables — the closer's own window never finalizes and its table
    is filtered defensively anyway."""
    cl_dir = _stage_changelog(spark, sf_dir, n_files=1, closer=True)
    stream = spark.readStream.schema(CHANGELOG_DDL).parquet(cl_dir)
    counts = windowed_event_counts(stream, window=WINDOW, watermark=WATERMARK)
    sink = _run_to_sink(counts, os.path.dirname(cl_dir), "append")
    return (
        spark.read.parquet(sink)
        .filter(F.col("table_name") != "__closer__")
        .select("win_start", "win_end", "table_name", "cnt")
    )


def stream_enrich_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join: the changelog stream joined
    per-micro-batch against a static routing dimension (table →
    apply-mode policy, broadcast every batch — the canonical
    stream⋈small-dim shape), rolled up to per-policy event counts.

    The aggregation runs IN the stream (complete mode via foreachBatch
    overwrite of the final batch state — here availableNow, so the last
    write holds the totals). Static-side reads need no watermark; at
    100 TB the dim broadcast is per-batch constant cost."""
    cl_dir = _stage_changelog(spark, sf_dir, n_files=2, closer=False)
    policy_rows = [(n, p.apply_mode) for n, p in REGISTRY.items()]
    policies = spark.createDataFrame(policy_rows, "table_name string, apply_mode string")
    stream = spark.readStream.schema(CHANGELOG_DDL).parquet(cl_dir)
    enriched = (
        stream.join(F.broadcast(policies), "table_name", "left")
        .withColumn("apply_mode", F.coalesce("apply_mode", F.lit("__default__")))
        .groupBy("apply_mode")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    base = os.path.dirname(cl_dir)
    sink = os.path.join(base, "sink")
    ckpt = os.path.join(base, "ckpt")
    q = (
        enriched.writeStream.outputMode("complete")
        .option("checkpointLocation", ckpt)
        .foreachBatch(
            lambda batch_df, _id: batch_df.write.mode("overwrite").parquet(sink)
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(sink)


def stream_dedup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-native dedup of an at-least-once delivery:
    ``dropDuplicatesWithinWatermark`` on the globally-unique position
    absorbs a full REPLAY of the changelog (the reference's crash-
    between-data-and-ledger duplicate scenario, doc_old_duplicates.md:
    6-10 — handled in-stream instead of at read time).

    The staged stream is the changelog written TWICE (two identical
    single-file copies, one micro-batch each). Whichever copy processes
    first emits every row (a batch is never late against the initial
    watermark); the second copy's rows are all dropped — by dedup state
    inside the watermark, by the late-record filter beyond it. Either
    way the sink holds the changelog exactly once, so the oracle is the
    plain changelog view.

    Scale: state is one (seq) entry per in-watermark event — bounded by
    the watermark horizon, not the stream length — which is the point of
    the WithinWatermark variant over plain dropDuplicates."""
    cl = changelog_from_events(load_table(spark, sf_dir, "events"))
    out = os.path.join(scratch_dir("m2c_stream_"), "changelog")
    cl.coalesce(1).write.mode("overwrite").parquet(out)
    cl.coalesce(1).write.mode("append").parquet(out)  # the replayed delivery
    stream = (
        spark.readStream.schema(CHANGELOG_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(out)
    )
    deduped = stream.withWatermark("ts", WATERMARK).dropDuplicatesWithinWatermark(["seq"])
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")  # see stream_latest_state
    try:
        sink = _run_to_sink(deduped, os.path.dirname(out), "append")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.read.parquet(sink).select(
        "op", "schema_name", "table_name", "key", "seq", "file_seq", "ts",
        "value", "event_type",
    )


SESSION_GAP = "1800 seconds"  # Matomo's 30-min visit timeout


def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SESSIONIZATION with native ``session_window`` state —
    the §2.7 stateful-session concept (Matomo's visit timeout applied
    in-stream): per key, events within 30 minutes of the previous one
    merge into a growing session; a session finalizes (append-mode
    emission) once the watermark passes its end + gap.

    The closer sentinel (trunc(hour, max ts) + 4 h, watermark 2 h)
    drives the final watermark a full half hour past any real session's
    end (real end ≤ max ts + 30 min ≤ trunc + 1.5 h < trunc + 2 h), so
    every real session flushes in availableNow's no-data batch and the
    result equals the batch gaps-and-islands sessionization — fully
    oracle-checkable, like ``stream_windowed_counts``.

    State at scale: one open session struct per ACTIVE key within the
    watermark horizon (merged map-side by the session aggregation), not
    per event; expired sessions leave the store on emission."""
    cl_dir = _stage_changelog(spark, sf_dir, n_files=2, closer=True)
    stream = (
        spark.readStream.schema(CHANGELOG_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(cl_dir)
    )
    sessions = (
        stream.withWatermark("ts", WATERMARK)
        .groupBy(F.session_window("ts", SESSION_GAP).alias("w"), F.col("key"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "key",
            F.col("w.start").alias("sess_start"),
            F.col("w.end").alias("sess_end"),
            "n_events",
        )
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")  # see stream_latest_state
    try:
        sink = _run_to_sink(sessions, os.path.dirname(cl_dir), "append")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.read.parquet(sink).filter(F.col("key") >= 0)


def stream_bm25_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest of the PERSISTED BM25 inverted index
    (``operators/bm25_index.py``) — the retrieval×streaming composition
    completing the maintained-store streaming family (MinHash:
    ``stream_neardup_index``; IVF: ``stream_ivf_ingest``): the corpus
    lands as 3 parquet files, a file stream feeds one micro-batch each,
    and ``foreachBatch`` REOPENS the store by path and runs
    ``add_batch`` — O(batch) tokenize, journaled atomic postings+ledger
    commit. ``foreachBatch`` is at-least-once; the ledger anti-join
    makes a retried micro-batch a no-op, so the stream-built store is
    delivery-schedule-invariant.

    Certification: one ``search`` against the stream-built store must
    answer IDENTICALLY to the one-shot corpus-scan ``text_bm25_topk``
    (BM25's global stats are computed at query time from store
    contents). The row IS that search's top-k, so it shares the
    one-shot's DuckDB oracle verbatim — the streaming path is
    value-hash-certified end-to-end, not count-certified."""
    from ..operators.bm25_index import BM25Index
    from .quality import BM25_QUERY, BM25_TOPK

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = scratch_dir("m2c_stream_bm25_")
    docs_dir = os.path.join(base, "docs")
    d.repartition(3, "doc_id").write.mode("overwrite").parquet(docs_dir)

    path = os.path.join(base, "idx")
    BM25Index(spark, path).recover()  # constructor-path check only
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
    )
    q = (
        stream.writeStream.option(
            "checkpointLocation", os.path.join(base, "ckpt")
        )
        # path-only reopen per micro-batch — the production shape: the
        # ingest job knows only the store path
        .foreachBatch(lambda batch, _id: BM25Index(spark, path).add_batch(batch))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return BM25Index(spark, path).search(BM25_QUERY, BM25_TOPK)


def stream_substring_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest of the PERSISTED first-occurrence gram store
    (``operators/substring_index.py``) — the last cell of the
    streaming×store matrix (MinHash: ``stream_neardup_index``; IVF:
    ``stream_ivf_ingest``; BM25: ``stream_bm25_ingest``): the CC corpus
    lands as 3 parquet files in ascending-id generations with FORCED
    ascending mtimes (the file source processes oldest-first, so the
    stream delivers the same ascending arrival order the incremental
    cert pins — first-seen order == the one-shot's lexicographic
    order), a file stream feeds one micro-batch each, and
    ``foreachBatch`` REOPENS the store by PATH ALONE (``k=None``
    adopts the gram width from the store meta — the production shape)
    and runs ``add_batch``, appending each batch's removal report to a
    sink. ``foreachBatch`` is at-least-once; the journaled docs-ledger
    anti-join makes a retried micro-batch a no-op.

    Certification row: ``n_docs`` (every doc got a report row — DuckDB
    recounts 3× the documents table), ``n_mismatch = 0`` — the
    accumulated sink reports are row-identical to the ONE-SHOT
    ``substring_dedup`` over the full corpus — and ``meta_adopted``
    (the path-only reopen recovered k and the bucket count).
    ``dedup_substring_incremental`` pins the explicit batch loop
    against the same one-shot, so stream == batch-loop == one-shot.

    Folded into ``dedup_incr_suite`` as member ``substr_stream``
    (rotation discipline: the un-folded original stays in the extended
    registry)."""
    from ..functions.text import substring_dedup
    from ..operators.substring_index import SubstringIndex
    from .curation import CC_OFF_1, CC_OFF_2, SUBSTR_K, _cc_corpus

    corpus = _cc_corpus(spark, sf_dir)
    base = scratch_dir("m2c_stream_ss_")
    docs_dir = os.path.join(base, "docs")
    os.makedirs(docs_dir, exist_ok=True)
    batches = [
        corpus.filter(F.col("doc_id") < CC_OFF_1),
        corpus.filter((F.col("doc_id") >= CC_OFF_1) & (F.col("doc_id") < CC_OFF_2)),
        corpus.filter(F.col("doc_id") >= CC_OFF_2),
    ]
    for i, b in enumerate(batches):
        tmp = os.path.join(base, f"stage{i}")
        b.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(
            n for n in os.listdir(tmp) if n.endswith(".parquet")
        )
        dst = os.path.join(docs_dir, f"b{i}.parquet")
        os.rename(os.path.join(tmp, part), dst)
        # deterministic oldest-first delivery: generation i arrives i-th
        os.utime(dst, (1_000_000_000 + i, 1_000_000_000 + i))

    path = os.path.join(base, "idx")
    SubstringIndex(spark, path, k=SUBSTR_K)  # create meta owner's geometry
    sink = os.path.join(base, "reports")
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
    )
    q = (
        stream.writeStream.option(
            "checkpointLocation", os.path.join(base, "ckpt")
        )
        # path-only reopen per micro-batch: k/buckets come from meta
        .foreachBatch(
            lambda batch, _id: SubstringIndex(spark, path, k=None)
            .add_batch(batch)
            .write.mode("append")
            .parquet(sink)
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    reopened = SubstringIndex(spark, path, k=None)
    meta_adopted = reopened.k == SUBSTR_K and reopened.n_buckets >= 1
    got = spark.read.parquet(sink)
    want = substring_dedup(corpus, SUBSTR_K).select(*got.columns)
    n_mismatch = got.exceptAll(want).count() + want.exceptAll(got).count()
    return spark.createDataFrame(
        [(got.count(), n_mismatch, bool(meta_adopted))],
        "n_docs bigint, n_mismatch bigint, meta_adopted boolean",
    )


def stream_neardup_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest of the INCREMENTAL near-dup index — the
    curation×streaming composition a 100 TB pipeline actually runs: the
    document corpus (∪ planted mutants, doc_id + 10^6) lands as 3
    parquet files, a file stream feeds them one micro-batch each, and
    ``foreachBatch`` runs ``MinHashIndex.add_batch`` — batch-scoped
    signing, store-joined candidates, append-only store growth — with
    each batch's pairs appended to a sink.

    Certification row (the hash-family twin pattern):
    (n_planted, recall_ok, stream_equals_oneshot) — the accumulated
    sink pair set must BAG-EQUAL the one-shot ``verified_near_dups``
    over the whole corpus (same banding/verify arithmetic, so the
    equality is exact, not statistical), and the planted-mutant recall
    must clear MINHASH_RECALL_BOUND. Both land as data with fixed
    expected outcomes, so the driver value-hash certifies the streaming
    ingest path end-to-end."""
    import tempfile

    from ..functions.minhash import verified_near_dups
    from ..operators.neardup_index import MinHashIndex
    from .extensions import MINHASH_RECALL_BOUND, MUT_OFFSET

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    mut = d.select(
        (F.col("doc_id") + MUT_OFFSET).alias("doc_id"),
        F.concat("text", F.lit(" extra")).alias("text"),
    )
    corpus = d.unionByName(mut)
    base = scratch_dir("m2c_stream_nd_")
    docs_dir = os.path.join(base, "docs")
    corpus.repartition(3, "doc_id").write.mode("overwrite").parquet(docs_dir)

    idx = MinHashIndex(spark, os.path.join(base, "idx"), threshold=0.7)
    sink = os.path.join(base, "pairs")
    ckpt = os.path.join(base, "ckpt")
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
    )
    q = (
        stream.writeStream.option("checkpointLocation", ckpt)
        .foreachBatch(
            lambda batch, _id: idx.add_batch(batch)
            .write.mode("append")
            .parquet(sink)
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    acc = spark.read.parquet(sink).select("id_a", "id_b", "jaccard")
    oneshot = verified_near_dups(corpus, "doc_id", threshold=0.7).select(
        "id_a", "id_b", "jaccard"
    )
    equal = acc.exceptAll(oneshot).isEmpty() and oneshot.exceptAll(acc).isEmpty()
    n_planted = d.count()
    n_found = acc.filter(
        (F.col("id_a") < MUT_OFFSET) & (F.col("id_b") == F.col("id_a") + MUT_OFFSET)
    ).count()
    return spark.createDataFrame(
        [(n_planted, bool(n_found >= MINHASH_RECALL_BOUND * n_planted), bool(equal))],
        "n_planted bigint, recall_ok boolean, stream_equals_oneshot boolean",
    )


def stream_simhash_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest of the PERSISTED incremental SimHash store
    (``operators/simhash_index.py``) — the fifth member of the
    streaming×store matrix (MinHash / gram / BM25 / IVF landed rounds
    8-9): the corpus (∪ planted mutants, doc_id + 10^6) lands as 3
    parquet files, a file stream feeds them one micro-batch each, and
    ``foreachBatch`` runs ``SimHashIndex.add_batch`` — batch-scoped
    fingerprinting, store-joined pigeonhole candidates, journaled
    append — with each batch's pairs appended to a sink.

    Certification row: (n_docs, stream_equals_oneshot) — the
    accumulated sink pair set must BAG-EQUAL the one-shot
    ``simhash_near_dups`` over the whole corpus. Pigeonhole banding is
    an EXACT candidate net, so the equality is guaranteed-recall on
    both sides; at-least-once redelivery is absorbed by the slim ids
    ledger inside the journaled commit."""
    from ..functions.minhash import simhash_near_dups, with_simhash
    from ..operators.simhash_index import SimHashIndex
    from .extensions import MUT_OFFSET

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    mut = d.select(
        (F.col("doc_id") + MUT_OFFSET).alias("doc_id"),
        F.concat("text", F.lit(" extra")).alias("text"),
    )
    corpus = d.unionByName(mut)
    base = scratch_dir("m2c_stream_sh_")
    docs_dir = os.path.join(base, "docs")
    corpus.repartition(3, "doc_id").write.mode("overwrite").parquet(docs_dir)

    idx = SimHashIndex(spark, os.path.join(base, "idx"))
    sink = os.path.join(base, "pairs")
    ckpt = os.path.join(base, "ckpt")
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
    )
    q = (
        stream.writeStream.option("checkpointLocation", ckpt)
        .foreachBatch(
            lambda batch, _id: idx.add_batch(batch)
            .write.mode("append")
            .parquet(sink)
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    acc = spark.read.parquet(sink).select("id_a", "id_b", "hamming")
    oneshot = simhash_near_dups(
        with_simhash(corpus, "text", attach=False), "doc_id"
    )
    equal = idx.pairs_equal(oneshot, acc)
    return spark.createDataFrame(
        [(d.count(), bool(equal))],
        "n_docs bigint, stream_equals_oneshot boolean",
    )


def stream_cluster_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming fold of the PERSISTED incremental cluster store
    (``operators/cluster_index.py``) — the sixth member of the
    streaming×store matrix: the deterministic near-dup edge set
    (``plans/curation._cc_edges`` over the 3-generation mutant corpus)
    lands as 3 parquet files hash-partitioned by edge (so every
    chain's edges scatter across micro-batches), a file stream feeds
    them one micro-batch each, and ``foreachBatch`` REOPENS the store
    from its meta (path-only — the production shape) and runs
    ``add_pairs`` — contracted-graph CC per batch, journaled one-marker
    commit. ``foreachBatch`` is at-least-once; redelivered folds are
    no-ops BY ALGEBRA (every replayed edge resolves to equal labels).

    Certification row: (n_docs, stream_equals_oneshot) — the final
    maintained assignment must BAG-EQUAL ``connected_components`` over
    the whole edge set (same canonical min-id labels): components that
    only exist through CROSS-micro-batch closure must still converge."""
    from ..functions.graph import connected_components
    from ..functions.minhash import with_shingles
    from ..operators.cluster_index import ClusterIndex
    from .curation import _cc_corpus, _cc_edges

    d = load_table(spark, sf_dir, "documents")
    sh = with_shingles(_cc_corpus(spark, sf_dir), "text", k=5).select(
        "doc_id", "shingles"
    )
    edges = _cc_edges(sh).localCheckpoint(eager=True)
    base = scratch_dir("m2c_stream_cc_")
    edges_dir = os.path.join(base, "edges")
    edges.repartition(3, "id_a", "id_b").write.mode("overwrite").parquet(
        edges_dir
    )

    store = os.path.join(base, "idx")
    ClusterIndex(spark, store, n_buckets=8)  # geometry written once
    stream = (
        spark.readStream.schema("id_a bigint, id_b bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(edges_dir)
    )
    q = (
        stream.writeStream.option(
            "checkpointLocation", os.path.join(base, "ckpt")
        )
        .foreachBatch(
            # path-only reopen per micro-batch: n_buckets adopts from
            # the store meta, like every sibling streaming twin
            lambda batch, _id: ClusterIndex(spark, store).add_pairs(batch)
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    mine = ClusterIndex(spark, store).assignments()
    want = connected_components(edges, "id_a", "id_b")
    diff = mine.exceptAll(want).unionByName(want.exceptAll(mine)).count()
    return spark.createDataFrame(
        [(d.count(), diff == 0)],
        "n_docs bigint, stream_equals_oneshot boolean",
    )


def stream_manifest_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming fold of the PERSISTED corpus-statistics manifest
    (``operators/manifest.py``) — the seventh member of the
    streaming×store matrix: the documents table lands as 3 parquet
    files hash-partitioned on doc_id, a file stream feeds them one
    micro-batch each, and ``foreachBatch`` REOPENS the manifest from
    its meta (path-only) and folds the batch's mergeable partial.
    ``foreachBatch`` is at-least-once; redelivery is absorbed by the
    fingerprint ledger (``seen/``).

    Certification row: (n_docs, stream_equals_oneshot) — after the
    stream drains, every exact-mergeable statistic of the maintained
    snapshot must EQUAL the one-shot manifest's (sums are associative
    over any batching), and the union-merged HLL estimate must sit
    within the sketch family's tolerance of the exact distinct
    count."""
    from .extensions import SKETCH_ABS_SLACK, SKETCH_REL_SLACK
    from ..operators.manifest import CorpusManifest

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = scratch_dir("m2c_stream_mf_")
    docs_dir = os.path.join(base, "docs")
    d.repartition(3, "doc_id").write.mode("overwrite").parquet(docs_dir)

    store = os.path.join(base, "idx")
    CorpusManifest(spark, store)  # meta written once
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
    )
    q = (
        stream.writeStream.option(
            "checkpointLocation", os.path.join(base, "ckpt")
        )
        .foreachBatch(
            lambda batch, _id: CorpusManifest(spark, store).add_batch(batch)
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    one = CorpusManifest(spark, os.path.join(base, "one"))
    one.add_batch(d)
    ss = CorpusManifest(spark, store).snapshot().first().asDict()
    so = one.snapshot().first().asDict()
    exact_fields = [
        "n_docs", "n_tokens", "n_chars",
        "lang_en", "lang_de", "lang_es", "lang_unk", "tok_hist",
    ]
    n_exact = d.select("doc_id").distinct().count()
    bound = max(SKETCH_ABS_SLACK, SKETCH_REL_SLACK * n_exact)
    ok = (
        all(ss[f] == so[f] for f in exact_fields)
        and abs(ss["distinct_docs_est"] - n_exact) <= bound
    )
    return spark.createDataFrame(
        [(int(ss["n_docs"]), bool(ok))],
        "n_docs bigint, stream_equals_oneshot boolean",
    )


def stream_ivf_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest of the PERSISTED incremental IVF store
    (``operators/ann_index.py``) — the ANN×streaming composition of
    ``stream_neardup_index``: ``build`` trains the frozen quantizer on
    batch 0 BEFORE the stream starts (quantizer training is bounded
    control-plane work, never per-batch), the remaining corpus lands as
    parquet files consumed by a file stream, and ``foreachBatch``
    REOPENS the store from its manifest (no geometry args — the
    production shape: the ingest job knows only the path) and runs
    ``add_batch`` — one Arrow GEMM + journaled partitioned append per
    micro-batch, O(batch). ``foreachBatch`` is at-least-once, so
    ``add_batch`` anti-joins the batch against the slim ``ids/`` ingest
    ledger (committed atomically with the lists append through the
    staged-commit journal) before appending: a retried micro-batch
    appends nothing twice (crash + replay pinned in
    ``test_ann_index.py``), the same ledger discipline as the MinHash
    streaming twin.

    Certification row: ``n_indexed`` (every corpus vector arrived —
    DuckDB recounts from the embeddings table), ``n_rows``,
    ``n_mismatch = 0`` — the stream-ingested store answers IDENTICALLY
    to ``ivf_frozen_reference`` (the in-memory ONE-SHOT probe over the
    whole corpus under the same frozen centroids), and
    ``manifest_adopted`` — the no-args reopen recovered the full
    geometry. ``ann_ivf_incremental`` pins the explicit batch loop
    against the same reference, so stream == one-shot == batch-loop,
    exactly (frozen quantizer ⇒ assignment is pointwise ⇒ the store's
    contents are batch-schedule-invariant).

    Folded into ``ann_recall_suite`` as member ``ivf_stream`` (rotation
    discipline: the un-folded original stays in the extended registry).
    """
    from ..operators.ann_index import IVFIndex
    from .extensions import EMB_DIM, ivf_frozen_reference

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < _ann_N_QUERIES)
    c = emb.filter(F.col("vec_id") >= _ann_N_QUERIES)
    b0 = c.filter(F.pmod("vec_id", F.lit(3)) == 0)
    rest = c.filter(F.pmod("vec_id", F.lit(3)) != 0)

    base = scratch_dir("m2c_stream_ivf_")
    path = os.path.join(base, "index")
    idx = IVFIndex(spark, path, dim=EMB_DIM, n_list=32)
    n_total = idx.build(b0)

    incoming = os.path.join(base, "incoming")
    rest.repartition(3, "vec_id").write.mode("overwrite").parquet(incoming)
    batch_counts: list[int] = []

    def ingest(batch: DataFrame, _batch_id: int) -> None:
        # manifest-only reopen: dim/n_list/seed/pq all adopted from the
        # store — the corruption class the manifest closed (round 7)
        batch_counts.append(IVFIndex(spark, path).add_batch(batch))

    stream = (
        spark.readStream.schema(spark.read.parquet(incoming).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(incoming)
    )
    sq = (
        stream.writeStream.option(
            "checkpointLocation", os.path.join(base, "ckpt")
        )
        .foreachBatch(ingest)
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination()
    n_total += sum(batch_counts)

    reopened = IVFIndex(spark, path)
    manifest_adopted = (
        reopened.dim == EMB_DIM
        and reopened.n_list == 32
        and reopened.pq_m is None
    )
    got = reopened.search(q, k=_ann_TOPK, nprobe=8).persist()
    want = ivf_frozen_reference(reopened, c, q)
    n_mismatch = got.exceptAll(want).count() + want.exceptAll(got).count()
    n_rows = got.count()
    got.unpersist()
    return spark.createDataFrame(
        [(n_total, n_rows, n_mismatch, bool(manifest_adopted))],
        "n_indexed bigint, n_rows bigint, n_mismatch bigint,"
        " manifest_adopted boolean",
    )


#: event-time reach of the stream-stream join (u.ts within this many
#: minutes AFTER its insert's i.ts) — the reference's arrival shape is
#: "visit row, then its action rows shortly after"
JOIN_WINDOW_MIN = 30


def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked STREAM-STREAM inner join — §2.7's remaining concept:
    the INSERT stream of the ``visits`` table joined to its UPDATE
    stream on key with an event-time range condition
    ``u_ts ∈ [i_ts, i_ts + 30 min]`` (the reference's arrival shape:
    a visit row lands, its action rows follow within the visit).

    Both sides carry watermarks and the join carries the time-range
    predicate, which is exactly what lets Spark bound the join state:
    an insert's state row is evictable once the watermark passes
    ``i_ts + 30 min``, an update's once it passes ``u_ts`` — state is
    sized by the watermark horizon, not the stream length (the 100 TB
    contract for stream-stream joins; without the range condition the
    state grows forever).

    Oracle determinism: the bounded changelog is staged ONE file per
    side, so availableNow processes everything in the first micro-batch
    and no watermark eviction can race arrival order — the emitted set
    equals the batch interval join EXACTLY.  Multi-batch invariance
    under an ample watermark is pinned in tests/test_streaming.py
    (arrival order is event-time-monotone there, mirroring binlog
    tailing, where position order IS time order)."""
    cl = changelog_from_events(load_table(spark, sf_dir, "events")).filter(
        F.col("table_name") == "visits"
    )
    base = scratch_dir("m2c_stream_ssj_")
    i_dir = os.path.join(base, "ins")
    u_dir = os.path.join(base, "upd")
    cl.filter("op = 'I'").coalesce(1).write.mode("overwrite").parquet(i_dir)
    cl.filter("op = 'U'").coalesce(1).write.mode("overwrite").parquet(u_dir)

    ins = (
        spark.readStream.schema(CHANGELOG_DDL).parquet(i_dir)
        .select("key", F.col("seq").alias("i_seq"), F.col("ts").alias("i_ts"))
        .withWatermark("i_ts", WATERMARK)
    )
    upd = (
        spark.readStream.schema(CHANGELOG_DDL).parquet(u_dir)
        .select(
            F.col("key").alias("u_key"),
            F.col("seq").alias("u_seq"),
            F.col("ts").alias("u_ts"),
        )
        .withWatermark("u_ts", WATERMARK)
    )
    joined = ins.join(
        upd,
        F.expr(
            f"key = u_key AND u_ts >= i_ts "
            f"AND u_ts <= i_ts + INTERVAL {JOIN_WINDOW_MIN} MINUTES"
        ),
    ).select("key", "i_seq", "u_seq", "i_ts", "u_ts")

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")  # see stream_latest_state
    try:
        sink = _run_to_sink(joined, base, "append")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.read.parquet(sink)


def stream_windowed_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable sketch IN-STREAM — the 100 TB distinct-users-per-hour
    shape: exact ``countDistinct`` is unsupported (and unaffordable) in
    streaming aggregation, so the stream carries
    ``approx_count_distinct`` (HyperLogLog++, register merges commute
    across micro-batches and map-side partials), watermarked tumbling
    windows, append mode, closer-finalized like
    ``stream_windowed_counts``.

    Certification follows the tolerance-twin pattern
    (``events_approx_profile``): the sink read-back joins a BATCH exact
    per-window distinct over the same changelog, emitting the exact
    value (which DuckDB reproduces) plus the in-envelope boolean
    (rsd 5% → assert 10%; register merges are deterministic for fixed
    data, so the boolean is stable, not flaky).

    The closer sentinel flows THROUGH the aggregation on purpose: a
    pre-agg filter would be pushed below the EventTimeWatermark node
    and the closer would never advance the watermark (observed: the
    last 3 windows withheld).  Harmless in-state — the closer sits 4 h
    past every real event, so its own window [closer, closer+1h) never
    finalizes and the read-back's inner join against the exact batch
    twin excludes anything stray.

    Envelope: relative 10% PLUS an absolute slack of 4 — hourly windows
    at small scale hold ~10 distinct keys, where HLL++'s error is a
    couple of REGISTERS, not a percentage (observed: n_exact=5 →
    n_hll=4, a 20% relative miss that is exactly 1 off)."""
    cl_dir = _stage_changelog(spark, sf_dir, n_files=1, closer=True)
    stream = spark.readStream.schema(CHANGELOG_DDL).parquet(cl_dir)
    agg = (
        stream.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", WINDOW).alias("w"))
        .agg(F.approx_count_distinct("key", rsd=0.05).alias("n_hll"))
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "n_hll",
        )
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")  # see stream_latest_state
    try:
        sink = _run_to_sink(agg, os.path.dirname(cl_dir), "append")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    streamed = spark.read.parquet(sink)
    exact = (
        changelog_from_events(load_table(spark, sf_dir, "events"))
        .groupBy(F.date_trunc("hour", "ts").alias("win_start"))
        .agg(F.countDistinct("key").alias("n_exact"))
    )
    return streamed.join(exact, "win_start").select(
        "win_start",
        "win_end",
        "n_exact",
        (
            F.abs(F.col("n_hll") - F.col("n_exact"))
            <= 0.10 * F.col("n_exact") + 4
        ).alias("hll_ok"),
    )


QUERIES = {
    "stream_latest_state": stream_latest_state,
    "stream_stream_join": stream_stream_join,
    "stream_windowed_distinct": stream_windowed_distinct,
    "stream_windowed_counts": stream_windowed_counts,
    "stream_session_windows": stream_session_windows,
    "stream_dedup_replay": stream_dedup_replay,
    "stream_enrich_join": stream_enrich_join,
    "stream_bm25_ingest": stream_bm25_ingest,
    "stream_neardup_index": stream_neardup_index,
    "stream_simhash_ingest": stream_simhash_ingest,
    "stream_cluster_ingest": stream_cluster_ingest,
    "stream_manifest_ingest": stream_manifest_ingest,
    "stream_substring_ingest": stream_substring_ingest,
    "stream_ivf_ingest": stream_ivf_ingest,
}

ORACLE = {
    # every real window finalizes; the HLL estimate must land inside
    # its envelope, and the exact distinct is recomputed per window
    "stream_windowed_distinct": f"""
        SELECT date_trunc('hour', ts) AS win_start,
               date_trunc('hour', ts) + INTERVAL 1 HOUR AS win_end,
               CAST(COUNT(DISTINCT key) AS BIGINT) AS n_exact,
               CAST(TRUE AS BOOLEAN) AS hll_ok
        FROM ({CHANGELOG_VIEW_SQL}) c
        GROUP BY 1, 2
    """,
    # single-batch availableNow run == the batch interval join exactly
    "stream_stream_join": f"""
WITH c AS ({CHANGELOG_VIEW_SQL}),
i AS (SELECT key, seq AS i_seq, ts AS i_ts FROM c
      WHERE op = 'I' AND table_name = 'visits'),
u AS (SELECT key AS u_key, seq AS u_seq, ts AS u_ts FROM c
      WHERE op = 'U' AND table_name = 'visits')
SELECT key, i_seq, u_seq, i_ts, u_ts
FROM i JOIN u ON key = u_key
  AND u_ts >= i_ts AND u_ts <= i_ts + INTERVAL {JOIN_WINDOW_MIN} MINUTE
""",
    # foreachBatch ingest of the persisted IVF store == the one-shot
    # frozen-centroid probe, geometry adopted from the manifest alone:
    # fixed expected outcomes; n_indexed recounted from the raw table
    "stream_ivf_ingest": f"""
        SELECT CAST(count(*) - {_ann_N_QUERIES} AS BIGINT) AS n_indexed,
               CAST({_ann_N_QUERIES * _ann_TOPK} AS BIGINT) AS n_rows,
               CAST(0 AS BIGINT) AS n_mismatch,
               CAST(TRUE AS BOOLEAN) AS manifest_adopted
        FROM embeddings
    """,
    # streaming incremental ingest == one-shot recompute, planted recall
    # clears the bound: fixed expected outcomes (hash-family twin)
    "stream_neardup_index": """
        SELECT count(*) AS n_planted, CAST(TRUE AS BOOLEAN) AS recall_ok,
               CAST(TRUE AS BOOLEAN) AS stream_equals_oneshot
        FROM documents
    """,
    "stream_simhash_ingest": """
        SELECT count(*) AS n_docs,
               CAST(TRUE AS BOOLEAN) AS stream_equals_oneshot
        FROM documents
    """,
    # foreachBatch fold of the cluster store over hash-scattered edge
    # micro-batches == one-shot CC closure: fixed expected outcome (the
    # Spark side asserts the bag equality; the closure scalars are
    # independently certified by dedup_cluster_incremental's oracle)
    "stream_cluster_ingest": """
        SELECT count(*) AS n_docs,
               CAST(TRUE AS BOOLEAN) AS stream_equals_oneshot
        FROM documents
    """,
    # foreachBatch fold of the corpus manifest over hash-scattered doc
    # micro-batches == one-shot fold: sums are associative over any
    # batching (the Spark side asserts the exact-field equality and the
    # HLL tolerance; the sums themselves are independently certified by
    # corpus_manifest_incremental's oracle)
    "stream_manifest_ingest": """
        SELECT count(*) AS n_docs,
               CAST(TRUE AS BOOLEAN) AS stream_equals_oneshot
        FROM documents
    """,
    # foreachBatch ingest of the gram store (ascending delivery) == the
    # one-shot ExactSubstr report, geometry adopted from meta alone:
    # fixed expected outcomes; n_docs recounted (3 CC generations)
    "stream_substring_ingest": """
        SELECT CAST(3 * count(*) AS BIGINT) AS n_docs,
               CAST(0 AS BIGINT) AS n_mismatch,
               CAST(TRUE AS BOOLEAN) AS meta_adopted
        FROM documents
    """,
    # final stateful state == global argmax by seq per key; the deleted
    # flag marks keys whose latest event is a DELETE (terminal marker)
    "stream_latest_state": f"""
        SELECT key, seq, ts, value, event_type, deleted
        FROM (
            SELECT key, seq, ts, value, event_type,
                   CASE WHEN op = 'D' THEN 'D' ELSE '' END AS deleted,
                   ROW_NUMBER() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
            FROM ({CHANGELOG_VIEW_SQL}) c
        ) WHERE rn = 1
    """,
    # per-policy routing counts == a CASE over the same registry mapping
    "stream_enrich_join": f"""
        SELECT CASE table_name {_POLICY_CASE} ELSE '__default__' END AS apply_mode,
               count(*) AS n_events
        FROM ({CHANGELOG_VIEW_SQL}) c
        GROUP BY 1
    """,
    # the doubled delivery dedups back to exactly the changelog
    "stream_dedup_replay": f"""
        SELECT op, schema_name, table_name, key, seq, file_seq, ts,
               value, event_type
        FROM ({CHANGELOG_VIEW_SQL}) c
    """,
    # every real session finalizes (closer advances the watermark past
    # end + gap), so streaming sessions == batch gaps-and-islands with
    # the native bounds (start = first event, end = last + gap)
    "stream_session_windows": f"""
WITH c AS ({CHANGELOG_VIEW_SQL}),
t AS (
  SELECT key, seq, ts,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800 * 1000000
              THEN 1 ELSE 0 END AS new_sess
  FROM c
  WINDOW w AS (PARTITION BY key ORDER BY ts, seq)
),
s AS (
  SELECT key, ts,
         CAST(sum(new_sess) OVER (PARTITION BY key ORDER BY ts, seq
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS session_idx
  FROM t
)
SELECT key, min(ts) AS sess_start,
       max(ts) + INTERVAL 1800 SECOND AS sess_end,
       count(*) AS n_events
FROM s GROUP BY key, session_idx
""",
    # every real window finalizes (closer advances the watermark past
    # them), so streaming append == plain per-hour GROUP BY
    "stream_windowed_counts": f"""
        SELECT
            date_trunc('hour', ts) AS win_start,
            date_trunc('hour', ts) + INTERVAL 1 HOUR AS win_end,
            table_name,
            CAST(COUNT(*) AS BIGINT) AS cnt
        FROM ({CHANGELOG_VIEW_SQL}) c
        GROUP BY 1, 2, 3
    """,
}

# the stream-built store answers identically to the one-shot corpus
# scan — the streaming twin shares text_bm25_topk's oracle verbatim
from .quality import ORACLE as _QUALITY_ORACLE  # noqa: E402

ORACLE["stream_bm25_ingest"] = _QUALITY_ORACLE["text_bm25_topk"]
