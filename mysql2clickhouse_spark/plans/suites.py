"""Certification SUITES — several same-family queries folded into one
driver-checkable row set each.

Why this module exists: the correctness driver records at most ~50
registry entries per round (CORRECTNESS_r02.json held exactly the first
50 of 97), so near-duplicate entries crowd whole operator families out
of the hard signal. Each suite here unions the member queries' outputs
under a ``method``/``mode``/``step`` tag into ONE registry entry whose
DuckDB oracle is the same union of the members' oracles — every member
stays individually value-hash-checked (its rows carry its tag), but the
family costs one registry slot instead of N.

Member → suite map (the un-folded originals remain registered in the
EXTENDED registry, run by scripts/check_parity.py and pytest):

- ``q45_retention``      = q4_retention_probe + q5_retention_count
- ``cdc_apply_suite``    = cdc_apply_append (P4) + cdc_apply_mutate (P7/P9)
- ``cdc_insupd_suite``   = cdc_apply_ins_upd (P5/P6) + cdc_latest_state (Q1)
- ``dedup_cert_suite``   = dedup_minhash_lsh_recall + dedup_simhash_locality
                           + dedup_simhash_pairs_exact + semdedup_recall
- ``dedup_incr_suite``   = dedup_incremental (MinHash index lifecycle)
                           + corpus_substring_dedup (full ExactSubstr
                           report, every row value-hashed)
                           + dedup_substring_incremental (gram-store
                           batched == one-shot + replay no-op)
                           + dedup_minhash_index_deletes
                           + dedup_substring_index_deletes (round 9:
                           the two stores' delete lifecycles, folded
                           in their landing round)
                           + stream_substring_ingest (round 9: the
                           gram store's foreachBatch streaming twin —
                           completes the streaming×store matrix)
  (rotation note, round 9: REPLACED the bare ``dedup_incremental``
  registry slot so the round-8 exact-substring family is visible to
  the ~50-row driver hard signal; the cert rows pack their scalars
  into the report's columns — doc_id=count, n_tokens=mismatches/flag,
  n_removed=flag — documented on the suite function)
- ``ann_recall_suite``   = ann_{lsh,ivf,pq,ivfpq}_recall
                           + ann_knn_graph_recall + ann_ivf_partitioned_equiv
                           + ann_ivf_incremental (round 6: persisted
                           incremental IVF store lifecycle)
                           + stream_ivf_ingest (round 8: foreachBatch
                           streaming ingest of the same store ==
                           one-shot under the frozen quantizer)
                           + ann_ivf_deletes (round 9: tombstone +
                           compaction delete lifecycle, logical ==
                           physical == filtered reference)
- ``text_ranking_suite`` = text_bm25_topk + text_tfidf_docsim
                           + text_bm25_indexed + stream_bm25_ingest
                           + text_bm25_indexed_deletes (round 9: the
                           store-backed BM25 twins — batched ingest,
                           foreachBatch streaming ingest, and the
                           delete lifecycle's logical/physical phases —
                           folded in their landing round per the r8
                           verdict's rotation guidance)
- ``sketch_suite``       = events_approx_profile + events_hll_distinct
                           + events_quantile_sketch + text_topk_sketch
                           + corpus_manifest_incremental ×3
                           + stream_manifest_ingest (round 11: the
                           maintained corpus-statistics manifest store
                           and its streaming twin, folded in their
                           landing round)
  (rotation note, round 5: REPLACED the bare ``events_approx_profile``
  registry slot when the DataSketches-HLL, GK-quantile, and
  heavy-hitter ops landed)
- ``stream_suite``       = stream_latest_state + stream_windowed_counts
                           + stream_stream_join + stream_windowed_distinct
  (rotation note, round 6: REPLACED the two bare stream_* slots when
  the stream-stream join and in-stream HLL sketch landed; the freed
  slot admitted ``cdc_consistency_check``)
- ``corpus_prep_suite``  = corpus_pack_sequences + corpus_shuffle_order
                           + corpus_quality_gate_adaptive + text_bpe_encode
  (rotation note, round 6: REPLACED the bare ``corpus_pack_sequences``
  slot when the three new training-prep ops landed)
- ``corpus_export_suite``= corpus_export_shards + corpus_export_jsonl
                           + corpus_export_tar + multimodal_export_tar
  (rotation notes: round 4 — this suite REPLACED the bare
  ``corpus_export_shards`` registry slot when the jsonl.gz path landed;
  round 5 — the WebDataset-style tar path AND its binary-payload
  multimodal twin folded into the same slot, so all four export
  certifications stay inside the ≤50 hard signal)

The folds are pure column renames/casts over the member outputs — no
member plan changes — so a suite row going red localizes to exactly one
member by its tag.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import cdc, corpus, curation, extensions, quality, streaming_queries
from .cdc import (
    cdc_apply_append,
    cdc_apply_ins_upd,
    cdc_apply_mutate,
    cdc_latest_state,
)
from .corpus import q4_retention_probe, q5_retention_count
from .curation import corpus_substring_dedup, dedup_substring_incremental
from .extensions import (
    ann_ivf_partitioned_equiv,
    ann_ivf_recall,
    ann_ivfpq_recall,
    ann_knn_graph_recall,
    ann_lsh_recall,
    ann_pq_recall,
    dedup_incremental,
    dedup_index_probe,
    dedup_minhash_lsh_recall,
    dedup_simhash_incremental,
    dedup_simhash_index_deletes,
    dedup_simhash_locality,
    dedup_simhash_pairs_exact,
    semdedup_recall,
)
from .quality import text_bm25_topk, text_tfidf_docsim


def q45_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 probe + Q5 count as two tagged 1-row results (the reference
    runs them as one retention transaction, _settings.py:174-223)."""
    probe = q4_retention_probe(spark, sf_dir).select(
        F.lit("q4_probe").alias("step"), F.col("id_max").cast("bigint").alias("value")
    )
    cnt = q5_retention_count(spark, sf_dir).select(
        F.lit("q5_count").alias("step"), F.col("del_count").cast("bigint").alias("value")
    )
    return probe.unionByName(cnt)


_APPLY_COLS = ("key", "seq", "file_seq", "ts", "value", "event_type")


def cdc_apply_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 (insert-only append) + P7/P9 (merge-mode replay, deletes
    terminal) over the same changelog, tagged by apply mode."""
    a = cdc_apply_append(spark, sf_dir).select(
        F.lit("append").alias("mode"), *_APPLY_COLS
    )
    m = cdc_apply_mutate(spark, sf_dir).select(
        F.lit("mutate").alias("mode"), *_APPLY_COLS
    )
    return a.unionByName(m)


_INSUPD_COLS = ("key", "dateid", "ts", "value", "event_type")


def cdc_insupd_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5/P6 (INS-UPD version store) + Q1 over it (latest row per key),
    tagged 'versions' / 'latest'."""
    v = cdc_apply_ins_upd(spark, sf_dir).select(
        F.lit("versions").alias("mode"), *_INSUPD_COLS
    )
    latest = cdc_latest_state(spark, sf_dir).select(
        F.lit("latest").alias("mode"), *_INSUPD_COLS
    )
    return v.unionByName(latest)


def dedup_cert_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hash-family dedup certification twins as (method, n, ok)
    rows: MinHash+LSH planted recall, SimHash locality, SimHash
    banding==brute-force exactness, SemDeDup planted-copy drop — plus
    (round-10 fold, landing round) the incremental SimHash STORE's
    three lifecycle certs: ``simhash_incr`` (batch accumulation
    bag-equals the one-shot AND replay is a no-op), ``simhash_incr_del``
    (logical/physical/re-ingest delete phases), and ``simhash_stream``
    (foreachBatch ingest == one-shot), and ``minhash_probe`` /
    ``simhash_probe`` / ``substring_probe`` / ``cluster_probe`` (the
    last a round-11 fold, landing round) — the READ-ONLY decontam
    judgment against each store (probe == the mutating path's answer —
    one-shot cross pairs for the hash stores, the subsequent ingest's
    removal report for the gram store, the one-shot CC labels for the
    cluster store — AND the store's file set is byte-identical after). The (method, n, ok) shape is the long format
    the r9 verdict asked new folds to use — n is the DuckDB-recomputable
    count, ok folds the member's boolean certs."""
    from .streaming_queries import stream_simhash_ingest

    rows = [
        dedup_minhash_lsh_recall(spark, sf_dir).select(
            F.lit("minhash_lsh").alias("method"),
            F.col("n_planted").cast("bigint").alias("n"),
            F.col("recall_ok").alias("ok"),
        ),
        dedup_simhash_locality(spark, sf_dir).select(
            F.lit("simhash_locality").alias("method"),
            F.col("n_pairs").cast("bigint").alias("n"),
            F.col("locality_ok").alias("ok"),
        ),
        dedup_simhash_pairs_exact(spark, sf_dir).select(
            F.lit("simhash_banding").alias("method"),
            F.col("n_docs").cast("bigint").alias("n"),
            F.col("banding_exact").alias("ok"),
        ),
        semdedup_recall(spark, sf_dir).select(
            F.lit("semdedup").alias("method"),
            F.col("n_vectors").cast("bigint").alias("n"),
            F.col("planted_all_dropped").alias("ok"),
        ),
        dedup_simhash_incremental(spark, sf_dir).select(
            F.lit("simhash_incr").alias("method"),
            F.col("n_docs").cast("bigint").alias("n"),
            (F.col("incremental_equals_full") & F.col("replay_noop")).alias("ok"),
        ),
        dedup_simhash_index_deletes(spark, sf_dir).select(
            F.lit("simhash_incr_del").alias("method"),
            F.col("n_deleted").cast("bigint").alias("n"),
            (
                F.col("logical_identical")
                & F.col("physical_store_ok")
                & F.col("reingest_ok")
            ).alias("ok"),
        ),
        stream_simhash_ingest(spark, sf_dir).select(
            F.lit("simhash_stream").alias("method"),
            F.col("n_docs").cast("bigint").alias("n"),
            F.col("stream_equals_oneshot").alias("ok"),
        ),
        dedup_index_probe(spark, sf_dir).select(
            F.concat(F.col("store"), F.lit("_probe")).alias("method"),
            F.col("n_probed").cast("bigint").alias("n"),
            (F.col("matches_equal_oneshot") & F.col("store_untouched")).alias("ok"),
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def ann_recall_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every approximate-ANN certification twin as (method, n, ok)
    rows: per-query recall for LSH/IVF/PQ/IVF+PQ top-k, kNN-graph
    coverage+recall, and partitioned-IVF == in-memory-IVF identity."""
    per_query = [
        ("lsh", ann_lsh_recall),
        ("ivf", ann_ivf_recall),
        ("pq", ann_pq_recall),
        ("ivfpq", ann_ivfpq_recall),
    ]
    rows = [
        fn(spark, sf_dir).select(
            F.lit(tag).alias("method"),
            F.col("qid").cast("bigint").alias("n"),
            F.col("recall_ok").alias("ok"),
        )
        for tag, fn in per_query
    ]
    rows.append(
        ann_knn_graph_recall(spark, sf_dir).select(
            F.lit("knn_graph").alias("method"),
            F.col("n_nodes").cast("bigint").alias("n"),
            (F.col("coverage_ok") & F.col("recall_ok")).alias("ok"),
        )
    )
    rows.append(
        ann_ivf_partitioned_equiv(spark, sf_dir).select(
            F.lit("ivf_partitioned").alias("method"),
            F.col("n_rows").cast("bigint").alias("n"),
            (F.col("n_mismatch") == 0).alias("ok"),
        )
    )
    # round 6: incremental IVF store lifecycle (build → 3 batches →
    # compact → identical answers under the frozen quantizer)
    from .extensions import ann_ivf_incremental

    rows.append(
        ann_ivf_incremental(spark, sf_dir).select(
            F.lit("ivf_incremental").alias("method"),
            F.col("n_indexed").cast("bigint").alias("n"),
            (
                (F.col("n_mismatch") == 0)
                & F.col("files_reduced")
                & F.col("post_compact_identical")
            ).alias("ok"),
        )
    )
    # round 8: foreachBatch streaming ingest of the same persisted
    # store — stream == one-shot == batch-loop under the frozen
    # quantizer, geometry adopted from the manifest alone
    from .streaming_queries import stream_ivf_ingest

    rows.append(
        stream_ivf_ingest(spark, sf_dir).select(
            F.lit("ivf_stream").alias("method"),
            F.col("n_indexed").cast("bigint").alias("n"),
            ((F.col("n_mismatch") == 0) & F.col("manifest_adopted")).alias("ok"),
        )
    )
    # round 9: delete lifecycle of the same persisted store —
    # tombstone-time (logical) and post-compaction (physical) answers
    # identical to the filtered frozen-quantizer reference, and a
    # deleted id re-ingests after compact (as-if-never-ingested)
    from .extensions import ann_ivf_deletes

    rows.append(
        ann_ivf_deletes(spark, sf_dir).select(
            F.lit("ivf_deletes").alias("method"),
            F.col("n_deleted").cast("bigint").alias("n"),
            (
                F.col("logical_identical")
                & F.col("physical_identical")
                & F.col("reingest_ok")
            ).alias("ok"),
        )
    )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def sketch_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The approximate-aggregate (sketch) family as tagged tolerance
    rows (method, k1, exact_value, ok): the whole-table HLL++/
    percentile profile, per-day DataSketches HLL distincts with a
    union-merged overall count, and per-group GK quantile estimates —
    every row carries the EXACT value (DuckDB-reproducible) plus the
    engine-side bounded-error flag. Round-11 folds (landing round):
    ``manifest_incr`` ×3 — the MAINTAINED corpus-statistics manifest
    store's incremental==one-shot cert (exact doc/token/char sums
    recomputed by the oracle; ok = exact-field equality + HLL
    tolerance + fingerprint-ledger replay no-op) — and
    ``manifest_stream``, its foreachBatch streaming twin."""
    from .corpus import events_approx_profile
    from .extensions import (
        events_hll_distinct,
        events_quantile_sketch,
        text_topk_sketch,
    )

    prof = events_approx_profile(spark, sf_dir)
    prof_rows = prof.select(
        F.lit("profile_hll").alias("method"),
        F.lit("all").alias("k1"),
        F.col("n_users_exact").cast("double").alias("exact_value"),
        F.col("hll_ok").alias("ok"),
    ).unionByName(
        prof.select(
            F.lit("profile_p50").alias("method"),
            F.lit("all").alias("k1"),
            F.col("p50_exact").cast("double").alias("exact_value"),
            F.col("p50_sketch_ok").alias("ok"),
        )
    )
    hll = events_hll_distinct(spark, sf_dir).select(
        F.lit("hll_distinct").alias("method"),
        F.col("scope").alias("k1"),
        F.col("n_exact").cast("double").alias("exact_value"),
        F.col("est_ok").alias("ok"),
    )
    q = events_quantile_sketch(spark, sf_dir).select(
        F.lit("quantile").alias("method"),
        F.concat(F.col("event_type"), F.lit("@"), F.col("p").cast("string")).alias("k1"),
        F.col("exact_value").cast("double").alias("exact_value"),
        F.col("in_bounds").alias("ok"),
    )
    tk = text_topk_sketch(spark, sf_dir).select(
        F.lit("topk").alias("method"),
        F.col("token").alias("k1"),
        F.col("cnt").cast("double").alias("exact_value"),
        F.col("sketch_ok").alias("ok"),
    )
    # round-11 fold (landing round): the MAINTAINED manifest store's
    # incremental==one-shot cert (three exact sums, shared ok flag)
    # plus its foreachBatch streaming twin
    from .extensions import corpus_manifest_incremental
    from .streaming_queries import stream_manifest_ingest

    mfc = corpus_manifest_incremental(spark, sf_dir)
    mf_ok = (
        F.col("incremental_equals_oneshot")
        & F.col("distinct_est_ok")
        & F.col("replay_noop")
    ).alias("ok")
    mf = (
        mfc.select(
            F.lit("manifest_incr").alias("method"),
            F.lit("n_docs").alias("k1"),
            F.col("n_docs").cast("double").alias("exact_value"),
            mf_ok,
        )
        .unionByName(
            mfc.select(
                F.lit("manifest_incr").alias("method"),
                F.lit("n_tokens").alias("k1"),
                F.col("n_tokens").cast("double").alias("exact_value"),
                mf_ok,
            )
        )
        .unionByName(
            mfc.select(
                F.lit("manifest_incr").alias("method"),
                F.lit("n_chars").alias("k1"),
                F.col("n_chars").cast("double").alias("exact_value"),
                mf_ok,
            )
        )
    )
    ms = stream_manifest_ingest(spark, sf_dir).select(
        F.lit("manifest_stream").alias("method"),
        F.lit("all").alias("k1"),
        F.col("n_docs").cast("double").alias("exact_value"),
        F.col("stream_equals_oneshot").alias("ok"),
    )
    return (
        prof_rows.unionByName(hll)
        .unionByName(q)
        .unionByName(tk)
        .unionByName(mf)
        .unionByName(ms)
    )


def corpus_export_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four training-shard export certifications, tagged by format:
    parquet shards, gzip JSON-Lines shards, WebDataset-style tar
    shards, and the binary-payload multimodal tar twin — each proven
    against a read-back of its own written files (the tar rows against
    a parse of the tars, the media row additionally byte-for-byte on
    every payload member)."""
    from .curation import (
        corpus_export_jsonl,
        corpus_export_shards,
        corpus_export_tar,
    )
    from .extensions import multimodal_export_tar

    p = corpus_export_shards(spark, sf_dir).select(
        F.lit("parquet").alias("fmt"), "n_kept", "total_tokens", "manifest_consistent"
    )
    j = corpus_export_jsonl(spark, sf_dir).select(
        F.lit("jsonl").alias("fmt"), "n_kept", "total_tokens", "manifest_consistent"
    )
    t = corpus_export_tar(spark, sf_dir).select(
        F.lit("tar").alias("fmt"), "n_kept", "total_tokens", "manifest_consistent"
    )
    mm = multimodal_export_tar(spark, sf_dir).select(
        F.lit("media_tar").alias("fmt"),
        F.col("n_media").alias("n_kept"),
        F.col("total_bytes").alias("total_tokens"),
        "manifest_consistent",
    )
    return p.unionByName(j).unionByName(t).unionByName(mm)


def text_ranking_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical ranked retrieval: BM25 top-k (k1=doc_id, k2=n_terms_hit)
    + TF-IDF doc-to-doc argmax (k1=src, k2=dst), tagged by scorer —
    plus (round-9 fold) the store-backed BM25 twins: the batched-ingest
    persisted inverted index, the foreachBatch streaming-ingest store,
    and the delete lifecycle's tombstone-time (logical) and
    post-compaction (physical) answers, each value-identical to an
    independent DuckDB recompute of the corresponding corpus scan."""

    def _bm(tag: str, df: DataFrame) -> DataFrame:
        return df.select(
            F.lit(tag).alias("method"),
            F.col("doc_id").cast("bigint").alias("k1"),
            F.col("n_terms_hit").cast("bigint").alias("k2"),
            F.col("score").cast("double").alias("score"),
            F.col("rk").cast("int").alias("rk"),
        )

    bm = _bm("bm25", text_bm25_topk(spark, sf_dir))
    tf = text_tfidf_docsim(spark, sf_dir).select(
        F.lit("tfidf").alias("method"),
        F.col("src").cast("bigint").alias("k1"),
        F.col("dst").cast("bigint").alias("k2"),
        F.col("sim").cast("double").alias("score"),
        F.col("rk").cast("int").alias("rk"),
    )
    from .quality import text_bm25_indexed, text_bm25_indexed_deletes
    from .streaming_queries import stream_bm25_ingest

    bi = _bm("bm25_indexed", text_bm25_indexed(spark, sf_dir))
    bs = _bm("bm25_stream", stream_bm25_ingest(spark, sf_dir))
    bd = text_bm25_indexed_deletes(spark, sf_dir).select(
        F.concat(F.lit("bm25_del_"), F.col("phase")).alias("method"),
        F.col("doc_id").cast("bigint").alias("k1"),
        F.col("n_terms_hit").cast("bigint").alias("k2"),
        F.col("score").cast("double").alias("score"),
        F.col("rk").cast("int").alias("rk"),
    )
    return bm.unionByName(tf).unionByName(bi).unionByName(bs).unionByName(bd)


def stream_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The genuinely-streaming §2.7 oracle rows folded into one driver
    slot, tagged by member — each runs a REAL StreamingQuery inside the
    callable: the ``applyInPandasWithState`` latest-state fold, the
    watermarked tumbling-window counts, the watermarked stream-stream
    interval join, and the in-stream HLL distinct-per-window sketch.
    Null-padded wide union so every member keeps its native column
    types in the value hash.

    (rotation note, round 6: REPLACED the bare ``stream_latest_state``
    and ``stream_windowed_counts`` registry slots, admitting the new
    ``stream_stream_join`` and ``stream_windowed_distinct`` without
    widening the ≤50 surface; the freed slot went to
    ``cdc_consistency_check``.)"""
    from .streaming_queries import (
        stream_latest_state,
        stream_stream_join,
        stream_windowed_counts,
        stream_windowed_distinct,
    )

    def nb():
        return F.lit(None).cast("bigint")

    def nts():
        return F.lit(None).cast("timestamp")

    def ns():
        return F.lit(None).cast("string")

    def nbool():
        return F.lit(None).cast("boolean")

    ls = stream_latest_state(spark, sf_dir).select(
        F.lit("latest_state").alias("member"),
        "key", "seq", "ts", "value", "event_type", "deleted",
        nts().alias("win_start"), nts().alias("win_end"),
        ns().alias("table_name"), nb().alias("cnt"),
        nb().alias("i_seq"), nb().alias("u_seq"),
        nts().alias("i_ts"), nts().alias("u_ts"),
        nbool().alias("ok"),
    )
    wc = stream_windowed_counts(spark, sf_dir).select(
        F.lit("windowed_counts").alias("member"),
        nb().alias("key"), nb().alias("seq"), nts().alias("ts"),
        F.lit(None).cast("double").alias("value"),
        ns().alias("event_type"), ns().alias("deleted"),
        "win_start", "win_end", "table_name", "cnt",
        nb().alias("i_seq"), nb().alias("u_seq"),
        nts().alias("i_ts"), nts().alias("u_ts"),
        nbool().alias("ok"),
    )
    sj = stream_stream_join(spark, sf_dir).select(
        F.lit("stream_join").alias("member"),
        "key", nb().alias("seq"), nts().alias("ts"),
        F.lit(None).cast("double").alias("value"),
        ns().alias("event_type"), ns().alias("deleted"),
        nts().alias("win_start"), nts().alias("win_end"),
        ns().alias("table_name"), nb().alias("cnt"),
        "i_seq", "u_seq", "i_ts", "u_ts",
        nbool().alias("ok"),
    )
    wd = stream_windowed_distinct(spark, sf_dir).select(
        F.lit("windowed_distinct").alias("member"),
        nb().alias("key"), nb().alias("seq"), nts().alias("ts"),
        F.lit(None).cast("double").alias("value"),
        ns().alias("event_type"), ns().alias("deleted"),
        "win_start", "win_end", ns().alias("table_name"),
        F.col("n_exact").alias("cnt"),
        nb().alias("i_seq"), nb().alias("u_seq"),
        nts().alias("i_ts"), nts().alias("u_ts"),
        F.col("hll_ok").alias("ok"),
    )
    return ls.unionByName(wc).unionByName(sj).unionByName(wd)


def corpus_prep_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-PREP stage family as one tagged driver slot: token-
    budget sequence packing, the deterministic fixed-seed training-order
    shuffle, the adaptive percentile quality gate, and corpus-scale BPE
    encode with its decode-round-trip certificate.  Null-padded wide
    union (native types preserved per member).

    (rotation note, round 6: REPLACED the bare ``corpus_pack_sequences``
    slot, admitting the three new prep ops to the ≤50 hard signal.)"""
    from .curation import (
        corpus_pack_sequences,
        corpus_quality_gate_adaptive,
        corpus_shuffle_order,
    )
    from .extensions import text_bpe_encode

    def nb():
        return F.lit(None).cast("bigint")

    def ns():
        return F.lit(None).cast("string")

    def nd():
        return F.lit(None).cast("double")

    def nbool():
        return F.lit(None).cast("boolean")

    pack = corpus_pack_sequences(spark, sf_dir).select(
        F.lit("pack").alias("member"),
        F.col("shard").cast("bigint").alias("k1"),
        F.col("seq_id").cast("bigint").alias("k2"),
        F.col("n_docs").cast("bigint").alias("n1"),
        F.col("seq_tokens").cast("bigint").alias("n2"),
        ns().alias("s1"), ns().alias("s2"), nd().alias("d1"),
        nbool().alias("ok"),
    )
    shuf = corpus_shuffle_order(spark, sf_dir).select(
        F.lit("shuffle").alias("member"),
        F.col("shard").cast("bigint").alias("k1"),
        nb().alias("k2"),
        F.col("n_docs").cast("bigint").alias("n1"),
        F.col("xor_key").cast("bigint").alias("n2"),
        F.col("source").alias("s1"),
        F.col("head_ids").alias("s2"),
        nd().alias("d1"), nbool().alias("ok"),
    )
    gate = corpus_quality_gate_adaptive(spark, sf_dir).select(
        F.lit("quality_gate").alias("member"),
        nb().alias("k1"), nb().alias("k2"),
        F.col("n_total").cast("bigint").alias("n1"),
        F.col("n_kept").cast("bigint").alias("n2"),
        F.col("lang").alias("s1"), ns().alias("s2"),
        F.col("threshold").cast("double").alias("d1"),
        nbool().alias("ok"),
    )
    enc = text_bpe_encode(spark, sf_dir).select(
        F.lit("bpe_encode").alias("member"),
        F.col("doc_id").cast("bigint").alias("k1"),
        F.col("n_words").cast("bigint").alias("k2"),
        nb().alias("n1"), nb().alias("n2"),
        F.col("roundtrip_md5").alias("s1"), ns().alias("s2"),
        nd().alias("d1"),
        F.col("tokens_in_bounds").alias("ok"),
    )
    return pack.unionByName(shuf).unionByName(gate).unionByName(enc)


def dedup_incr_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental-dedup family (maintained stores, not per-run
    recomputes) + the exact-substring one-shot it certifies against,
    as one tagged row set on the report schema
    (step, doc_id, n_tokens, n_removed, kept_hash):

    - ``substr_report``  — the FULL ExactSubstr removal report (one row
      per doc, every value hashed by the driver);
    - ``substr_incr``    — the gram-store certification scalars packed
      as doc_id=n_docs, n_tokens=n_mismatch, n_removed=replay_noop;
    - ``minhash_incr``   — the MinHash index certification scalars
      packed as doc_id=n_planted, n_tokens=recall_ok,
      n_removed=incremental_equals_full;
    - ``minhash_del`` / ``substr_del`` (round-9 fold, landing round) —
      the two stores' DELETE-lifecycle certs packed as
      doc_id=n_deleted, n_tokens=logical flag, n_removed=physical
      flag, kept_hash=reingest flag ('true'/'false');
    - ``substr_stream`` (round-9 fold) — the gram store's foreachBatch
      streaming-ingest twin packed as doc_id=n_docs,
      n_tokens=n_mismatch, n_removed=meta_adopted;
    - ``cluster_incr`` (round-11 fold, landing round) — the maintained
      cluster table's incremental==one-shot closure cert packed as
      doc_id=n_nodes, n_tokens=n_components, n_removed=equality flag,
      kept_hash=replay_noop ('true'/'false');
    - ``cluster_stream`` (round-11 fold, landing round) — the cluster
      store's foreachBatch streaming twin packed as doc_id=n_docs,
      n_removed=stream_equals_oneshot flag.
    """
    mh = dedup_incremental(spark, sf_dir).select(
        F.lit("minhash_incr").alias("step"),
        F.col("n_planted").cast("bigint").alias("doc_id"),
        F.when(F.col("recall_ok"), 1).otherwise(0).cast("bigint").alias("n_tokens"),
        F.when(F.col("incremental_equals_full"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("n_removed"),
        F.lit("").alias("kept_hash"),
    )
    one = corpus_substring_dedup(spark, sf_dir).select(
        F.lit("substr_report").alias("step"),
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("n_removed").cast("bigint").alias("n_removed"),
        "kept_hash",
    )
    inc = dedup_substring_incremental(spark, sf_dir).select(
        F.lit("substr_incr").alias("step"),
        F.col("n_docs").cast("bigint").alias("doc_id"),
        F.col("n_mismatch").cast("bigint").alias("n_tokens"),
        F.when(F.col("replay_noop"), 1).otherwise(0).cast("bigint").alias("n_removed"),
        F.lit("").alias("kept_hash"),
    )
    from .curation import dedup_substring_index_deletes
    from .extensions import dedup_minhash_index_deletes

    mhd = dedup_minhash_index_deletes(spark, sf_dir).select(
        F.lit("minhash_del").alias("step"),
        F.col("n_deleted").cast("bigint").alias("doc_id"),
        F.col("logical_identical").cast("bigint").alias("n_tokens"),
        F.col("physical_store_ok").cast("bigint").alias("n_removed"),
        F.col("reingest_ok").cast("string").alias("kept_hash"),
    )
    ssd = dedup_substring_index_deletes(spark, sf_dir).select(
        F.lit("substr_del").alias("step"),
        F.col("n_deleted").cast("bigint").alias("doc_id"),
        F.col("logical_grams_exact").cast("bigint").alias("n_tokens"),
        F.col("physical_firsts_exact").cast("bigint").alias("n_removed"),
        F.col("reingest_ok").cast("string").alias("kept_hash"),
    )
    from .streaming_queries import stream_substring_ingest

    sst = stream_substring_ingest(spark, sf_dir).select(
        F.lit("substr_stream").alias("step"),
        F.col("n_docs").cast("bigint").alias("doc_id"),
        F.col("n_mismatch").cast("bigint").alias("n_tokens"),
        F.col("meta_adopted").cast("bigint").alias("n_removed"),
        F.lit("").alias("kept_hash"),
    )
    from .curation import dedup_cluster_incremental
    from .streaming_queries import stream_cluster_ingest

    ccs = stream_cluster_ingest(spark, sf_dir).select(
        F.lit("cluster_stream").alias("step"),
        F.col("n_docs").cast("bigint").alias("doc_id"),
        F.lit(0).cast("bigint").alias("n_tokens"),
        F.when(F.col("stream_equals_oneshot"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("n_removed"),
        F.lit("").alias("kept_hash"),
    )
    cci = dedup_cluster_incremental(spark, sf_dir).select(
        F.lit("cluster_incr").alias("step"),
        F.col("n_nodes").cast("bigint").alias("doc_id"),
        F.col("n_components").cast("bigint").alias("n_tokens"),
        F.when(F.col("incremental_equals_oneshot"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("n_removed"),
        F.col("replay_noop").cast("string").alias("kept_hash"),
    )
    return (
        mh.unionByName(one)
        .unionByName(inc)
        .unionByName(mhd)
        .unionByName(ssd)
        .unionByName(sst)
        .unionByName(cci)
        .unionByName(ccs)
    )


QUERIES = {
    "q45_retention": q45_retention,
    "dedup_incr_suite": dedup_incr_suite,
    "stream_suite": stream_suite,
    "corpus_prep_suite": corpus_prep_suite,
    "cdc_apply_suite": cdc_apply_suite,
    "cdc_insupd_suite": cdc_insupd_suite,
    "dedup_cert_suite": dedup_cert_suite,
    "ann_recall_suite": ann_recall_suite,
    "text_ranking_suite": text_ranking_suite,
    "corpus_export_suite": corpus_export_suite,
    "sketch_suite": sketch_suite,
}

# Each suite oracle is the UNION of its members' oracles (imported, not
# restated, so member and suite can never drift), wrapped with the same
# tag + casts as the Spark side.
ORACLE = {
    "q45_retention": f"""
SELECT 'q4_probe' AS step, CAST(id_max AS BIGINT) AS value
FROM ({corpus.ORACLE["q4_retention_probe"]}) __q4
UNION ALL
SELECT 'q5_count' AS step, CAST(del_count AS BIGINT) AS value
FROM ({corpus.ORACLE["q5_retention_count"]}) __q5
""",
    "dedup_incr_suite": f"""
SELECT 'minhash_incr' AS step, CAST(n_planted AS BIGINT) AS doc_id,
       CAST(CASE WHEN recall_ok THEN 1 ELSE 0 END AS BIGINT) AS n_tokens,
       CAST(CASE WHEN incremental_equals_full THEN 1 ELSE 0 END AS BIGINT)
         AS n_removed,
       '' AS kept_hash
FROM ({extensions.ORACLE["dedup_incremental"]}) __mi
UNION ALL
SELECT 'substr_report' AS step, CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_removed AS BIGINT) AS n_removed, kept_hash
FROM ({curation.ORACLE["corpus_substring_dedup"]}) __so
UNION ALL
SELECT 'substr_incr' AS step, CAST(n_docs AS BIGINT) AS doc_id,
       CAST(n_mismatch AS BIGINT) AS n_tokens,
       CAST(CASE WHEN replay_noop THEN 1 ELSE 0 END AS BIGINT) AS n_removed,
       '' AS kept_hash
FROM ({curation.ORACLE["dedup_substring_incremental"]}) __si
UNION ALL
SELECT 'minhash_del' AS step, CAST(n_deleted AS BIGINT) AS doc_id,
       CAST(logical_identical AS BIGINT) AS n_tokens,
       CAST(physical_store_ok AS BIGINT) AS n_removed,
       CAST(reingest_ok AS VARCHAR) AS kept_hash
FROM ({extensions.ORACLE["dedup_minhash_index_deletes"]}) __md
UNION ALL
SELECT 'substr_del' AS step, CAST(n_deleted AS BIGINT) AS doc_id,
       CAST(logical_grams_exact AS BIGINT) AS n_tokens,
       CAST(physical_firsts_exact AS BIGINT) AS n_removed,
       CAST(reingest_ok AS VARCHAR) AS kept_hash
FROM ({curation.ORACLE["dedup_substring_index_deletes"]}) __sd2
UNION ALL
SELECT 'substr_stream' AS step, CAST(n_docs AS BIGINT) AS doc_id,
       CAST(n_mismatch AS BIGINT) AS n_tokens,
       CAST(meta_adopted AS BIGINT) AS n_removed,
       '' AS kept_hash
FROM ({streaming_queries.ORACLE["stream_substring_ingest"]}) __ss
UNION ALL
SELECT 'cluster_stream' AS step, CAST(n_docs AS BIGINT) AS doc_id,
       CAST(0 AS BIGINT) AS n_tokens,
       CAST(CASE WHEN stream_equals_oneshot THEN 1 ELSE 0 END AS BIGINT)
         AS n_removed,
       '' AS kept_hash
FROM ({streaming_queries.ORACLE["stream_cluster_ingest"]}) __cs
UNION ALL
SELECT 'cluster_incr' AS step, CAST(n_nodes AS BIGINT) AS doc_id,
       CAST(n_components AS BIGINT) AS n_tokens,
       CAST(CASE WHEN incremental_equals_oneshot THEN 1 ELSE 0 END AS BIGINT)
         AS n_removed,
       CAST(replay_noop AS VARCHAR) AS kept_hash
FROM ({curation.ORACLE["dedup_cluster_incremental"]}) __ci
""",
    "cdc_apply_suite": f"""
SELECT 'append' AS mode, key, seq, file_seq, ts, value, event_type
FROM ({cdc.ORACLE["cdc_apply_append"]}) __a
UNION ALL
SELECT 'mutate' AS mode, key, seq, file_seq, ts, value, event_type
FROM ({cdc.ORACLE["cdc_apply_mutate"]}) __m
""",
    "cdc_insupd_suite": f"""
SELECT 'versions' AS mode, key, dateid, ts, value, event_type
FROM ({cdc.ORACLE["cdc_apply_ins_upd"]}) __v
UNION ALL
SELECT 'latest' AS mode, key, dateid, ts, value, event_type
FROM ({cdc.ORACLE["cdc_latest_state"]}) __l
""",
    "dedup_cert_suite": f"""
SELECT 'minhash_lsh' AS method, CAST(n_planted AS BIGINT) AS n, recall_ok AS ok
FROM ({extensions.ORACLE["dedup_minhash_lsh_recall"]}) __mh
UNION ALL
SELECT 'simhash_locality' AS method, CAST(n_pairs AS BIGINT) AS n, locality_ok AS ok
FROM ({extensions.ORACLE["dedup_simhash_locality"]}) __sl
UNION ALL
SELECT 'simhash_banding' AS method, CAST(n_docs AS BIGINT) AS n, banding_exact AS ok
FROM ({extensions.ORACLE["dedup_simhash_pairs_exact"]}) __sb
UNION ALL
SELECT 'semdedup' AS method, CAST(n_vectors AS BIGINT) AS n, planted_all_dropped AS ok
FROM ({extensions.ORACLE["semdedup_recall"]}) __sd
UNION ALL
SELECT 'simhash_incr' AS method, CAST(n_docs AS BIGINT) AS n,
       (incremental_equals_full AND replay_noop) AS ok
FROM ({extensions.ORACLE["dedup_simhash_incremental"]}) __shi
UNION ALL
SELECT 'simhash_incr_del' AS method, CAST(n_deleted AS BIGINT) AS n,
       (logical_identical AND physical_store_ok AND reingest_ok) AS ok
FROM ({extensions.ORACLE["dedup_simhash_index_deletes"]}) __shd
UNION ALL
SELECT 'simhash_stream' AS method, CAST(n_docs AS BIGINT) AS n,
       stream_equals_oneshot AS ok
FROM ({streaming_queries.ORACLE["stream_simhash_ingest"]}) __shs
UNION ALL
SELECT store || '_probe' AS method, CAST(n_probed AS BIGINT) AS n,
       (matches_equal_oneshot AND store_untouched) AS ok
FROM ({extensions.ORACLE["dedup_index_probe"]}) __shp
""",
    "ann_recall_suite": f"""
SELECT 'lsh' AS method, CAST(qid AS BIGINT) AS n, recall_ok AS ok
FROM ({extensions.ORACLE["ann_lsh_recall"]}) __l
UNION ALL
SELECT 'ivf' AS method, CAST(qid AS BIGINT) AS n, recall_ok AS ok
FROM ({extensions.ORACLE["ann_ivf_recall"]}) __i
UNION ALL
SELECT 'pq' AS method, CAST(qid AS BIGINT) AS n, recall_ok AS ok
FROM ({extensions.ORACLE["ann_pq_recall"]}) __p
UNION ALL
SELECT 'ivfpq' AS method, CAST(qid AS BIGINT) AS n, recall_ok AS ok
FROM ({extensions.ORACLE["ann_ivfpq_recall"]}) __ip
UNION ALL
SELECT 'knn_graph' AS method, CAST(n_nodes AS BIGINT) AS n,
       (coverage_ok AND recall_ok) AS ok
FROM ({extensions.ORACLE["ann_knn_graph_recall"]}) __kg
UNION ALL
SELECT 'ivf_partitioned' AS method, CAST(n_rows AS BIGINT) AS n,
       (n_mismatch = 0) AS ok
FROM ({extensions.ORACLE["ann_ivf_partitioned_equiv"]}) __pe
UNION ALL
SELECT 'ivf_incremental' AS method, CAST(n_indexed AS BIGINT) AS n,
       (n_mismatch = 0 AND files_reduced AND post_compact_identical) AS ok
FROM ({extensions.ORACLE["ann_ivf_incremental"]}) __inc
UNION ALL
SELECT 'ivf_stream' AS method, CAST(n_indexed AS BIGINT) AS n,
       (n_mismatch = 0 AND manifest_adopted) AS ok
FROM ({streaming_queries.ORACLE["stream_ivf_ingest"]}) __st
UNION ALL
SELECT 'ivf_deletes' AS method, CAST(n_deleted AS BIGINT) AS n,
       (logical_identical AND physical_identical AND reingest_ok) AS ok
FROM ({extensions.ORACLE["ann_ivf_deletes"]}) __del
""",
    "text_ranking_suite": f"""
SELECT 'bm25' AS method, CAST(doc_id AS BIGINT) AS k1,
       CAST(n_terms_hit AS BIGINT) AS k2, CAST(score AS DOUBLE) AS score,
       CAST(rk AS INT) AS rk
FROM ({quality.ORACLE["text_bm25_topk"]}) __bm
UNION ALL
SELECT 'tfidf' AS method, CAST(src AS BIGINT) AS k1,
       CAST(dst AS BIGINT) AS k2, CAST(sim AS DOUBLE) AS score,
       CAST(rk AS INT) AS rk
FROM ({quality.ORACLE["text_tfidf_docsim"]}) __tf
UNION ALL
SELECT 'bm25_indexed' AS method, CAST(doc_id AS BIGINT) AS k1,
       CAST(n_terms_hit AS BIGINT) AS k2, CAST(score AS DOUBLE) AS score,
       CAST(rk AS INT) AS rk
FROM ({quality.ORACLE["text_bm25_indexed"]}) __bi
UNION ALL
SELECT 'bm25_stream' AS method, CAST(doc_id AS BIGINT) AS k1,
       CAST(n_terms_hit AS BIGINT) AS k2, CAST(score AS DOUBLE) AS score,
       CAST(rk AS INT) AS rk
FROM ({streaming_queries.ORACLE["stream_bm25_ingest"]}) __bs
UNION ALL
SELECT 'bm25_del_' || phase AS method, CAST(doc_id AS BIGINT) AS k1,
       CAST(n_terms_hit AS BIGINT) AS k2, CAST(score AS DOUBLE) AS score,
       CAST(rk AS INT) AS rk
FROM ({quality.ORACLE["text_bm25_indexed_deletes"]}) __bd
""",
    "sketch_suite": f"""
SELECT 'profile_hll' AS method, 'all' AS k1,
       CAST(n_users_exact AS DOUBLE) AS exact_value, hll_ok AS ok
FROM ({corpus.ORACLE["events_approx_profile"]}) __p1
UNION ALL
SELECT 'profile_p50' AS method, 'all' AS k1,
       CAST(p50_exact AS DOUBLE) AS exact_value, p50_sketch_ok AS ok
FROM ({corpus.ORACLE["events_approx_profile"]}) __p2
UNION ALL
SELECT 'hll_distinct' AS method, scope AS k1,
       CAST(n_exact AS DOUBLE) AS exact_value, est_ok AS ok
FROM ({extensions.ORACLE["events_hll_distinct"]}) __h
UNION ALL
SELECT 'quantile' AS method,
       event_type || '@' || CAST(p AS VARCHAR) AS k1,
       CAST(exact_value AS DOUBLE) AS exact_value, in_bounds AS ok
FROM ({extensions.ORACLE["events_quantile_sketch"]}) __q
UNION ALL
SELECT 'topk' AS method, token AS k1,
       CAST(cnt AS DOUBLE) AS exact_value, sketch_ok AS ok
FROM ({extensions.ORACLE["text_topk_sketch"]}) __t
UNION ALL
SELECT 'manifest_incr' AS method, 'n_docs' AS k1,
       CAST(n_docs AS DOUBLE) AS exact_value,
       (incremental_equals_oneshot AND distinct_est_ok AND replay_noop) AS ok
FROM ({extensions.ORACLE["corpus_manifest_incremental"]}) __m1
UNION ALL
SELECT 'manifest_incr' AS method, 'n_tokens' AS k1,
       CAST(n_tokens AS DOUBLE) AS exact_value,
       (incremental_equals_oneshot AND distinct_est_ok AND replay_noop) AS ok
FROM ({extensions.ORACLE["corpus_manifest_incremental"]}) __m2
UNION ALL
SELECT 'manifest_incr' AS method, 'n_chars' AS k1,
       CAST(n_chars AS DOUBLE) AS exact_value,
       (incremental_equals_oneshot AND distinct_est_ok AND replay_noop) AS ok
FROM ({extensions.ORACLE["corpus_manifest_incremental"]}) __m3
UNION ALL
SELECT 'manifest_stream' AS method, 'all' AS k1,
       CAST(n_docs AS DOUBLE) AS exact_value, stream_equals_oneshot AS ok
FROM ({streaming_queries.ORACLE["stream_manifest_ingest"]}) __ms
""",
    "corpus_export_suite": f"""
SELECT 'parquet' AS fmt, n_kept, total_tokens, manifest_consistent
FROM ({curation.EXPORT_CERT_SQL}) __p
UNION ALL
SELECT 'jsonl' AS fmt, n_kept, total_tokens, manifest_consistent
FROM ({curation.EXPORT_CERT_SQL}) __j
UNION ALL
SELECT 'tar' AS fmt, n_kept, total_tokens, manifest_consistent
FROM ({curation.EXPORT_CERT_SQL}) __t
UNION ALL
SELECT 'media_tar' AS fmt, n_media AS n_kept, total_bytes AS total_tokens,
       manifest_consistent
FROM ({extensions.ORACLE["multimodal_export_tar"]}) __mm
""",
    "stream_suite": f"""
SELECT 'latest_state' AS member, key, seq, ts, value, event_type, deleted,
       CAST(NULL AS TIMESTAMP) AS win_start, CAST(NULL AS TIMESTAMP) AS win_end,
       CAST(NULL AS VARCHAR) AS table_name, CAST(NULL AS BIGINT) AS cnt,
       CAST(NULL AS BIGINT) AS i_seq, CAST(NULL AS BIGINT) AS u_seq,
       CAST(NULL AS TIMESTAMP) AS i_ts, CAST(NULL AS TIMESTAMP) AS u_ts,
       CAST(NULL AS BOOLEAN) AS ok
FROM ({streaming_queries.ORACLE["stream_latest_state"]}) __ls
UNION ALL
SELECT 'windowed_counts' AS member, CAST(NULL AS BIGINT) AS key,
       CAST(NULL AS BIGINT) AS seq, CAST(NULL AS TIMESTAMP) AS ts,
       CAST(NULL AS DOUBLE) AS value, CAST(NULL AS VARCHAR) AS event_type,
       CAST(NULL AS VARCHAR) AS deleted,
       win_start, win_end, table_name, cnt,
       CAST(NULL AS BIGINT) AS i_seq, CAST(NULL AS BIGINT) AS u_seq,
       CAST(NULL AS TIMESTAMP) AS i_ts, CAST(NULL AS TIMESTAMP) AS u_ts,
       CAST(NULL AS BOOLEAN) AS ok
FROM ({streaming_queries.ORACLE["stream_windowed_counts"]}) __wc
UNION ALL
SELECT 'stream_join' AS member, key, CAST(NULL AS BIGINT) AS seq,
       CAST(NULL AS TIMESTAMP) AS ts, CAST(NULL AS DOUBLE) AS value,
       CAST(NULL AS VARCHAR) AS event_type, CAST(NULL AS VARCHAR) AS deleted,
       CAST(NULL AS TIMESTAMP) AS win_start, CAST(NULL AS TIMESTAMP) AS win_end,
       CAST(NULL AS VARCHAR) AS table_name, CAST(NULL AS BIGINT) AS cnt,
       i_seq, u_seq, i_ts, u_ts, CAST(NULL AS BOOLEAN) AS ok
FROM ({streaming_queries.ORACLE["stream_stream_join"]}) __sj
UNION ALL
SELECT 'windowed_distinct' AS member, CAST(NULL AS BIGINT) AS key,
       CAST(NULL AS BIGINT) AS seq, CAST(NULL AS TIMESTAMP) AS ts,
       CAST(NULL AS DOUBLE) AS value, CAST(NULL AS VARCHAR) AS event_type,
       CAST(NULL AS VARCHAR) AS deleted,
       win_start, win_end, CAST(NULL AS VARCHAR) AS table_name,
       n_exact AS cnt,
       CAST(NULL AS BIGINT) AS i_seq, CAST(NULL AS BIGINT) AS u_seq,
       CAST(NULL AS TIMESTAMP) AS i_ts, CAST(NULL AS TIMESTAMP) AS u_ts,
       hll_ok AS ok
FROM ({streaming_queries.ORACLE["stream_windowed_distinct"]}) __wd
""",
    "corpus_prep_suite": f"""
SELECT 'pack' AS member, CAST(shard AS BIGINT) AS k1,
       CAST(seq_id AS BIGINT) AS k2, CAST(n_docs AS BIGINT) AS n1,
       CAST(seq_tokens AS BIGINT) AS n2,
       CAST(NULL AS VARCHAR) AS s1, CAST(NULL AS VARCHAR) AS s2,
       CAST(NULL AS DOUBLE) AS d1, CAST(NULL AS BOOLEAN) AS ok
FROM ({curation.ORACLE["corpus_pack_sequences"]}) __pk
UNION ALL
SELECT 'shuffle' AS member, CAST(shard AS BIGINT) AS k1,
       CAST(NULL AS BIGINT) AS k2, CAST(n_docs AS BIGINT) AS n1,
       CAST(xor_key AS BIGINT) AS n2, source AS s1, head_ids AS s2,
       CAST(NULL AS DOUBLE) AS d1, CAST(NULL AS BOOLEAN) AS ok
FROM ({curation.ORACLE["corpus_shuffle_order"]}) __sh
UNION ALL
SELECT 'quality_gate' AS member, CAST(NULL AS BIGINT) AS k1,
       CAST(NULL AS BIGINT) AS k2, CAST(n_total AS BIGINT) AS n1,
       CAST(n_kept AS BIGINT) AS n2, lang AS s1,
       CAST(NULL AS VARCHAR) AS s2, CAST(threshold AS DOUBLE) AS d1,
       CAST(NULL AS BOOLEAN) AS ok
FROM ({curation.ORACLE["corpus_quality_gate_adaptive"]}) __qg
UNION ALL
SELECT 'bpe_encode' AS member, CAST(doc_id AS BIGINT) AS k1,
       CAST(n_words AS BIGINT) AS k2, CAST(NULL AS BIGINT) AS n1,
       CAST(NULL AS BIGINT) AS n2, roundtrip_md5 AS s1,
       CAST(NULL AS VARCHAR) AS s2, CAST(NULL AS DOUBLE) AS d1,
       tokens_in_bounds AS ok
FROM ({extensions.ORACLE["text_bpe_encode"]}) __be
""",
}
