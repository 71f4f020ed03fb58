"""Query registry.

Two surfaces:

- ``all_queries()`` / ``all_oracles()`` — the CURATED driver registry:
  exactly ``len(CORE_QUERY_KEYS)`` entries (≤50), one per operator
  family member, EVERY entry oracle-checked. The correctness driver
  records at most ~50 registry rows per round (CORRECTNESS_r02.json
  held exactly the first 50 of 97 registered queries, silently dropping
  whole families from the hard signal), so near-duplicate plan variants
  and certification twins are folded into suite rows (``plans.suites``)
  or demoted to the extended registry.

- ``all_queries_extended()`` / ``all_oracles_extended()`` — everything:
  the curated set PLUS every un-folded variant (q1 plan forms, rows-only
  hash-family outputs, per-member twins, secondary analytics).
  ``scripts/check_parity.py`` and ``tests/test_oracle_parity.py`` run
  THIS set, so demotion from the driver registry never loses
  correctness coverage.
"""

from . import (  # noqa: F401
    cdc,
    corpus,
    curation,
    extensions,
    quality,
    sql_corpus,
    streaming_queries,
    suites,
)

_MODULES = (corpus, cdc, extensions, curation, quality, streaming_queries, sql_corpus, suites)

#: The curated driver registry, in priority order (the driver records a
#: prefix if it caps below this length). One entry per §2 family member
#: / extension family; see plans/suites.py for the member → suite map.
CORE_QUERY_KEYS = (
    # --- §2.5 SQL corpus Q1-Q13 (Q6 = cdc_binlog_purge below) ---
    "q1_latest_window",          # canonical Q1 (join/argmax/coarse forms: extended)
    "q2_duplicate_audit",
    "q3_dedup_window",
    "q45_retention",             # suite: Q4 probe + Q5 count
    "q7_argmax_checkpoint",
    "q8_daily_volume",
    "q9_union_minima",
    "q10_regional_revenue",      # flagship
    "q11_force_resync",
    "q12_ledger_prune",
    "q13_supplier_part_margin",
    # --- events analytics (funnel/cohort/percentiles/session_window
    #     stay driver-visible as sql_corpus_parity rows) ---
    "events_sessionize",
    "events_asof_join",
    "events_range_join",
    "sketch_suite",              # suite: approx profile + HLL distincts + GK quantiles
                                 # (rotation r5: replaced bare events_approx_profile)
    "table_profile_orders",
    "sql_corpus_parity",         # certifies all 23 literal-SQL statements
    # --- CDC core (§2.1-§2.4) ---
    "cdc_apply_suite",           # suite: P4 append + P7/P9 mutate
    "cdc_insupd_suite",          # suite: P5/P6 versions + Q1 latest
    "cdc_old_delete_rejection",  # F6
    "cdc_filters",               # F1-F5
    "cdc_value_norm",            # P2
    "cdc_txn_attribution",       # G1
    "cdc_ledger_summary",        # S5
    "cdc_binlog_catalog",        # S2
    "cdc_binlog_purge",          # Q6 guard
    "cdc_json_roundtrip",        # S1 JSON envelope
    "cdc_replication_e2e",       # the runner end-to-end (B1-B4, S5/S6)
    "cdc_consistency_check",     # source-vs-target checksum verify
                                 # (reference README.md:259-278; slot freed
                                 # by the r6 stream_suite fold)
    # --- dedup family ---
    "dedup_exact",
    "dedup_cert_suite",          # suite: minhash/simhash/semdedup twins
    "dedup_incr_suite",          # suite: MinHash index lifecycle +
                                 # ExactSubstr full report + gram-store
                                 # incremental cert (rotation r9:
                                 # replaced bare dedup_incremental so
                                 # the substring family is driver-visible)
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "dedup_cluster_cc",
    # --- ANN / embeddings ---
    "ann_cosine_topk",
    "ann_recall_suite",          # suite: lsh/ivf/pq/ivfpq/knn/partitioned twins
    "embedding_quantize",
    # --- multimodal ---
    "multimodal_frames",
    # --- text analysis / quality ---
    "text_stats",
    "text_bpe_train",
    "text_quality_gopher",
    "text_pii_redact",
    "text_ranking_suite",        # suite: BM25 + TF-IDF docsim
    "text_strip_boilerplate",
    # --- curation pipeline ---
    "corpus_curation",
    "corpus_decontaminate",
    "corpus_prep_suite",        # suite: pack + shuffle-order + adaptive
                                # gate + BPE encode (rotation r6:
                                # replaced bare corpus_pack_sequences)
    "corpus_export_suite",       # suite: parquet + jsonl.gz export certs
                                 # (replaced corpus_export_shards, r4)
    # --- structured streaming ---
    "stream_suite",              # suite: stateful latest + watermarked
                                 # windows + stream-stream interval join
                                 # (rotation r6: replaced the two bare
                                 # stream_* slots)
)


def all_queries_extended():
    q = {}
    for m in _MODULES:
        q.update(m.QUERIES)
    return q


def all_oracles_extended():
    o = {}
    for m in _MODULES:
        o.update(m.ORACLE)
    return o


def all_queries():
    q = all_queries_extended()
    return {k: q[k] for k in CORE_QUERY_KEYS}


def all_oracles():
    o = all_oracles_extended()
    return {k: o[k] for k in CORE_QUERY_KEYS if k in o}
