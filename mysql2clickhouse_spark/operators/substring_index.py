"""Incremental exact-substring dedup — the ExactSubstr pass as a
MAINTAINED store, not a per-run recompute.

``functions.text.substring_dedup`` re-tokenizes and re-grams the whole
corpus every invocation — right for a one-shot audit, O(corpus) work
per O(batch) new data for an ingest pipeline (the same scale-killer
``operators/neardup_index.py`` removes for MinHash). This operator
persists the one derived table the incremental pass needs:

- ``firsts/`` — (gram, doc_id, s): the FIRST occurrence of every
  k-gram ever ingested (gram strings, not digests — same exactness
  contract as the one-shot: a digest collision would silently delete a
  non-duplicate span). Written BUCKETED on ``gram`` (a Spark bucketed
  table registered over this location), so the per-batch membership
  join reads the store with its layout: the store side of the join is
  never exchanged — only the batch's grams shuffle, O(batch) rows per
  ingest no matter how large the store grows (plan-pinned in
  ``tests/test_plan_shapes.py``).
- ``docs/``   — (doc_id,): the ingest ledger, so a replayed batch is
  dropped up front (at-least-once delivery appends nothing twice).
- ``tombstones/`` — (doc_id,): the delete lifecycle (round 9, same
  discipline as ``BM25Index``/``IVFIndex``/``MinHashIndex``):
  ``remove_batch`` journals deletions; grams OWNED by a tombstoned doc
  are logically absent from the membership view (FORGET semantics —
  a later occurrence re-claims the gram; degradation direction is
  missed dedup, never false removal — see ``remove_batch``);
  ``compact`` applies tombstones physically and clears them.

Per batch, ``add_batch``:

1. rolls forward / clears any interrupted prior ingest (``recover``);
2. tokenizes and grams the BATCH only (one scan of the new text);
3. marks an occurrence duplicated iff its gram is in the store OR an
   earlier occurrence exists within the batch (the batch-local
   min-struct groupBy — identical aggregation to the one-shot);
4. produces the per-doc removal report via the SHARED
   ``removal_report`` (the one-shot and incremental paths cannot
   drift — same window rule, same reassembly, same hash);
5. commits the batch's NEW first occurrences and its doc ids to the
   store ATOMICALLY: both appends are staged under
   ``__ingest_staging/``, an ``_INGEST_COMMIT`` marker is written
   (atomic rename), then the staged files are promoted into the live
   dirs by pure renames. A crash before the marker leaves the store
   untouched (debris cleared, replay re-judges cleanly); a crash after
   it is rolled forward by the next ``recover()`` — the firsts append
   and the docs-ledger append can never land separately, so a replay
   is NEVER judged against its own grams (the corruption window the
   r8 verdict flagged; ``tests/test_crash_matrix.py`` drives both
   fault points). Same commit-marker discipline as the neardup index's
   journaled compaction and the runner's journaled swaps.

Precedence contract: the store encodes FIRST-SEEN order. When batches
partition the corpus into ascending id ranges, first-seen order equals
the one-shot's lexicographic (id, position) order and the union of
batch reports is EXACTLY the one-shot report (``test_substring_index``
pins it; the ``dedup_substring_incremental`` oracle row certifies it
at corpus scale). Under arbitrary arrival order the semantics remain
well-defined — arrival precedence, the production contract for a
stream that never re-orders history.

Scale: the batch-vs-store membership join is the cost center — batch
grams (O(batch×tokens) rows) against the store's gram column. The
bucketed layout keeps that join store-shuffle-free at ANY store size:
each ingest exchanges only the batch's grams into the store's bucket
space (size ``n_buckets`` to the cluster — thousands at 100 TB; it is
fixed at store creation and recorded in ``_STORE_META``). Everything
else is batch-bounded. Single-writer discipline (no concurrent
``add_batch``) is the caller's lock, the reference's single-instance
rule (B5).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fs import fs_for
from ..functions.text import gram_rows, removal_report, tokenized_docs
from ..session import release_cache, rotate_cache
from .bucketed import BucketedStore
from .journal import StagedCommit
from .store_common import compact_hot_buckets, probe_pruned, single_writer

#: store geometry, written once per store: the bucket count is part of
#: the on-disk layout (bucket ids are baked into file names), so a
#: reopening index must adopt it rather than trust its constructor arg
_META = "_STORE_META"


class SubstringIndex:
    """A persisted first-occurrence k-gram store for incremental
    exact-substring dedup."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        k: int | None = 10,
        id_col: str = "doc_id",
        text_col: str = "text",
        n_buckets: int = 32,
    ):
        """``k=None`` ADOPTS the gram width from the store's meta — the
        path-only reopen shape a streaming ingest job uses (it knows
        only the store location); a fresh store requires an explicit
        ``k``. A mismatching explicit ``k`` still raises: silently
        re-gramming an existing store would corrupt it."""
        self.spark = spark
        self.path = path
        self.k = k
        self.id_col, self.text_col = id_col, text_col
        self.n_buckets = n_buckets
        self.fs = fs_for(spark, path)
        meta_path = os.path.join(path, _META)
        fresh = not self.fs.exists(meta_path)
        if fresh:
            if k is None:
                raise ValueError(f"no store at {path}: a new store needs k")
            # the geometry is part of the store identity — write it at
            # creation so a path-only (k=None) reopen works even before
            # the first ingest commits (add_batch re-writes it, which
            # is idempotent and keeps pre-existing stores valid)
            self.fs.makedirs(path)
            self.fs.write_text_atomic(
                meta_path, json.dumps({"k": k, "n_buckets": n_buckets})
            )
        else:
            meta = json.loads(self.fs.read_text(meta_path))
            if k is not None and meta["k"] != k:
                raise ValueError(
                    f"store at {path} was built with k={meta['k']}, got k={k}"
                )
            self.k = int(meta["k"])
            self.n_buckets = int(meta["n_buckets"])
        # catalog-fronted bucketed firsts table; the shared seam also
        # drops a stale catalog entry left by a previous (deleted)
        # store at this path
        self._store = BucketedStore(
            spark,
            lambda: self.fs,
            self.firsts_path,
            "gram",
            self.n_buckets,
            "m2c_ssidx_",
            fresh,
        )
        self._table = self._store.table

    @property
    def firsts_path(self) -> str:
        return os.path.join(self.path, "firsts")

    @property
    def docs_path(self) -> str:
        return os.path.join(self.path, "docs")

    @property
    def tombstones_path(self) -> str:
        return os.path.join(self.path, "tombstones")

    @property
    def staging_path(self) -> str:
        return os.path.join(self.path, "__ingest_staging")

    def _has_files(self, d: str) -> bool:
        return self._store.has_files(d)

    # --- journaled ingest commit ---------------------------------------------
    # the staged-commit protocol itself lives in operators/journal.py
    # (shared with BM25Index); constructed per call so crash tests can
    # swap self.fs after construction

    def _journal(self) -> StagedCommit:
        return StagedCommit(
            self.spark,
            self.fs,
            self.staging_path,
            (
                ("firsts", self.firsts_path),
                ("docs", self.docs_path),
                ("tombstones", self.tombstones_path),
            ),
            refresh_table=self._table,
        )

    def recover(self) -> int:
        """Converge any interrupted prior ingest — called at
        ``add_batch`` / ``compact`` entry. Returns the number of true
        roll-forwards; see ``journal.StagedCommit.recover``."""
        return self._journal().recover()

    def _tombstones(self) -> DataFrame | None:
        if not self._has_files(self.tombstones_path):
            return None
        return self.spark.read.parquet(self.tombstones_path)

    def _stored_grams(self, pruned_by: DataFrame | None = None) -> DataFrame:
        """The store's gram column THROUGH the bucketed table, so joins
        on ``gram`` inherit HashPartitioning(gram, n_buckets) from the
        scan itself — no Exchange ever sits above the store side.
        ``pruned_by`` (read-only probe path only): a frame whose
        ``gram`` column bounds the store read — the probe's own gram
        set is pushed into the scan so row-group stats skip everything
        else (``store_common.probe_pruned``); ingest always passes
        None and keeps the full-scan contract.
        Grams whose first-occurrence OWNER is tombstoned are logically
        absent (the minority tombstone set broadcasts into an anti-join
        above the scan — broadcast joins preserve the store's
        partitioning, so the no-Exchange plan pin holds). The store
        never shows two live rows per gram: a re-claimed gram's old row
        stays tombstone-filtered until compact physically drops it."""
        rows = self._store.read()
        if pruned_by is not None:
            rows = probe_pruned(
                rows, "gram", pruned_by,
                fs=self.fs, store_dir=self.firsts_path,
            )
        tombs = self._tombstones()
        if tombs is not None:
            rows = rows.join(F.broadcast(tombs), self.id_col, "left_anti")
        return rows.select("gram").withColumn("__stored", F.lit(1))

    @single_writer
    def remove_batch(self, ids: DataFrame) -> int:
        """Mark documents DELETED (tombstone append through the same
        journal — one committed table, crash-converged like ingest);
        returns the number newly tombstoned. Idempotent: ids never
        ingested, or already tombstoned, are dropped up front.

        Semantics — FORGET, the direction that can only miss dedup,
        never falsely remove: grams whose stored first occurrence
        belongs to a deleted doc are logically absent from the store
        (a later batch re-claims them as its own firsts; an exact copy
        of the deleted doc arriving later is judged FRESH for the
        grams it solely owned). Exact as-if-never-ingested ownership
        transfer is impossible from this store — it retains only FIRST
        occurrences, so the next-earliest occurrence of a forgotten
        gram is unknowable — and the report already issued for the
        deleted doc's own ingest is history, not state. ``compact``
        applies tombstones physically (firsts and ledger rows dropped,
        tombstones cleared), after which a deleted id may re-ingest as
        a brand-new document; pre-compact redelivery of a tombstoned
        id is dropped by the ledger anti-join (same epoch rule as
        ``BM25Index``)."""
        from .journal import journaled_tombstone_append

        self.recover()
        if not self._has_files(self.docs_path):
            return 0
        return journaled_tombstone_append(
            self._journal(),
            self.staging_path,
            ids,
            self.id_col,
            self.spark.read.parquet(self.docs_path).select(self.id_col),
            self._tombstones(),
        )

    def probe(self, batch: DataFrame) -> DataFrame:
        """READ-ONLY ExactSubstr judgment: the removal report
        ``add_batch`` would produce for this batch — duplicated spans
        judged against the store's live membership view AND earlier
        occurrences within the batch — with NOTHING committed (no
        ledger check, no staging; the store's bytes and file census are
        untouched). The decontamination shape for the substring family:
        \"which spans of this candidate doc already exist in the
        corpus?\" answered from the maintained store instead of a full
        re-gram. Unlike ingest, already-ledgered ids are NOT dropped —
        probing a stored doc legitimately reports it fully duplicated
        (its own grams are in the store). Tombstoned docs' grams are
        logically absent, as in ingest."""
        self.recover()
        batch = batch.dropDuplicates([self.id_col])
        release_cache("substring_index.probe")  # BEFORE persist
        toks = tokenized_docs(batch, self.id_col, self.text_col).persist()
        if toks.count() == 0:
            rotate_cache("substring_index.probe", toks)
            return removal_report(
                toks,
                toks.select(self.id_col).limit(0).withColumn("s", F.lit(1)),
                self.k,
                self.id_col,
            )
        rotate_cache("substring_index.probe", toks)
        grams = gram_rows(toks, self.k, self.id_col)
        batch_first = grams.groupBy("gram").agg(
            F.min(F.struct(self.id_col, "s")).alias("first_occ")
        )
        if self._has_files(self.firsts_path):
            stored = self._stored_grams(pruned_by=batch_first)
        else:
            stored = batch_first.select("gram").withColumn(
                "__stored", F.lit(1)
            ).limit(0)
        occ = grams.join(batch_first, "gram").join(stored, "gram", "left")
        dup_starts = occ.filter(
            F.col("__stored").isNotNull()
            | (F.col(self.id_col) != F.col(f"first_occ.{self.id_col}"))
            | (F.col("s") != F.col("first_occ.s"))
        ).select(self.id_col, "s")
        # no localCheckpoint: nothing mutates, so the report's lineage
        # over the store paths stays valid for the caller to consume
        return removal_report(toks, dup_starts, self.k, self.id_col)

    @single_writer
    def add_batch(self, batch: DataFrame) -> DataFrame:
        """Ingest one batch; return its per-doc removal report
        (id, n_tokens, n_removed, kept_hash) — duplicated spans judged
        against the store AND the batch itself. The store commit is the
        journaled staged append above: firsts and docs promote together
        or not at all.

        Idempotent under at-least-once redelivery: doc ids already in
        the ledger (and duplicate deliveries inside the batch) are
        dropped up front — a replayed batch reports nothing and appends
        nothing. Because the ledger append can never trail the firsts
        append, a redelivered batch after ANY crash is either dropped
        whole (post-commit crash) or re-judged against the pre-batch
        store (pre-commit crash) — never against its own grams."""
        self.recover()  # converge any interrupted prior ingest first
        batch = batch.dropDuplicates([self.id_col])
        if self._has_files(self.docs_path):
            seen = self.spark.read.parquet(self.docs_path).select(self.id_col)
            batch = batch.join(seen, self.id_col, "left_anti")

        release_cache("substring_index.add_batch")  # BEFORE persist
        toks = tokenized_docs(batch, self.id_col, self.text_col).persist()
        if toks.count() == 0:
            # replay / empty delivery: nothing to judge, nothing to
            # stage — the store (and its file census) is untouched
            rotate_cache("substring_index.add_batch", toks)
            return removal_report(toks, toks.select(self.id_col).limit(0)
                                  .withColumn("s", F.lit(1)), self.k, self.id_col)
        grams = gram_rows(toks, self.k, self.id_col)
        batch_first = grams.groupBy("gram").agg(
            F.min(F.struct(self.id_col, "s")).alias("first_occ")
        )

        if self._has_files(self.firsts_path):
            stored = self._stored_grams()
        else:
            stored = batch_first.select("gram").withColumn(
                "__stored", F.lit(1)
            ).limit(0)

        occ = grams.join(batch_first, "gram").join(stored, "gram", "left")
        dup_starts = occ.filter(
            F.col("__stored").isNotNull()
            | (F.col(self.id_col) != F.col(f"first_occ.{self.id_col}"))
            | (F.col("s") != F.col("first_occ.s"))
        ).select(self.id_col, "s")

        # localCheckpoint (eager) SEVERS the report's lineage from the
        # store paths before they mutate: a plain persist is not enough
        # — Spark's append refreshes every cached plan that reads the
        # written path, and the invalidated report would lazily
        # recompute against the post-commit ledger, where the batch
        # anti-joins itself away to zero rows (empirically reproduced;
        # neardup_index survives the same hazard only because its
        # recompute is value-identical by construction — this one
        # cannot be)
        report = removal_report(toks, dup_starts, self.k, self.id_col).localCheckpoint()

        new_firsts = (
            batch_first.join(stored, "gram", "left")
            .filter(F.col("__stored").isNull())
            .select(
                "gram",
                F.col(f"first_occ.{self.id_col}").alias(self.id_col),
                F.col("first_occ.s").alias("s"),
            )
        )

        # --- staged two-table append, committed by one marker --------------
        staging = self.staging_path  # recover() left no staging behind
        self._store.stage_bucketed(new_firsts, os.path.join(staging, "firsts"))
        toks.select(self.id_col).write.mode("overwrite").parquet(
            os.path.join(staging, "docs")
        )
        rotate_cache("substring_index.add_batch", toks)
        self.fs.write_text_atomic(
            os.path.join(self.path, _META),
            json.dumps({"k": self.k, "n_buckets": self.n_buckets}),
        )
        # COMMIT POINT (journal.commit): everything before this line is
        # reconstructible debris; everything after is pure idempotent
        # promotion
        self._journal().commit()
        return report

    @single_writer
    def compact_buckets(self, max_files_per_bucket: int = 1) -> dict:
        """Per-bucket small-files compaction of the firsts store — the
        O(hot buckets) defrag unit; tombstones untouched (see
        ``store_common.compact_hot_buckets``)."""
        self.recover()
        if not self._has_files(self.firsts_path):
            return {}
        return compact_hot_buckets(
            self.spark,
            self.fs,
            self._journal(),
            self.staging_path,
            (("firsts", self._store),),
            max_files_per_bucket,
        )

    @single_writer
    def compact(self) -> dict:
        """Rewrite the firsts store to ONE file per bucket — every
        ``add_batch`` appends up to ``n_buckets`` files, so after N
        batches each bucket's scan opens O(N) files AND loses its
        sort-merge sortedness (Spark trusts per-bucket sort order only
        with a single file per bucket); at ingest cadence that is the
        same small-files decay ``MinHashIndex.compact`` handles. The
        rewrite preserves the bucket layout (same bucketed staging
        write as ingest) and commits through the ingest journal: the
        staged full rewrite replaces the live dir on roll-forward
        instead of appending to it, selected by a ``replace`` field in
        the commit marker. The docs ledger compacts in the same pass
        (sized from its row count). Single-writer discipline is the
        caller's lock, as with ``add_batch``."""
        import math

        self.recover()
        report: dict = {}
        if not self._has_files(self.firsts_path):
            return report
        staging = self.staging_path
        # tombstones apply PHYSICALLY here: deleted docs' first-
        # occurrence rows and ledger rows drop from the rewrite, and
        # the CLEARED (empty) tombstone set stages through the SAME
        # replace commit — rewrite and clear can never land separately.
        # (A stale tombstone surviving a partial compact would hide,
        # then on the next compact silently delete, a re-ingested doc —
        # the crash window the round-9 self-review reproduced.)
        tombs = self._tombstones()
        if tombs is not None:
            tombs = tombs.localCheckpoint()  # sever before tombstones/ clears
        firsts = self.spark.read.parquet(self.firsts_path)
        if tombs is not None:
            firsts = firsts.join(tombs, self.id_col, "left_anti")
        files_before = len(
            [n for n in self.fs.listdir(self.firsts_path) if n.endswith(".parquet")]
        )
        self._store.stage_bucketed(firsts, os.path.join(staging, "firsts"))
        docs = self.spark.read.parquet(self.docs_path)
        if tombs is not None:
            docs = docs.join(tombs, self.id_col, "left_anti")
        nfiles = max(1, math.ceil(docs.count() / 2_000_000))
        docs.repartition(nfiles).write.mode("overwrite").parquet(
            os.path.join(staging, "docs")
        )
        if tombs is not None:
            # an EMPTY staged dir = the cleared set, swapped in with
            # the store rewrites under the one commit marker
            self.fs.makedirs(os.path.join(staging, "tombstones"))
        self._journal().commit(replace=True)
        report["firsts"] = {
            "files_before": files_before,
            "files_after": len(
                [
                    n
                    for n in self.fs.listdir(self.firsts_path)
                    if n.endswith(".parquet")
                ]
            ),
        }
        return report

    def n_grams(self) -> int:
        """Stored first-occurrence rows, PHYSICAL count (pre-compact it
        includes rows owned by tombstoned docs, which the membership
        view already filters)."""
        if not self._has_files(self.firsts_path):
            return 0
        return self.spark.read.parquet(self.firsts_path).count()

    def stats(self) -> dict:
        """Operational snapshot: stored grams, ledgered docs, pending
        tombstones, and the firsts file census (compaction trigger).
        Converges any interrupted commit first (see recover)."""
        self.recover()
        tombs = self._tombstones()
        return {
            "n_grams": self.n_grams(),
            "n_docs": self.spark.read.parquet(self.docs_path).count()
            if self._has_files(self.docs_path) else 0,
            "n_tombstoned": tombs.count() if tombs is not None else 0,
            "firsts_files": len(
                [n for n in self.fs.listdir(self.firsts_path)
                 if n.endswith(".parquet")]
            ) if self._has_files(self.firsts_path) else 0,
        }
