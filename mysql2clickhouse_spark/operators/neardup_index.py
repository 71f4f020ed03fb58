"""Incremental MinHash+LSH near-dup index — dedup as a MAINTAINED
store, not a per-run recompute.

``verified_near_dups`` re-shingles and re-signs the whole corpus every
invocation. That is the right shape for a one-shot audit, but a 100 TB
ingest pipeline adds a bounded batch per run (exactly like the CDC
runner's micro-batches) — re-hashing an ever-growing corpus per batch
is O(corpus) work for O(batch) new data, the same scale-killer the
runner's mutate path avoids by partition-scoped folds.

This operator persists the two derived tables the pipeline actually
needs:

- ``sigs/``  — (doc_id, hset, minhash): the integer shingle set and
  signature per document (text is never re-read after ingest);
- ``bands/`` — (band_idx, band_hash, doc_id), written
  ``partitionBy(band_idx)``: the LSH bucket membership table.

Per batch, ``add_batch``:

1. computes hset + signatures for the BATCH only (one scan of the new
   text);
2. finds new×old candidates by joining the batch's band rows against
   the stored band table — a shuffle on (band_idx, band_hash) whose
   probe side is batch-sized; the store is never re-signed, only
   joined;
3. finds new×new candidates with the ordinary in-batch self-join;
4. estimate-filters and exact-verifies both candidate sets against
   signatures/hsets fetched FROM THE STORE (shuffle joins keyed on
   doc_id — batch-bounded row counts on the probe side);
5. appends the batch's sig and band rows to the store (pure columnar
   append, no rewrite — same append-only discipline as the runner's
   versioned tables).

Incremental-vs-batch contract: after any sequence of ``add_batch``
calls, the union of returned pair sets equals ``verified_near_dups``
over the full corpus restricted to pairs introduced by each batch —
banding, estimate margin, and verify are the SAME functions, so the
candidate nets are identical by construction. ``dedup_incremental``
(plans/extensions.py) certifies this equivalence as an oracle row, and
``test_neardup_index.py`` pins multi-batch accumulation.

Delete lifecycle (round 9 — the same tombstone discipline as
``BM25Index``/``IVFIndex``): ``remove_batch`` journals doc ids into
``tombstones/`` through the shared ``StagedCommit`` maintenance
journal; every subsequent ``add_batch`` filters its candidate pairs
against the tombstone set (batch-bounded anti-join — the store is
untouched), so deleted docs answer as never ingested; ``compact``
applies tombstones physically — the sigs rewrite, the bands rewrite,
and the cleared tombstone set all promote under ONE commit marker, so
no crash can leave a stale tombstone hiding a re-ingestable id — after
which a deleted id may re-ingest as new.
``dedup_minhash_index_deletes`` (plans/extensions.py) certifies the
logical phase, the physical store content, and post-compact re-ingest
as one oracle row.

Reference basis: the reference maintains dedup state per run window
(_settings.py:230-287) rather than rescanning history; this is that
discipline applied to the LLM-pipeline extension family.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fs import fs_for
from .journal import StagedCommit
from ..functions.minhash import (
    DEFAULT_BANDS,
    DEFAULT_ESTIMATE_MARGIN,
    DEFAULT_NUM_PERM,
    DEFAULT_ROWS,
    DEFAULT_THRESHOLD,
    estimated_jaccard_col,
    jaccard_col,
    minhash_signatures_arrow,
    with_hset,
)
from ..session import release_cache, rotate_cache

#: same commit-marker protocol as the runner's journaled swaps
#: (streaming/runner.py SWAP_COMMIT_MARKER): a staging dir carrying a
#: parsable marker is committed — roll it forward; without one it is
#: pre-commit debris
_SWAP_MARKER = "_SWAP_COMMIT"


class MinHashIndex:
    """A persisted MinHash+LSH index over an append-only document store."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        num_perm: int = DEFAULT_NUM_PERM,
        bands: int = DEFAULT_BANDS,
        rows: int = DEFAULT_ROWS,
        seed: int = 42,
        threshold: float = DEFAULT_THRESHOLD,
        estimate_margin: float = DEFAULT_ESTIMATE_MARGIN,
        id_col: str = "doc_id",
        text_col: str = "text",
        k: int = 5,
    ):
        self.spark = spark
        self.path = path
        self.num_perm, self.bands, self.rows = num_perm, bands, rows
        self.seed, self.threshold = seed, threshold
        self.estimate_margin = estimate_margin
        self.id_col, self.text_col, self.k = id_col, text_col, k
        # swap seam for compaction — POSIX for bare paths, Hadoop
        # FileSystem for hdfs://s3a:// index roots (same seam the
        # runner uses; injectable for crash tests)
        self.fs = fs_for(spark, path)

    @property
    def sigs_path(self) -> str:
        return os.path.join(self.path, "sigs")

    @property
    def bands_path(self) -> str:
        return os.path.join(self.path, "bands")

    @property
    def tombstones_path(self) -> str:
        return os.path.join(self.path, "tombstones")

    def _exists(self) -> bool:
        # through the fs seam, so hdfs://s3a:// index roots work (the
        # review caught remove_batch silently no-oping on remote roots
        # via a bare os.path.isdir here)
        return self.fs.is_dir(self.sigs_path)

    def _tombstones(self) -> DataFrame | None:
        if not self.fs.is_dir(self.tombstones_path) or not any(
            n.endswith(".parquet") for n in self.fs.listdir(self.tombstones_path)
        ):
            return None
        return self.spark.read.parquet(self.tombstones_path)

    def _band_rows(self, sigs: DataFrame) -> DataFrame:
        return sigs.select(
            self.id_col,
            F.posexplode(
                F.array(
                    *[
                        F.slice("minhash", i * self.rows + 1, self.rows)
                        for i in range(self.bands)
                    ]
                )
            ).alias("band_idx", "band"),
        ).select("band_idx", F.hash("band").alias("band_hash"), self.id_col)

    def _batch_tables(self, batch: DataFrame) -> DataFrame:
        """(doc_id, hset, minhash) for the new batch — ONE text scan."""
        hashed = with_hset(batch, self.text_col, self.k).select(self.id_col, "hset")
        # arrow signer: zero-shuffle per-batch signing, values
        # bit-identical to the aggregate form (stored sigs stay
        # compatible across engine versions)
        sigs = minhash_signatures_arrow(hashed, self.id_col, self.num_perm, self.seed)
        # empty-hset docs have no signature rows (policy: they must not
        # reach the bands) but their hset row is still stored for verify
        return hashed.join(sigs, self.id_col, "left")

    def add_batch(self, batch: DataFrame) -> DataFrame:
        """Ingest one batch; return its near-dup pairs (id_a, id_b,
        jaccard) — new×old (id_a in store) and new×new (both in batch).
        Appends the batch to the store AFTER the pairs materialize, so
        a replayed batch cannot pair against its own first delivery's
        rows mid-flight.

        Idempotent under at-least-once redelivery: doc_ids already in
        the store (and duplicate deliveries inside the batch itself) are
        dropped up front, so a replayed batch appends nothing, pairs
        nothing, and later batches never join against duplicated sig or
        band rows — the incremental==full bag-equality contract holds
        across redeliveries, not just clean runs."""
        self.recover()  # converge any interrupted compaction swap first
        batch = batch.dropDuplicates([self.id_col])
        if self._exists():
            stored_ids = self.spark.read.parquet(self.sigs_path).select(self.id_col)
            batch = batch.join(stored_ids, self.id_col, "left_anti")
        release_cache("neardup_index.add_batch")  # BEFORE persist — see session.py
        new = self._batch_tables(batch).persist()
        new.count()  # eager barrier: feeds bands, both verify sides, and the append
        rotate_cache("neardup_index.add_batch", new)
        new_sigs = new.filter(F.col("minhash").isNotNull()).select(
            self.id_col, "minhash"
        )
        new_bands = self._band_rows(new_sigs)

        # new×old: batch band rows probe the stored bucket table
        pairs_sets = []
        if self._exists():
            old_bands = self.spark.read.parquet(self.bands_path)
            cross = (
                new_bands.alias("n")
                .join(
                    old_bands.alias("o"),
                    (F.col("n.band_idx") == F.col("o.band_idx"))
                    & (F.col("n.band_hash") == F.col("o.band_hash")),
                )
                # normalize to id_a < id_b (a stored id is not
                # necessarily smaller than a batch id); a replayed
                # doc_id present on both sides must not self-pair
                .select(
                    F.least(
                        F.col(f"o.{self.id_col}"), F.col(f"n.{self.id_col}")
                    ).alias("id_a"),
                    F.greatest(
                        F.col(f"o.{self.id_col}"), F.col(f"n.{self.id_col}")
                    ).alias("id_b"),
                )
                .filter(F.col("id_a") != F.col("id_b"))
                .distinct()
            )
            pairs_sets.append(cross)

        # new×new: ordinary banded self-join inside the batch
        nb = new_bands
        self_cands = (
            nb.alias("a")
            .join(
                nb.alias("b"),
                (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.band_hash") == F.col("b.band_hash"))
                & (F.col(f"a.{self.id_col}") < F.col(f"b.{self.id_col}")),
            )
            .select(
                F.col(f"a.{self.id_col}").alias("id_a"),
                F.col(f"b.{self.id_col}").alias("id_b"),
            )
            .distinct()
        )
        pairs_sets.append(self_cands)
        cands = pairs_sets[0]
        for p in pairs_sets[1:]:
            cands = cands.unionByName(p)
        # the cross and self sets are disjoint on a clean run (store ids
        # ∩ batch ids = ∅ after the anti-join) but OVERLAP after a crash
        # between the bands append and the sigs append: the redelivered
        # batch survives the sigs anti-join yet finds its own first
        # delivery's band rows in the store, so (d1, d2) arrives from
        # BOTH sets — without this distinct the pair verifies twice
        cands = cands.distinct() if len(pairs_sets) > 1 else cands

        # tombstoned docs answer as never ingested: their band rows are
        # still physically in the store until compact, so filter the
        # CANDIDATE pairs (batch-bounded) against the tombstone set
        # (minority ⇒ broadcast; the store side itself is never touched)
        tombs = self._tombstones()
        if tombs is not None:
            dead = tombs.select(F.col(self.id_col).alias("id_a"))
            cands = cands.join(F.broadcast(dead), "id_a", "left_anti").join(
                F.broadcast(dead.select(F.col("id_a").alias("id_b"))),
                "id_b",
                "left_anti",
            )

        # signature estimate-filter, then exact verify — sides resolve
        # from store ∪ batch (store rows only ever joined, never re-derived)
        all_rows = new.select(self.id_col, "hset", "minhash")
        if self._exists():
            all_rows = self.spark.read.parquet(self.sigs_path).unionByName(all_rows)
        sa = all_rows.select(
            F.col(self.id_col).alias("id_a"),
            F.col("minhash").alias("sig_a"),
            F.col("hset").alias("h_a"),
        )
        sb = all_rows.select(
            F.col(self.id_col).alias("id_b"),
            F.col("minhash").alias("sig_b"),
            F.col("hset").alias("h_b"),
        )
        pairs = (
            cands.join(sa, "id_a")
            .join(sb, "id_b")
            .withColumn(
                "est",
                estimated_jaccard_col(F.col("sig_a"), F.col("sig_b"), self.num_perm),
            )
            .filter(F.col("est") >= self.threshold - self.estimate_margin)
            .withColumn("jaccard", F.round(jaccard_col(F.col("h_a"), F.col("h_b")), 4))
            .filter(F.col("jaccard") >= self.threshold)
            .select("id_a", "id_b", "jaccard")
        )
        # materialize pairs BEFORE the store append (a streaming replay
        # of this batch must see the pre-append store)
        out = pairs.localCheckpoint(eager=True)

        # ORDER MATTERS: ``new``'s plan anti-joins against the sigs
        # store, so every derivation of ``new`` must execute while the
        # store is still in its pre-append state — a cache miss after
        # the sigs append would re-run the anti-join against a store
        # that now contains this very batch and silently drop it (zero
        # band rows written; cross-batch pairs lost). Bands first, sigs
        # last, nothing derived from ``new`` after that.
        self._band_rows(
            new.filter(F.col("minhash").isNotNull()).select(self.id_col, "minhash")
        ).write.mode("append").partitionBy("band_idx").parquet(self.bands_path)
        new.write.mode("append").parquet(self.sigs_path)
        return out

    def pairs_equal(self, other: DataFrame, mine: DataFrame) -> bool:
        """Bag equality on (id_a, id_b, jaccard) — certification helper."""
        a = mine.select("id_a", "id_b", "jaccard")
        b = other.select("id_a", "id_b", "jaccard")
        return a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()

    # --- store maintenance ---------------------------------------------------

    def _staging(self, store: str) -> str:
        """Legacy (pre-round-9) per-store swap staging path — kept so
        ``recover`` converges stores crashed under the old protocol."""
        return store + "__compactidx"

    @property
    def maint_staging_path(self) -> str:
        return os.path.join(self.path, "__maint_staging")

    def _journal(self) -> StagedCommit:
        """The maintenance journal: sigs, bands, AND the tombstone set
        commit under ONE marker (replace mode), so a compaction's store
        rewrites and its tombstone clear can never land separately —
        the crash window the round-9 self-review reproduced (stale
        tombstones after a partial compact silently hide, then delete,
        a re-ingested doc). Constructed per call so crash tests can
        swap ``self.fs``."""
        return StagedCommit(
            self.spark,
            self.fs,
            self.maint_staging_path,
            (
                ("sigs", self.sigs_path),
                ("bands", self.bands_path),
                ("tombstones", self.tombstones_path),
            ),
        )

    def recover(self) -> int:
        """Converge any interrupted maintenance commit (journal) plus
        any legacy per-store swap left by the pre-round-9 protocol —
        called at ``add_batch``, ``remove_batch``, and ``compact``
        entry, same contract as the runner's ``recover_all``. Returns
        the number of true roll-forwards; control-plane listings only."""
        import json

        rolled = self._journal().recover()
        for store in (self.sigs_path, self.bands_path, self.tombstones_path):
            staging = self._staging(store)
            marker = os.path.join(staging, _SWAP_MARKER)
            if self.fs.exists(marker):
                try:
                    json.loads(self.fs.read_text(marker))
                except ValueError:
                    self.fs.rmtree(marker)  # torn ⇒ pre-commit debris
                else:
                    if self.fs.exists(store):
                        self.fs.rmtree(store)
                    self.fs.rename(staging, store)
                    rolled += 1
            stale = os.path.join(store, _SWAP_MARKER)
            if self.fs.exists(stale):
                self.fs.rmtree(stale)
        return rolled

    def remove_batch(self, ids: DataFrame) -> int:
        """Mark documents DELETED; returns the number newly tombstoned.
        Idempotent: ids never ingested, or already tombstoned, are
        dropped up front. Every subsequent ``add_batch`` then answers
        as if the docs were never ingested — their stored band rows
        never emit candidate pairs and their signatures are never
        verify-joined (the tombstone anti-join runs on the
        batch-bounded candidate set, not the store). ``compact``
        applies tombstones physically and clears them, after which a
        deleted id may re-ingest as a brand-new document (pre-compact
        redelivery of a tombstoned id is dropped by the ingest
        anti-join — the store cannot hold two signature rows for one
        id). The tombstone write commits through the maintenance
        journal (append mode — the shared remove_batch body of all
        four stores), so a crash leaves either the old set or the
        converged new set, never a torn one."""
        from .journal import journaled_tombstone_append

        self.recover()
        if not self._exists():
            return 0
        return journaled_tombstone_append(
            self._journal(),
            self.maint_staging_path,
            ids,
            self.id_col,
            self.spark.read.parquet(self.sigs_path).select(self.id_col),
            self._tombstones(),
        )

    def compact(self) -> dict:
        """Rewrite both store tables to a bounded file count — every
        ``add_batch`` APPENDS one file set, so after N batches the band
        join opens O(N) files per bucket partition; at ingest-pipeline
        batch cadence that is the classic small-files decay (the same
        reason the runner ships ``compact_small_files``).

        The rewrite is the journaled whole-dir swap: recompute into a
        staging dir, commit with an atomic ``_SWAP_COMMIT`` marker,
        delete-and-rename into place; a crash at any point either
        leaves the live store untouched (pre-marker) or is rolled
        forward by ``recover()`` at the next entry (post-marker).
        File counts are SIZED FROM ROW COUNTS (one metadata-cheap count
        per store), never a blanket coalesce(1): at 100 TB the sigs
        table is corpus-sized and a band's bucket rows are
        corpus-sized too, so both stores repartition to
        ``ceil(rows / rows_per_file)`` tasks — bands additionally
        hash-bucketed on (band_idx, band_hash) so a bucket's rows stay
        co-located for the candidate join. Single-writer discipline
        (no concurrent ``add_batch``) is the caller's lock, exactly
        the reference's single-instance rule (B5)."""
        import math

        self.recover()
        report: dict = {}
        rows_per_file = 2_000_000
        # tombstones apply PHYSICALLY here. The sigs rewrite, the bands
        # rewrite, AND the cleared (empty) tombstone set all stage under
        # ONE journal commit — they can never land separately. The old
        # per-store-swap form had a window where the store had already
        # forgotten a deleted id but the stale tombstone survived; a
        # re-ingest of that id then lost its pairs silently and the
        # NEXT compact deleted it (reproduced in the round-9
        # self-review). One marker closes the whole class.
        tombs = self._tombstones()
        if tombs is not None:
            tombs = tombs.localCheckpoint()  # sever before tombstones/ clears
        staging = self.maint_staging_path
        staged = []
        for store, part_col in ((self.sigs_path, None), (self.bands_path, "band_idx")):
            if not self.fs.is_dir(store):
                continue
            name = os.path.basename(store)
            files_before = sum(1 for _ in self._data_files(store))
            df = self.spark.read.parquet(store)
            if tombs is not None:
                df = df.join(tombs, self.id_col, "left_anti")
            nfiles = max(1, math.ceil(df.count() / rows_per_file))
            dst = os.path.join(staging, name)
            if part_col:
                (
                    df.repartition(nfiles, F.col(part_col), F.col("band_hash"))
                    .write.mode("overwrite")
                    .partitionBy(part_col)
                    .parquet(dst)
                )
            else:
                df.repartition(nfiles).write.mode("overwrite").parquet(dst)
            staged.append((name, store, files_before))
        if not staged:
            return report
        if tombs is not None:
            # an EMPTY staged tombstones dir = the cleared set; the
            # replace promotion swaps it in atomically with the stores
            self.fs.makedirs(os.path.join(staging, "tombstones"))
        self._journal().commit(replace=True)
        for name, store, files_before in staged:
            report[name] = {
                "files_before": files_before,
                "files_after": sum(1 for _ in self._data_files(store)),
            }
        return report

    def stats(self) -> dict:
        """Operational snapshot: ingested docs, pending tombstones,
        and the band file census (the compaction trigger). Converges
        any interrupted maintenance commit first — like every other
        entry point — so a crash-interrupted store reports its true
        state, not the mid-promotion one."""
        self.recover()
        tombs = self._tombstones()
        return {
            "n_docs": self.spark.read.parquet(self.sigs_path).count()
            if self._exists() else 0,
            "n_tombstoned": tombs.count() if tombs is not None else 0,
            "band_files": sum(1 for _ in self._data_files(self.bands_path)),
        }

    def _data_files(self, store: str):
        """Report-only parquet file census (local paths; a remote index
        root reports 0 rather than paying a recursive RPC listing)."""
        if not os.path.isdir(store):
            return
        for root, _dirs, files in os.walk(store):
            for f in files:
                if f.endswith(".parquet"):
                    yield os.path.join(root, f)
