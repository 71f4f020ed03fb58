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
  non-duplicate span);
- ``docs/``   — (doc_id,): the ingest ledger, so a replayed batch is
  dropped up front (at-least-once delivery appends nothing twice).

Per batch, ``add_batch``:

1. tokenizes and grams the BATCH only (one scan of the new text);
2. marks an occurrence duplicated iff its gram is in the store OR an
   earlier occurrence exists within the batch (the batch-local
   min-struct groupBy — identical aggregation to the one-shot);
3. produces the per-doc removal report via the SHARED
   ``removal_report`` (the one-shot and incremental paths cannot
   drift — same window rule, same reassembly, same hash);
4. appends the batch's NEW first occurrences and its doc ids to the
   store (pure columnar append, no rewrite).

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
store is never re-shuffled per batch when written bucketed on the
gram; even unbucketed, the join reads the store's single gram column
and shuffles only batch-sized rows, versus the one-shot's THREE
corpus×token exchanges plus a full re-tokenization. Everything else is
batch-bounded.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fs import fs_for
from ..functions.text import gram_rows, removal_report, tokenized_docs
from ..session import release_cache, rotate_cache


class SubstringIndex:
    """A persisted first-occurrence k-gram store for incremental
    exact-substring dedup."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        k: int = 10,
        id_col: str = "doc_id",
        text_col: str = "text",
    ):
        self.spark = spark
        self.path = path
        self.k = k
        self.id_col, self.text_col = id_col, text_col
        self.fs = fs_for(spark, path)

    @property
    def firsts_path(self) -> str:
        return os.path.join(self.path, "firsts")

    @property
    def docs_path(self) -> str:
        return os.path.join(self.path, "docs")

    def _exists(self) -> bool:
        return self.fs.is_dir(self.firsts_path)

    def add_batch(self, batch: DataFrame) -> DataFrame:
        """Ingest one batch; return its per-doc removal report
        (id, n_tokens, n_removed, kept_hash) — duplicated spans judged
        against the store AND the batch itself. Appends the batch's new
        first occurrences AFTER the report materializes, so a crash
        mid-call never leaves a batch half-judged against its own rows.

        Idempotent under at-least-once redelivery: doc ids already in
        the ledger (and duplicate deliveries inside the batch) are
        dropped up front — a replayed batch reports nothing and appends
        nothing."""
        batch = batch.dropDuplicates([self.id_col])
        if self._exists():
            seen = self.spark.read.parquet(self.docs_path).select(self.id_col)
            batch = batch.join(seen, self.id_col, "left_anti")

        release_cache("substring_index.add_batch")  # BEFORE persist
        toks = tokenized_docs(batch, self.id_col, self.text_col).persist()
        toks.count()
        grams = gram_rows(toks, self.k, self.id_col)
        batch_first = grams.groupBy("gram").agg(
            F.min(F.struct(self.id_col, "s")).alias("first_occ")
        )

        if self._exists():
            stored = (
                self.spark.read.parquet(self.firsts_path)
                .select("gram")
                .withColumn("__stored", F.lit(1))
            )
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
        # recompute against the post-append ledger, where the batch
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
        # snapshot from the PRE-append store state for the same reason:
        # the frame reads firsts/ lazily, and the append below would
        # otherwise be a self-referential write
        new_firsts = new_firsts.localCheckpoint()
        rotate_cache("substring_index.add_batch", toks)

        new_firsts.write.mode("append").parquet(self.firsts_path)
        toks.select(self.id_col).write.mode("append").parquet(self.docs_path)
        return report

    def n_grams(self) -> int:
        """Distinct grams ever seen (= stored first occurrences)."""
        return self.spark.read.parquet(self.firsts_path).count()
