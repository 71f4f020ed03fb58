"""Incremental BM25 search index — lexical retrieval as a MAINTAINED
inverted index, not a per-query corpus scan.

``plans.quality.text_bm25_topk`` re-tokenizes the whole corpus every
query — right for a one-shot ranking audit, O(corpus) work per query
for the retrieval jobs an LLM-data pipeline actually runs (decontam
probes, boilerplate hunting, eval-set leakage search: many queries,
slowly-growing corpus). This operator persists the two tables BM25
needs, maintained by the same journaled staged-commit protocol as the
substring gram store (``operators/journal.py``):

- ``postings/`` — (token, doc_id, tf): the inverted index, written
  BUCKETED on ``token`` (a Spark bucketed catalog table over this
  location), so a query's term lookup is BUCKET-PRUNED — the scan
  opens only the |query-terms| buckets that can hold those tokens
  (``SelectedBucketsCount`` plan-pinned) and the per-term df
  aggregation inherits the store's partitioning with NO exchange above
  the store scan;
- ``doclens/`` — (doc_id, dl): per-doc token counts (dl=0 rows kept —
  the table doubles as the ingest ledger, so a replayed batch is
  dropped up front).

BM25's global statistics (N, avgdl, per-term df) are computed AT QUERY
TIME from the store, never frozen at ingest — so after any sequence of
``add_batch`` calls, ``search`` answers IDENTICALLY to the one-shot
``text_bm25_topk`` over the same corpus (scores depend only on store
CONTENTS, which are batch-schedule-invariant). That equivalence is the
certification: the ``text_bm25_indexed`` registry row shares the
one-shot's DuckDB oracle verbatim, and ``tests/test_bm25_index.py``
pins batch-split invariance, replay no-ops, and crash convergence.

Scale: ingest is O(batch) — tokenize the batch once, two staged
writes, commit. A query reads |terms| buckets of postings plus the
doclens table (ids + one int per doc; bucket doclens on doc_id too if
the postings⋈doclens join ever dominates — at 100 TB the postings
side of that join is query-term-bounded, so doclens is the larger
side and ships once). Ranking math, tie-breaks, and the windowless
top-k rank are the one-shot's, kept identical so the two paths cannot
drift numerically.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fs import fs_for
from ..functions.text import tokens_col
from .bucketed import BucketedStore
from .journal import StagedCommit
from .store_common import single_writer

_META = "_STORE_META"


class BM25Index:
    """A persisted bucketed inverted index with query-time BM25
    scoring."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        k1: float = 1.2,
        b: float = 0.75,
        id_col: str = "doc_id",
        text_col: str = "text",
        n_buckets: int = 32,
    ):
        self.spark = spark
        self.path = path
        self.k1, self.b = k1, b
        self.id_col, self.text_col = id_col, text_col
        self.n_buckets = n_buckets
        self.fs = fs_for(spark, path)
        meta_path = os.path.join(path, _META)
        fresh = not self.fs.exists(meta_path)
        if not fresh:
            meta = json.loads(self.fs.read_text(meta_path))
            self.n_buckets = int(meta["n_buckets"])
        # catalog-fronted bucketed postings table; the shared seam also
        # drops a stale catalog entry left by a previous (deleted)
        # store at this path
        self._store = BucketedStore(
            spark,
            lambda: self.fs,
            self.postings_path,
            "token",
            self.n_buckets,
            "m2c_bm25_",
            fresh,
        )
        self._table = self._store.table

    @property
    def postings_path(self) -> str:
        return os.path.join(self.path, "postings")

    @property
    def doclens_path(self) -> str:
        return os.path.join(self.path, "doclens")

    @property
    def tombstones_path(self) -> str:
        """Deleted doc ids (one column), applied logically by every
        ``search`` and physically by ``compact`` — the store's Q3/Q5
        delete lifecycle (the reference dedup-DELETEs then compacts;
        an append-only retrieval store needs the same two phases)."""
        return os.path.join(self.path, "tombstones")

    @property
    def staging_path(self) -> str:
        return os.path.join(self.path, "__ingest_staging")

    def _has_files(self, d: str) -> bool:
        return self._store.has_files(d)

    def _journal(self) -> StagedCommit:
        return StagedCommit(
            self.spark,
            self.fs,
            self.staging_path,
            (
                ("postings", self.postings_path),
                ("doclens", self.doclens_path),
                ("tombstones", self.tombstones_path),
            ),
            refresh_table=self._table,
        )

    def recover(self) -> int:
        return self._journal().recover()

    @single_writer
    def add_batch(self, batch: DataFrame) -> int:
        """Index one batch; returns the number of documents indexed
        (replayed ids excluded). Idempotent under at-least-once
        redelivery: ids already in the doclens ledger (and duplicate
        deliveries inside the batch) are dropped up front, and the
        postings/doclens appends commit together through the journal —
        a crash at any point leaves the store either untouched or
        fully committed, never split."""
        self.recover()
        batch = batch.dropDuplicates([self.id_col])
        if self._has_files(self.doclens_path):
            seen = self.spark.read.parquet(self.doclens_path).select(self.id_col)
            batch = batch.join(seen, self.id_col, "left_anti")

        toks = batch.select(
            self.id_col,
            tokens_col(F.coalesce(F.col(self.text_col), F.lit(""))).alias("toks"),
        ).localCheckpoint()  # sever from the ledger before it mutates
        n_docs = toks.count()
        if n_docs == 0:
            return 0
        dl = toks.select(
            self.id_col, F.size("toks").cast("bigint").alias("dl")
        )
        tf = (
            toks.select(self.id_col, F.explode("toks").alias("token"))
            .groupBy("token", self.id_col)
            .agg(F.count(F.lit(1)).alias("tf"))
        )

        staging = self.staging_path  # recover() left no staging behind
        self._store.stage_bucketed(tf, os.path.join(staging, "postings"))
        dl.write.mode("overwrite").parquet(os.path.join(staging, "doclens"))
        self.fs.write_text_atomic(
            os.path.join(self.path, _META),
            json.dumps({"n_buckets": self.n_buckets}),
        )
        self._journal().commit()
        return n_docs

    @single_writer
    def remove_batch(self, ids: DataFrame) -> int:
        """Mark documents DELETED (tombstone append through the same
        journal — one committed table, crash-converged like ingest);
        returns the number newly tombstoned. Idempotent: ids never
        ingested, or already tombstoned, are dropped up front. Every
        ``search`` then answers as if the docs were never ingested
        (N/avgdl/df recompute over the survivors); ``compact`` applies
        tombstones physically."""
        from .journal import journaled_tombstone_append

        self.recover()
        if not self._has_files(self.doclens_path):
            return 0
        return journaled_tombstone_append(
            self._journal(),
            self.staging_path,
            ids,
            self.id_col,
            self.spark.read.parquet(self.doclens_path).select(self.id_col),
            self._tombstones(),
        )

    def _tombstones(self) -> DataFrame | None:
        if not self._has_files(self.tombstones_path):
            return None
        return self.spark.read.parquet(self.tombstones_path)

    @single_writer
    def compact_buckets(self, max_files_per_bucket: int = 1) -> dict:
        """Per-bucket small-files compaction of the postings store —
        the O(hot buckets) defrag unit; tombstones untouched and the
        slim doclens ledger left as-is (see
        ``store_common.compact_hot_buckets``)."""
        from .store_common import compact_hot_buckets

        self.recover()
        if not self._has_files(self.postings_path):
            return {}
        return compact_hot_buckets(
            self.spark,
            self.fs,
            self._journal(),
            self.staging_path,
            (("postings", self._store),),
            max_files_per_bucket,
        )

    @single_writer
    def compact(self) -> dict:
        """Apply tombstones PHYSICALLY: rewrite postings (bucketed, one
        file per bucket — also fixing per-ingest small-file decay) and
        doclens without the deleted docs, committed as the journal's
        whole-dir replace swap; the CLEARED tombstone set rides the
        same commit (an empty staged dir), so the rewrites and the
        clear can never land separately — a crash at any point either
        leaves the store fully pre-compact or rolls the whole set
        forward at the next entry."""
        self.recover()
        report: dict = {}
        if not self._has_files(self.doclens_path):
            return report
        tombs = self._tombstones()
        postings = self.spark.read.parquet(self.postings_path) if self._has_files(
            self.postings_path
        ) else None
        doclens = self.spark.read.parquet(self.doclens_path)
        if tombs is not None:
            if postings is not None:
                postings = postings.join(tombs, self.id_col, "left_anti")
            doclens = doclens.join(tombs, self.id_col, "left_anti")
        files_before = (
            len([n for n in self.fs.listdir(self.postings_path) if n.endswith(".parquet")])
            if postings is not None
            else 0
        )
        staging = self.staging_path
        if postings is not None:
            self._store.stage_bucketed(
                postings, os.path.join(staging, "postings")
            )
        doclens.write.mode("overwrite").parquet(os.path.join(staging, "doclens"))
        if tombs is not None:
            # the CLEARED (empty) tombstone set swaps in atomically
            # with the rewrites — a stale tombstone surviving a partial
            # compact would hide, then silently delete, a re-ingested
            # doc (round-9 self-review finding, fixed in all 4 stores)
            self.fs.makedirs(os.path.join(staging, "tombstones"))
        self._journal().commit(replace=True)
        report["postings"] = {
            "files_before": files_before,
            "files_after": len(
                [
                    n
                    for n in self.fs.listdir(self.postings_path)
                    if n.endswith(".parquet")
                ]
            )
            if self._has_files(self.postings_path)
            else 0,
        }
        return report

    def search(self, terms, k: int = 20) -> DataFrame:
        """BM25 top-k for ``terms`` against the store: bucket-pruned
        postings lookup, query-time df/N/avgdl, the one-shot's exact
        formula, rounding, tie-breaks (rounded score desc, id asc) and
        windowless broadcast-self-join rank. Output:
        (doc_id, n_terms_hit, score, rk) — schema-identical to
        ``text_bm25_topk``.

        The result is LAZY over the live store paths: a caller that
        mutates the store afterwards (add/remove/compact) must
        materialize it first (collect / localCheckpoint) — compaction
        deletes the files the plan references (the standard
        maintained-store lineage rule; the delete-lifecycle oracle row
        pins the checkpointed pattern)."""
        self.recover()
        terms = list(terms)
        if not self._has_files(self.doclens_path):
            raise ValueError(
                f"BM25 store at {self.path} has no committed ingest — "
                "call add_batch before search"
            )
        dl_all = self.spark.read.parquet(self.doclens_path)
        tombs = self._tombstones()
        if tombs is not None:
            # logical deletion: survivors only — N/avgdl/df all
            # recompute downstream of this filter, so the answer equals
            # a store that never ingested the tombstoned docs
            dl_all = dl_all.join(tombs, self.id_col, "left_anti")
        # one-shot stats semantics: only docs with >= 1 token count
        # toward N and avgdl (its dl table comes from exploded tokens)
        dl = dl_all.filter(F.col("dl") > 0)
        if not self._has_files(self.postings_path):
            # a legitimate committed state: every ingested doc so far
            # was empty/null text — the ledger exists, the postings dir
            # holds no files. One-shot semantics: no tf rows, empty
            # top-k (self-review finding: reading the table here raised
            # PATH_NOT_FOUND instead)
            id_type = dl_all.schema[self.id_col].dataType.simpleString()
            return self.spark.createDataFrame(
                [],
                f"{self.id_col} {id_type}, n_terms_hit bigint,"
                " score double, rk int",
            )
        stats = dl.agg(
            F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
        )
        tf = self._store.read().filter(F.col("token").isin(terms))
        if tombs is not None:
            # term-bounded side anti-joins the (minority) tombstones,
            # so per-term df counts only the survivors
            tf = tf.join(tombs, self.id_col, "left_anti")
        df_t = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        )
        scored = (
            tf.join(F.broadcast(df_t), "token")
            .join(dl, self.id_col)
            .crossJoin(F.broadcast(stats))
            .withColumn(
                "term_score",
                idf
                * (F.col("tf") * (self.k1 + 1))
                / (
                    F.col("tf")
                    + self.k1
                    * (1 - self.b + self.b * F.col("dl") / F.col("avgdl"))
                ),
            )
            .groupBy(self.id_col)
            .agg(
                F.count(F.lit(1)).alias("n_terms_hit"),
                F.round(F.sum("term_score"), 4).alias("score"),
            )
        )
        from ..session import release_cache, rotate_cache

        release_cache("bm25_index.search")
        top = (
            scored.orderBy(F.col("score").desc(), F.col(self.id_col).asc())
            .limit(k)
            .persist()
        )
        rotate_cache("bm25_index.search", top)
        before = (F.col("b.score") > F.col("a.score")) | (
            (F.col("b.score") == F.col("a.score"))
            & (F.col(f"b.{self.id_col}") < F.col(f"a.{self.id_col}"))
        )
        return (
            top.alias("a")
            .join(F.broadcast(top.alias("b")), before, "left")
            .groupBy(
                F.col(f"a.{self.id_col}").alias(self.id_col),
                F.col("a.n_terms_hit").alias("n_terms_hit"),
                F.col("a.score").alias("score"),
            )
            .agg((F.count(F.col(f"b.{self.id_col}")) + 1).cast("int").alias("rk"))
        )

    def n_docs(self) -> int:
        """Documents ever ingested (ledger size, empty docs included)."""
        if not self._has_files(self.doclens_path):
            return 0
        return self.spark.read.parquet(self.doclens_path).count()

    def stats(self) -> dict:
        """Operational snapshot: live doc count, pending tombstones,
        and the postings file census (the compaction trigger).
        Converges any interrupted commit first (see recover)."""
        self.recover()
        tombs = self._tombstones()
        return {
            "n_docs": self.n_docs(),
            "n_tombstoned": tombs.count() if tombs is not None else 0,
            "postings_files": len(
                [n for n in self.fs.listdir(self.postings_path)
                 if n.endswith(".parquet")]
            ) if self._has_files(self.postings_path) else 0,
        }

