"""Incremental SimHash index (operators/simhash_index.py).

Contract under test: any batch decomposition of the corpus yields, via
accumulated ``add_batch`` pair sets, exactly the pairs of the one-shot
``simhash_near_dups`` over the full corpus (pigeonhole banding is an
EXACT net, so this is guaranteed-recall equality, not same-function
equality) — plus replay idempotence, journaled crash convergence, the
delete lifecycle, and the store+batch hot-bucket quarantine.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mysql2clickhouse_spark.fs import LocalFS
from mysql2clickhouse_spark.functions.minhash import simhash_near_dups, with_simhash
from mysql2clickhouse_spark.operators.simhash_index import SimHashIndex

BASE = "the quick brown fox jumps over the lazy dog wearing suit number"


def _corpus(spark):
    docs = [(i, f"{BASE} {i} variant alpha beta gamma delta") for i in range(40)]
    # planted near-dups: one extra token => small hamming
    docs += [
        (1000 + i, f"{BASE} {i} variant alpha beta gamma delta zeta")
        for i in range(0, 40, 5)
    ]
    docs += [(777, ""), (778, None)]  # empty/null text: no fingerprint
    return spark.createDataFrame(docs, "doc_id bigint, text string")


def _one_shot(spark, df):
    return simhash_near_dups(with_simhash(df))


def test_batch_accumulation_equals_one_shot(spark, tmp_path):
    corpus = _corpus(spark).cache()
    idx = SimHashIndex(spark, str(tmp_path / "idx"))
    acc = None
    for i in range(3):
        p = idx.add_batch(corpus.filter(F.col("doc_id") % 3 == i))
        acc = p if acc is None else acc.unionByName(p)
    assert idx.pairs_equal(_one_shot(spark, corpus), acc)
    corpus.unpersist()


def test_batch_accumulation_equals_one_shot_with_verify_prune_forced(
    spark, tmp_path, monkeypatch
):
    """r12 ingest prune under a forced-open size gate — same contract
    as the MinHash sibling's test: candidate-id pruning of the sigs
    read must not change any emitted pair."""
    from mysql2clickhouse_spark.operators import store_common

    monkeypatch.setattr(store_common, "PROBE_PUSHDOWN_MIN_STORE_BYTES", 0)
    corpus = _corpus(spark).cache()
    idx = SimHashIndex(spark, str(tmp_path / "idx_vp"))
    acc = None
    for i in range(3):
        p = idx.add_batch(corpus.filter(F.col("doc_id") % 3 == i))
        acc = p if acc is None else acc.unionByName(p)
    assert idx.pairs_equal(_one_shot(spark, corpus), acc)
    corpus.unpersist()


def test_replayed_batch_is_store_noop(spark, tmp_path):
    corpus = _corpus(spark).cache()
    b0 = corpus.filter(F.col("doc_id") % 2 == 0)
    b1 = corpus.filter(F.col("doc_id") % 2 == 1)
    idx = SimHashIndex(spark, str(tmp_path / "idx"))
    p0 = idx.add_batch(b0)
    n_sigs = spark.read.parquet(idx.sigs_path).count()
    replay = idx.add_batch(b0)
    assert replay.isEmpty()
    assert spark.read.parquet(idx.sigs_path).count() == n_sigs
    p1 = idx.add_batch(b1)
    assert idx.pairs_equal(
        _one_shot(spark, corpus), p0.unionByName(replay).unionByName(p1)
    )
    corpus.unpersist()


def test_geometry_is_store_identity(spark, tmp_path):
    idx = SimHashIndex(spark, str(tmp_path / "idx"), n_blocks=4)
    idx.add_batch(_corpus(spark).limit(5))
    with pytest.raises(ValueError, match="n_blocks"):
        SimHashIndex(spark, str(tmp_path / "idx"), n_blocks=2, max_hamming=1)
    with pytest.raises(ValueError, match="pigeonhole"):
        SimHashIndex(spark, str(tmp_path / "x"), n_blocks=4, max_hamming=4)
    # blocks must tile the 64-bit fingerprint exactly: a non-divisor
    # silently drops trailing bits (false pairs); n_blocks=1 overflows
    with pytest.raises(ValueError, match="tile"):
        SimHashIndex(spark, str(tmp_path / "x"), n_blocks=5, max_hamming=3)
    with pytest.raises(ValueError, match="tile"):
        SimHashIndex(spark, str(tmp_path / "x"), n_blocks=1, max_hamming=0)


def test_crash_before_commit_marker_replays_cleanly(spark, tmp_path):
    class _FailMarkerWrite(LocalFS):
        def write_text_atomic(self, path, text):
            if path.endswith("_INGEST_COMMIT"):
                raise OSError("injected crash before ingest commit marker")
            super().write_text_atomic(path, text)

    corpus = _corpus(spark).cache()
    idx = SimHashIndex(spark, str(tmp_path / "idx"))
    idx.fs = _FailMarkerWrite()
    with pytest.raises(OSError, match="injected crash"):
        idx.add_batch(corpus)
    assert not os.path.isdir(idx.sigs_path)  # nothing committed

    idx2 = SimHashIndex(spark, str(tmp_path / "idx"))
    pairs = idx2.add_batch(corpus)
    assert not os.path.isdir(idx2.staging_path)
    assert idx2.pairs_equal(_one_shot(spark, corpus), pairs)
    corpus.unpersist()


def test_crash_mid_promotion_rolls_forward(spark, tmp_path):
    """Marker landed, promotion stopped before the ids ledger moved —
    the data-stored-but-unledgered state. recover() at the next entry
    converges it; the replayed batch drops whole."""

    class _FailIdsPromotion(LocalFS):
        def rename(self, src, dst):
            if f"{os.sep}ids{os.sep}" in dst:
                raise OSError("injected crash before ids promotion")
            super().rename(src, dst)

    corpus = _corpus(spark).cache()
    b0 = corpus.filter(F.col("doc_id") < 1000)
    b1 = corpus.filter(F.col("doc_id") >= 1000)
    idx = SimHashIndex(spark, str(tmp_path / "idx"))
    idx.fs = _FailIdsPromotion()
    with pytest.raises(OSError, match="injected crash"):
        idx.add_batch(b0)
    assert idx._has_files(idx.sigs_path)
    assert not idx._has_files(idx.ids_path)

    idx2 = SimHashIndex(spark, str(tmp_path / "idx"))
    assert idx2.add_batch(b0).count() == 0  # dropped whole
    p1 = idx2.add_batch(b1)
    full = _one_shot(spark, corpus)
    want = full.filter((F.col("id_a") >= 1000) | (F.col("id_b") >= 1000))
    assert idx2.pairs_equal(want, p1)
    corpus.unpersist()


def test_delete_lifecycle_logical_physical_reingest(spark, tmp_path):
    d = _corpus(spark).filter(F.col("doc_id") < 1000).cache()
    mut = _corpus(spark).filter(F.col("doc_id") >= 1000)
    idx = SimHashIndex(spark, str(tmp_path / "idx"))
    idx.add_batch(d)

    doomed = d.filter(F.col("doc_id") % 5 == 0).select("doc_id")
    n_doomed = doomed.count()
    assert idx.remove_batch(doomed) == n_doomed
    assert idx.remove_batch(doomed) == 0  # idempotent

    # LOGICAL: deleted docs never pair — mutants pair only vs survivors
    p1 = idx.add_batch(mut)
    survivors = d.filter(F.col("doc_id") % 5 != 0)
    full = _one_shot(spark, survivors.unionByName(mut))
    want = full.filter((F.col("id_a") >= 1000) | (F.col("id_b") >= 1000))
    assert idx.pairs_equal(want, p1)

    # PHYSICAL: compact drops doomed rows and clears tombstones
    idx.compact()
    assert idx._tombstones() is None
    stored = {
        r.doc_id
        for r in spark.read.parquet(idx.sigs_path).select("doc_id").collect()
    }
    assert stored.isdisjoint({r.doc_id for r in doomed.collect()})

    # RE-INGEST: a deleted id is new again and recovers its one-shot
    # pairs against the store. Planted simhash pairs sit at hamming
    # p50=2, not all <= 3 — pick a doomed id whose pair the one-shot
    # actually finds (guaranteed non-empty: full has planted pairs).
    doomed_pairs = (
        _one_shot(spark, d.unionByName(mut))
        .filter(
            (F.col("id_b") == F.col("id_a") + 1000)
            & (F.pmod("id_a", F.lit(5)) == 0)
        )
        .agg(F.min("id_a"))
        .collect()[0][0]
    )
    if doomed_pairs is not None:
        d0 = doomed_pairs
        p2 = idx.add_batch(d.filter(F.col("doc_id") == d0))
        assert (d0, d0 + 1000) in {(r.id_a, r.id_b) for r in p2.collect()}
    d.unpersist()


def test_hot_bucket_quarantine_total_occupancy(spark, tmp_path):
    """A block bucket whose store+batch occupancy exceeds the cap stops
    being mined (identical docs share every block); ingest unaffected."""
    hot = "identical boilerplate text repeated verbatim in every document"
    idx = SimHashIndex(spark, str(tmp_path / "idx"), max_bucket_size=8)
    p1 = idx.add_batch(
        spark.createDataFrame(
            [(i, hot) for i in range(6)], "doc_id bigint, text string"
        )
    )
    assert p1.count() == 15  # under the cap: 6 identical docs pair fully
    p2 = idx.add_batch(
        spark.createDataFrame(
            [(i, hot) for i in range(6, 12)], "doc_id bigint, text string"
        )
    )
    assert p2.count() == 0  # occupancy 12 > 8: quarantined
    assert idx.stats()["n_docs"] == 12  # ingest unaffected

    # LIVE occupancy: tombstone the whole hot bucket, then fresh
    # arrivals mine again (dead rows must not keep quarantining — the
    # one-shot over the live corpus finds these pairs)
    idx.remove_batch(
        spark.createDataFrame([(i,) for i in range(12)], "doc_id bigint")
    )
    p3 = idx.add_batch(
        spark.createDataFrame(
            [(100 + i, hot) for i in range(3)], "doc_id bigint, text string"
        )
    )
    assert p3.count() == 3  # live occupancy 3 <= 8: mined

    # guard off: the same second batch mines everything
    idxN = SimHashIndex(
        spark, str(tmp_path / "idxN"), max_bucket_size=None
    )
    idxN.add_batch(
        spark.createDataFrame(
            [(i, hot) for i in range(6)], "doc_id bigint, text string"
        )
    )
    pN = idxN.add_batch(
        spark.createDataFrame(
            [(i, hot) for i in range(6, 12)], "doc_id bigint, text string"
        )
    )
    assert pN.count() == 6 * 6 + 15


def test_census_routes_through_fs_seam(spark, tmp_path):
    idx = SimHashIndex(spark, str(tmp_path / "idx"))
    idx.add_batch(_corpus(spark))

    class _Recording(LocalFS):
        def __init__(self):
            self.listed = []

        def listdir(self, path):
            self.listed.append(path)
            return super().listdir(path)

    rec = _Recording()
    idx.fs = rec
    st = idx.stats()
    assert st["block_files"] > 0
    assert any(p.startswith(idx.blocks_path) for p in rec.listed)


def test_probe_is_read_only_and_equals_one_shot_cross_pairs(spark, tmp_path):
    """Same probe contract as the MinHash store: one-shot cross pairs,
    zero mutation, tombstone-aware."""
    d = _corpus(spark).filter(F.col("doc_id") < 1000).cache()
    mut = _corpus(spark).filter(F.col("doc_id") >= 1000)
    idx = SimHashIndex(spark, str(tmp_path / "idx"))
    idx.add_batch(d)

    files0 = sorted(idx._data_files(idx.sigs_path)) + sorted(
        idx._data_files(idx.blocks_path)
    )
    pm = idx.probe(mut)
    assert sorted(idx._data_files(idx.sigs_path)) + sorted(
        idx._data_files(idx.blocks_path)
    ) == files0

    full = _one_shot(spark, d.unionByName(mut))
    cross = full.filter((F.col("id_a") < 1000) & (F.col("id_b") >= 1000))
    mapped = pm.select(
        F.col("match_id").alias("id_a"),
        F.col("probe_id").alias("id_b"),
        "hamming",
    )
    assert idx.pairs_equal(cross, mapped)

    # tombstoned docs stop matching
    doomed = d.filter(F.col("doc_id") % 5 == 0).select("doc_id")
    idx.remove_batch(doomed)
    pm2 = idx.probe(mut)
    assert pm2.join(doomed.withColumnRenamed("doc_id", "match_id"),
                    "match_id", "left_semi").count() == 0
    d.unpersist()
