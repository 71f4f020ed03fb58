"""Fault-injection matrix across the commit seam: fault point × store.

The reference documents its duplicate window as "crash between the data
write and the checkpoint write" (doc_old_duplicates.md:6-10) — replays
re-apply the slice and dedup-at-read absorbs it. This matrix drives
that contract through EVERY store kind the engine maintains:

| fault point                              | store                     |
|------------------------------------------|---------------------------|
| after data writes, before ledger write   | append (versioned) table  |
| after data writes, before ledger write   | mutate (folded) table     |
| mid partition-swap rename                | compaction (__compact)    |
| mid whole-dir swap rename                | daily agg (__daily)       |
| torn commit marker (non-atomic writer)   | any staging dir           |
| between bands append and sigs append     | incremental neardup index |

plus the recover_all sweep: a run_once entry must converge interrupted
swaps of OTHER jobs (compaction, daily agg), not just the ledger's.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from mysql2clickhouse_spark.fs import HadoopFS, LocalFS
from mysql2clickhouse_spark.operators.apply import latest_by_key
from mysql2clickhouse_spark.streaming.runner import (
    ReplicationRunner,
    RunConfig,
    SWAP_COMMIT_MARKER,
)

T0 = dt.datetime(2024, 3, 1)
SCHEMA = (
    "op string, table_name string, key bigint, seq bigint, file_seq bigint,"
    " ts timestamp, value double, event_type string"
)


def mk_changelog(spark, n=120, files=2):
    rows = []
    for i in range(n):
        key = i % 8
        op = "I" if i % 5 in (0, 1) else ("U" if i % 5 in (2, 3) else "D")
        tbl = "visits" if key % 2 == 0 else "events_state"
        rows.append(
            (op, tbl, key, i, i // (n // files), T0 + dt.timedelta(minutes=i), float(i), "e")
        )
    return spark.createDataFrame(rows, SCHEMA)


class _FailNthRename(LocalFS):
    def __init__(self, fail_on: int):
        self.calls = 0
        self.fail_on = fail_on

    def rename(self, src: str, dst: str) -> None:
        self.calls += 1
        if self.calls == self.fail_on:
            raise OSError(f"injected rename failure #{self.calls}: {src}")
        super().rename(src, dst)


def _latest(spark, path):
    df = spark.read.parquet(path)
    if "dateid" in df.columns:  # append store: dedup-at-read
        df = latest_by_key(df, ["key"], "dateid")
    # mutate store: the stored state IS the latest state
    return {(r["key"], r["value"]) for r in df.collect()}


# --- fault: crash between data writes and ledger write ----------------------

@pytest.mark.parametrize("table", ["visits", "events_state"])
def test_crash_before_ledger_write_replays_and_converges(spark, tmp_path, table):
    """Kill the run AFTER the per-table applies, BEFORE the ledger row
    lands (the reference's documented duplicate window). The replay
    re-applies the same slice; dedup-at-read (append tables) and the
    idempotent fold (mutate tables) must both converge to the clean-run
    state, and the resume point must advance only once the ledger lands.

    `visits` exercises the append path, `events_state` the mutate path
    (per the default REGISTRY policies used by mk_changelog)."""
    cl = mk_changelog(spark)

    clean = ReplicationRunner(spark, RunConfig(target_dir=str(tmp_path / "clean")))
    clean.run_once(cl)
    expected = _latest(spark, clean.table_path(table))

    crashy = ReplicationRunner(spark, RunConfig(target_dir=str(tmp_path / "wh")))
    orig = crashy._write_ledger

    def exploding_ledger(batch):
        raise OSError("injected crash before ledger write")

    crashy._write_ledger = exploding_ledger
    with pytest.raises(OSError, match="injected"):
        crashy.run_once(cl)
    # data landed, checkpoint didn't: resume point is pre-run
    assert crashy.resume_seq() is None

    # replay: same changelog, healthy ledger — the whole slice re-applies
    crashy._write_ledger = orig
    r = crashy.run_once(cl)
    assert r.rows_applied > 0
    assert crashy.resume_seq() == 119
    assert _latest(spark, crashy.table_path(table)) == expected


# --- fault: recover_all sweeps other jobs' interrupted swaps ----------------

def test_run_once_recovers_interrupted_compaction_and_daily_agg(spark, tmp_path):
    """A compaction (__compact) or daily-agg (__daily__staging) swap
    interrupted mid-promote leaves live partitions deleted-but-not-
    promoted. The NEXT run_once — not the same maintenance job — must
    roll both forward before reading any state."""
    runner = ReplicationRunner(spark, RunConfig(target_dir=str(tmp_path / "wh")))
    cl = mk_changelog(spark)
    runner.run_once(cl)
    path = runner.table_path("visits")
    expected_latest = _latest(spark, path)
    runner.refresh_daily_aggregate("visits", [202403])
    agg_path = path + "__daily"
    agg_before = {
        (r["day"], r["n_rows"]) for r in spark.read.parquet(agg_path).collect()
    }

    # interrupt the daily-agg refresh mid-promote (first rename after
    # the committed marker write); this one first — it reads the live
    # table, which the compaction fault below transiently empties
    runner.fs = _FailNthRename(fail_on=1)
    with pytest.raises(OSError, match="injected"):
        runner.refresh_daily_aggregate("visits", [202403])
    assert SWAP_COMMIT_MARKER in os.listdir(agg_path + "__staging")

    # interrupt a compaction swap the same way
    runner.fs = _FailNthRename(fail_on=1)
    with pytest.raises(OSError, match="injected"):
        runner.compact_table("visits", [202403], keys=["key"])
    assert SWAP_COMMIT_MARKER in os.listdir(path + "__compact")

    # a plain replication run converges BOTH interrupted swaps at entry
    runner.fs = LocalFS()
    runner.run_once(cl)
    assert not os.path.exists(path + "__compact")
    assert not os.path.exists(agg_path + "__staging")
    # compaction rolled forward: latest rows survive, duplicates gone
    live = spark.read.parquet(path)
    assert _latest(spark, path) == expected_latest
    assert live.groupBy("key").count().filter(F.col("count") > 1).count() == 0
    # the agg store is whole again (same days; the interrupted refresh
    # recomputed the same months, so the values are unchanged)
    agg_after = {
        (r["day"], r["n_rows"]) for r in spark.read.parquet(agg_path).collect()
    }
    assert agg_after == agg_before


# --- fault: torn commit marker ----------------------------------------------

def test_torn_commit_marker_is_treated_as_precommit_debris(spark, tmp_path):
    """A torn/empty _SWAP_COMMIT (non-atomic writer on an exotic store)
    must read as PRE-commit debris — not raise at every subsequent run
    entry until manual cleanup. The data renames only start after a
    successful marker write, so the live table is untouched by
    construction; recovery just drops the marker."""
    runner = ReplicationRunner(spark, RunConfig(target_dir=str(tmp_path / "wh")))
    cl = mk_changelog(spark)
    runner.run_once(cl)
    path = runner.table_path("visits")
    before = {r["seq"] for r in spark.read.parquet(path).collect()}

    staging = path + "__compact"
    os.makedirs(staging)
    with open(os.path.join(staging, SWAP_COMMIT_MARKER), "w") as f:
        f.write('{"promote": [202403')  # torn mid-write

    # next run: no raise, marker gone, live table untouched
    runner.run_once(cl)
    assert not os.path.exists(os.path.join(staging, SWAP_COMMIT_MARKER))
    assert {r["seq"] for r in spark.read.parquet(path).collect()} == before

    # the stale (marker-less) staging dir is ordinary debris the next
    # compaction overwrites
    runner.compact_table("visits", [202403], keys=["key"])
    assert not os.path.exists(staging)


def test_stale_live_path_marker_without_staging_is_cleaned(spark, tmp_path):
    """A whole-dir swap that crashes BETWEEN rename(staging, path) and
    marker removal leaves NO staging dir and a stale _SWAP_COMMIT
    inside the LIVE path. recover_all must remove it (previously this
    cleanup waited for the same maintenance job to re-run) — and must
    NOT count debris cleanup as a roll-forward."""
    runner = ReplicationRunner(spark, RunConfig(target_dir=str(tmp_path / "wh")))
    cl = mk_changelog(spark)
    runner.run_once(cl)
    path = runner.table_path("visits")
    before = {r["seq"] for r in spark.read.parquet(path).collect()}

    # simulate the post-rename crash: live dir carries the marker, no
    # staging dir exists (this table name has no staging suffix)
    with open(os.path.join(path, SWAP_COMMIT_MARKER), "w") as f:
        f.write('{"whole": true}')
    ledger_marker = os.path.join(runner.ledger_path, SWAP_COMMIT_MARKER)
    with open(ledger_marker, "w") as f:
        f.write('{"whole": true}')

    assert runner.recover_all() == 0  # debris cleanup, not a roll-forward
    assert not os.path.exists(os.path.join(path, SWAP_COMMIT_MARKER))
    assert not os.path.exists(ledger_marker)
    assert {r["seq"] for r in spark.read.parquet(path).collect()} == before


def test_recover_all_counts_only_true_roll_forwards(spark, tmp_path):
    """A torn marker in a staging dir is debris: recover_all removes it
    but returns 0; a committed (parsable) marker is a real interrupted
    swap and counts."""
    runner = ReplicationRunner(spark, RunConfig(target_dir=str(tmp_path / "wh")))
    cl = mk_changelog(spark)
    runner.run_once(cl)
    path = runner.table_path("visits")

    staging = path + "__compact"
    os.makedirs(staging)
    with open(os.path.join(staging, SWAP_COMMIT_MARKER), "w") as f:
        f.write('{"promote": [202403')  # torn mid-write
    assert runner.recover_all() == 0  # debris, not a recovery

    os.makedirs(staging, exist_ok=True)
    with open(os.path.join(staging, SWAP_COMMIT_MARKER), "w") as f:
        f.write('{"promote": [], "delete": []}')  # committed no-op swap
    assert runner.recover_all() == 1  # a true roll-forward


def test_write_text_atomic_never_leaves_partial_file(spark, tmp_path):
    """Both fs impls: the final name appears complete-or-not-at-all and
    the temp name never survives."""
    for fs in (LocalFS(), HadoopFS(spark, f"file://{tmp_path}")):
        target = str(tmp_path / f"marker_{type(fs).__name__}")
        fs.write_text_atomic(target, '{"promote": [1, 2]}')
        assert fs.read_text(target) == '{"promote": [1, 2]}'
        assert not fs.exists(target + ".__tmp")
        # overwrite path (HDFS rename refuses existing dst — must still work)
        fs.write_text_atomic(target, '{"whole": true}')
        assert fs.read_text(target) == '{"whole": true}'


def test_local_rmtree_failure_raises(tmp_path, monkeypatch):
    """A silently-surviving path must raise, not return: purge counts
    deleted files and swaps rename into the freed spot."""
    import shutil

    d = tmp_path / "stubborn"
    d.mkdir()
    (d / "x").write_text("data")
    monkeypatch.setattr(shutil, "rmtree", lambda *a, **k: None)
    with pytest.raises(OSError, match="rmtree failed"):
        LocalFS().rmtree(str(d))


# --- fault: neardup index crash around the ingest commit marker -------------

def test_neardup_crash_before_commit_marker_replays_cleanly(spark, tmp_path):
    """The index's analog of the data-write/ledger-write window. Round 10
    moved the ingest onto the journaled staged commit (sigs + bands +
    ids under ONE marker), so the old half-appended state is
    unreachable by construction; the two fault points that remain are
    the journal's own — marker never lands (pre-commit) and promotion
    stops between stores (post-commit) — both driven below, mirroring
    the substring-store matrix."""
    from mysql2clickhouse_spark.functions.minhash import verified_near_dups
    from mysql2clickhouse_spark.operators.neardup_index import MinHashIndex

    base = "the quick brown fox jumps over the lazy dog wearing suit number"
    docs = [(i, f"{base} {i} variant") for i in range(40)]
    # plant near-dup pairs inside the batch
    docs += [(1000 + i, f"{base} {i} variant!") for i in range(0, 40, 5)]
    batch = spark.createDataFrame(docs, "doc_id bigint, text string")

    one_shot = verified_near_dups(batch).select("id_a", "id_b", "jaccard")

    # PRE-COMMIT: staging written, marker never lands — the store must
    # stay untouched and the redelivery judge exactly like a first run
    idx = MinHashIndex(spark, str(tmp_path / "idx3"))
    idx.fs = _FailMarkerWrite()
    with pytest.raises(OSError, match="injected crash"):
        idx.add_batch(batch)
    assert not os.path.isdir(idx.sigs_path)  # nothing committed

    idx2 = MinHashIndex(spark, str(tmp_path / "idx3"))
    pairs = idx2.add_batch(batch)  # recover() clears the debris first
    assert not os.path.isdir(idx2.staging_path)
    assert idx2.pairs_equal(one_shot, pairs)
    sigs = spark.read.parquet(idx2.sigs_path)
    assert sigs.count() == sigs.select("doc_id").distinct().count()

    # and a SECOND redelivery (full crash replay) appends nothing
    again = idx2.add_batch(batch)
    assert again.count() == 0
    assert spark.read.parquet(idx2.sigs_path).count() == sigs.count()


def test_neardup_crash_mid_promotion_rolls_forward(spark, tmp_path):
    """Post-commit crash: the marker landed but promotion stopped after
    the sigs and bands files moved and before the IDS ledger files
    moved — byte-identical on disk to the pre-round-10 code's window
    (data stored, batch unledgered). recover() at the next entry must
    finish the promotion, so the replayed batch is dropped whole —
    never paired against its own first delivery's band rows — and a
    later batch still finds its cross-batch pairs from the store."""
    from mysql2clickhouse_spark.functions.minhash import verified_near_dups
    from mysql2clickhouse_spark.operators.neardup_index import MinHashIndex

    base = "the quick brown fox jumps over the lazy dog wearing suit number"
    b1 = spark.createDataFrame(
        [(i, f"{base} {i} variant") for i in range(40)],
        "doc_id bigint, text string",
    )
    b2 = spark.createDataFrame(
        [(1000 + i, f"{base} {i} variant!") for i in range(0, 40, 5)],
        "doc_id bigint, text string",
    )

    class _FailIdsPromotion(LocalFS):
        def rename(self, src: str, dst: str) -> None:
            if f"{os.sep}ids{os.sep}" in dst:
                raise OSError("injected crash before ids promotion")
            super().rename(src, dst)

    idx = MinHashIndex(spark, str(tmp_path / "idx"))
    idx.fs = _FailIdsPromotion()
    with pytest.raises(OSError, match="injected crash"):
        idx.add_batch(b1)
    # the dangerous state: data promoted, ledger not, marker present
    assert idx._has_files(idx.sigs_path)
    assert not idx._has_files(idx.ids_path)
    assert os.path.isfile(
        os.path.join(idx.staging_path, "_INGEST_COMMIT")
    )

    idx2 = MinHashIndex(spark, str(tmp_path / "idx"))
    replay = idx2.add_batch(b1)  # recover() finishes the promotion
    assert not os.path.isdir(idx2.staging_path)
    assert replay.count() == 0, "redelivery must be dropped whole"
    sigs = spark.read.parquet(idx2.sigs_path)
    assert sigs.count() == sigs.select("doc_id").distinct().count()

    # cross-batch pairs surface from the recovered store
    p2 = idx2.add_batch(b2)
    full = verified_near_dups(b1.unionByName(b2))
    want = full.filter(F.col("id_b") >= 1000)
    assert idx2.pairs_equal(want, p2)


# --- fault: substring index crash around the ingest commit marker -----------

def _ss_corpus(spark):
    b1 = spark.createDataFrame(
        [(1, "w1 w2 w3 w4 w5 w6"), (2, "x1 x2 x3 x4 x5"), (3, None)],
        "doc_id bigint, text string",
    )
    b2 = spark.createDataFrame(
        [(5, "x1 x2 x3 x4 x5"), (6, "y1 y2 w1 w2 w3 w4 y3")],
        "doc_id bigint, text string",
    )
    return b1, b2


def _ss_one_shot(spark, frames):
    from mysql2clickhouse_spark.functions.text import substring_dedup

    full = frames[0]
    for f in frames[1:]:
        full = full.unionByName(f)
    return sorted(tuple(r) for r in substring_dedup(full, 4).collect())


class _FailMarkerWrite(LocalFS):
    """Crash BEFORE the ingest commit point: the staged files exist but
    the _INGEST_COMMIT marker never lands."""

    def write_text_atomic(self, path: str, text: str) -> None:
        if path.endswith("_INGEST_COMMIT"):
            raise OSError("injected crash before ingest commit marker")
        super().write_text_atomic(path, text)


def test_substring_crash_before_commit_marker_replays_cleanly(spark, tmp_path):
    """Pre-commit crash: staging written, marker absent. The store must
    be untouched (debris cleared at the next entry), and the replayed
    batch must be judged as if the crashed attempt never happened — in
    particular it must NOT be judged against its own staged grams (the
    false-full-duplication failure the r8 verdict flagged)."""
    from mysql2clickhouse_spark.operators.substring_index import SubstringIndex

    b1, b2 = _ss_corpus(spark)
    idx = SubstringIndex(spark, str(tmp_path / "idx"), k=4, n_buckets=8)
    idx.fs = _FailMarkerWrite()
    with pytest.raises(OSError, match="injected crash"):
        idx.add_batch(b1)
    assert idx.n_grams() == 0  # store untouched: nothing committed

    idx2 = SubstringIndex(spark, str(tmp_path / "idx"), k=4, n_buckets=8)
    r1 = idx2.add_batch(b1)
    r2 = idx2.add_batch(b2)
    got = sorted(tuple(r) for r in r1.collect()) + sorted(
        tuple(r) for r in r2.collect()
    )
    assert sorted(got) == _ss_one_shot(spark, [b1, b2])
    # the debris staging dir is gone
    assert not os.path.isdir(idx2.staging_path)


def test_substring_crash_mid_promotion_rolls_forward(spark, tmp_path):
    """Post-commit crash: the marker landed but promotion stopped after
    the FIRSTS files moved and before the DOCS ledger files moved —
    byte-identical on disk to the r8 code's window (grams stored, batch
    unledgered). recover() at the next entry must finish the promotion,
    so the replayed batch is dropped whole — never re-judged against
    its own grams — and later batches still judge correctly."""
    from mysql2clickhouse_spark.operators.substring_index import SubstringIndex

    b1, b2 = _ss_corpus(spark)
    idx = SubstringIndex(spark, str(tmp_path / "idx"), k=4, n_buckets=8)
    # firsts for b1: doc1 has 3 grams, doc2 has 2 -> 5 files at most 8
    # buckets; fail the FIRST rename that targets the docs dir, so all
    # firsts files are promoted and zero docs files are
    class _FailDocsPromotion(LocalFS):
        def rename(self, src: str, dst: str) -> None:
            if f"{os.sep}docs{os.sep}" in dst:
                raise OSError("injected crash before docs promotion")
            super().rename(src, dst)

    idx.fs = _FailDocsPromotion()
    with pytest.raises(OSError, match="injected crash"):
        idx.add_batch(b1)
    # b1's correct report (what the crashed call had already built and
    # the caller lost): b1 judged against the empty store == one-shot
    want_b1 = _ss_one_shot(spark, [b1])
    # the promotion crashed mid-way: grams landed, ledger did not
    assert idx.n_grams() > 0
    assert not idx._has_files(os.path.join(str(tmp_path / "idx"), "docs"))
    assert os.path.isfile(
        os.path.join(str(tmp_path / "idx"), "__ingest_staging", "_INGEST_COMMIT")
    )

    # fresh entry converges, then the REPLAY of b1 is a no-op — the r8
    # code would have reported every b1 doc as fully duplicated here
    idx2 = SubstringIndex(spark, str(tmp_path / "idx"), k=4, n_buckets=8)
    replay = idx2.add_batch(b1)
    assert replay.count() == 0
    assert not os.path.isdir(idx2.staging_path)

    r2 = idx2.add_batch(b2)
    got = want_b1 + sorted(tuple(r) for r in r2.collect())
    assert sorted(got) == _ss_one_shot(spark, [b1, b2])
