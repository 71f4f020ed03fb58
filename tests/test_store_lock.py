"""Advisory single-writer lock (reference B5, the r11 task list): a
timestamped ``_WRITER_LOCK`` at the store root, acquired by every
mutating entry point, refused while a foreign holder's stamp is fresh,
taken over once stale (the reference treats a lock older than 2× the
run budget as a crashed holder's leftover,
matomo2clickhouse.py:851-868). Reads (probe/search/stats) stay
lock-free.
"""

from __future__ import annotations

import json
import os
import time

import pytest

from mysql2clickhouse_spark.operators.store_common import (
    WRITER_LOCK,
    StoreLockedError,
)

BASE = "the quick brown fox jumps over the lazy dog wearing suit number"


def _batch(spark, off=0, n=10):
    return spark.createDataFrame(
        [(off + i, f"{BASE} {i} variant") for i in range(n)],
        "doc_id bigint, text string",
    )


def _foreign_lock(root: str, fresh: bool) -> None:
    now = time.time()
    with open(os.path.join(root, WRITER_LOCK), "w") as f:
        json.dump(
            {
                "owner": "someone-else",
                "acquired_at": now - 7200,
                "expires_at": now + (3600 if fresh else -3600),
            },
            f,
        )


def test_fresh_foreign_lock_refuses_every_mutation(spark, tmp_path):
    from mysql2clickhouse_spark.operators.neardup_index import MinHashIndex

    idx = MinHashIndex(spark, str(tmp_path / "nd"), n_buckets=4)
    idx.add_batch(_batch(spark))
    _foreign_lock(idx.path, fresh=True)
    with pytest.raises(StoreLockedError, match="locked by writer"):
        idx.add_batch(_batch(spark, off=100))
    with pytest.raises(StoreLockedError):
        idx.remove_batch(spark.createDataFrame([(1,)], "doc_id bigint"))
    with pytest.raises(StoreLockedError):
        idx.compact_buckets()
    with pytest.raises(StoreLockedError):
        idx.compact()
    # the refused mutations changed nothing
    assert spark.read.parquet(idx.sigs_path).count() == 10
    # reads stay lock-free
    assert idx.stats()["n_docs"] == 10
    assert idx.probe(_batch(spark, off=900)).count() >= 0
    os.remove(os.path.join(idx.path, WRITER_LOCK))


def test_stale_lock_taken_over_and_released(spark, tmp_path):
    from mysql2clickhouse_spark.operators.simhash_index import SimHashIndex

    idx = SimHashIndex(spark, str(tmp_path / "sh"), n_buckets=4)
    idx.add_batch(_batch(spark))
    _foreign_lock(idx.path, fresh=False)  # crashed holder, past TTL
    idx.add_batch(_batch(spark, off=100))  # takes over
    assert spark.read.parquet(idx.sigs_path).count() == 20
    # and the lock is released after the mutation completes
    assert not os.path.exists(os.path.join(idx.path, WRITER_LOCK))


def test_lock_is_per_instance_and_reentrant(spark, tmp_path):
    """Two index INSTANCES are two writers: while one's lock file is
    on disk (simulated mid-call), the other refuses; one instance's
    own sequential calls re-stamp freely."""
    from mysql2clickhouse_spark.operators.substring_index import SubstringIndex
    from mysql2clickhouse_spark.operators.store_common import writer_lock

    a = SubstringIndex(spark, str(tmp_path / "ss"), k=6, n_buckets=4)
    a.add_batch(_batch(spark))
    a.add_batch(_batch(spark, off=100))  # sequential self-calls fine
    b = SubstringIndex(spark, str(tmp_path / "ss"), k=6, n_buckets=4)
    with writer_lock(a.fs, a.path, a._writer_id):
        with pytest.raises(StoreLockedError):
            b.add_batch(_batch(spark, off=200))
        # reentrant: a's own nested acquire neither refuses nor drops
        # the outer hold on inner exit
        with writer_lock(a.fs, a.path, a._writer_id):
            pass
        assert os.path.exists(os.path.join(a.path, WRITER_LOCK))
    assert not os.path.exists(os.path.join(a.path, WRITER_LOCK))
    b.add_batch(_batch(spark, off=200))  # free again


def test_maintain_stores_honors_the_lock(spark, tmp_path):
    """Scheduled upkeep racing a live CLI writer: the store's fresh
    foreign lock surfaces as the spec's isolated error, never a
    concurrent rewrite."""
    from mysql2clickhouse_spark.operators.neardup_index import MinHashIndex
    from mysql2clickhouse_spark.streaming.runner import (
        ReplicationRunner,
        RunConfig,
    )

    store = str(tmp_path / "nd")
    idx = MinHashIndex(spark, store, n_buckets=4)
    for b in range(3):
        idx.add_batch(_batch(spark, off=b * 100))
    _foreign_lock(store, fresh=True)
    runner = ReplicationRunner(
        spark, RunConfig(target_dir=str(tmp_path / "wh"))
    )
    rep = runner.maintain_stores(
        [{"kind": "minhash", "path": store, "max_files": 4}]
    )
    assert rep[0]["compacted"] is False
    assert "locked by writer" in rep[0]["error"]


def test_cli_reports_locked_store_as_json_error(spark, tmp_path, capsys):
    """A CLI mutation against a fresh foreign lock exits 3 with a JSON
    error line — never a traceback."""
    from mysql2clickhouse_spark.cli import main
    from mysql2clickhouse_spark.operators.neardup_index import MinHashIndex

    store = str(tmp_path / "nd")
    MinHashIndex(spark, store, n_buckets=4).add_batch(_batch(spark))
    _foreign_lock(store, fresh=True)
    rc = main(["neardup", "--index-dir", store, "--compact"])
    assert rc == 3
    assert "locked by writer" in capsys.readouterr().out


def test_maintain_stores_applies_tombstones_opt_in(spark, tmp_path):
    """r12: a spec that sets ``max_tombstones`` routes pending deletes
    through the O(dirty buckets) ``compact_tombstones`` unit; without
    the key upkeep never applies tombstones (the old contract)."""
    from mysql2clickhouse_spark.operators.neardup_index import MinHashIndex
    from mysql2clickhouse_spark.streaming.runner import (
        ReplicationRunner,
        RunConfig,
    )

    store = str(tmp_path / "nd")
    idx = MinHashIndex(spark, store, n_buckets=4)
    idx.add_batch(_batch(spark, off=0, n=20))
    idx.remove_batch(spark.createDataFrame([(3,), (7,)], "doc_id bigint"))
    runner = ReplicationRunner(
        spark, RunConfig(target_dir=str(tmp_path / "wh"))
    )
    # no key -> tombstones untouched
    runner.maintain_stores(
        [{"kind": "minhash", "path": store, "max_files": 10_000}]
    )
    assert idx._has_files(idx.tombstones_path)
    # opt-in, threshold crossed -> applied physically and cleared
    rep = runner.maintain_stores(
        [
            {
                "kind": "minhash",
                "path": store,
                "max_files": 10_000,
                "max_tombstones": 1,
            }
        ]
    )
    assert rep[0]["tombstones_applied"]["n_tombstones_applied"] == 2
    assert not idx._has_files(idx.tombstones_path)
    assert (
        spark.read.parquet(idx.sigs_path).filter("doc_id in (3, 7)").count()
        == 0
    )
