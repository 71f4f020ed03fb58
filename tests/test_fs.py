"""Store-commit filesystem seam (mysql2clickhouse_spark/fs.py).

Pins: (a) the Hadoop-FileSystem implementation behaves like the POSIX
one over ``file://`` URIs (the only scheme reachable in this sandbox —
the class itself is scheme-agnostic); (b) the runner resolves the right
impl per target scheme; (c) an interrupted partition swap loses NOTHING:
promoted partitions are live, un-promoted ones stay staged, and
re-running the job converges the table — the at-least-once contract
(reference doc_old_duplicates.md:6-10)."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from mysql2clickhouse_spark.fs import HadoopFS, LocalFS, fs_for
from mysql2clickhouse_spark.operators.apply import latest_by_key
from mysql2clickhouse_spark.streaming.runner import ReplicationRunner, RunConfig

T0 = dt.datetime(2024, 3, 1)
SCHEMA = (
    "op string, table_name string, key bigint, seq bigint, file_seq bigint,"
    " ts timestamp, value double, event_type string"
)


@pytest.mark.parametrize("impl", ["local", "hadoop"])
def test_fs_impls_agree_on_lifecycle(spark, tmp_path, impl):
    root = str(tmp_path / "store")
    fs = LocalFS() if impl == "local" else HadoopFS(spark, f"file://{root}")
    fs.makedirs(os.path.join(root, "a"))
    with open(os.path.join(root, "a", "x.parquet"), "w") as f:
        f.write("data")
    assert fs.exists(root) and fs.is_dir(root)
    assert fs.listdir(root) == ["a"]
    assert fs.listdir(os.path.join(root, "a")) == ["x.parquet"]
    fs.rename(os.path.join(root, "a"), os.path.join(root, "b"))
    assert not fs.exists(os.path.join(root, "a"))
    assert fs.listdir(os.path.join(root, "b")) == ["x.parquet"]
    assert not fs.is_dir(os.path.join(root, "b", "x.parquet"))
    fs.rmtree(os.path.join(root, "b"))
    assert not fs.exists(os.path.join(root, "b"))
    fs.rmtree(os.path.join(root, "missing"))  # absent path: no error


def test_hadoop_rename_failure_raises(spark, tmp_path):
    fs = HadoopFS(spark, f"file://{tmp_path}")
    with pytest.raises(OSError, match="rename failed"):
        # missing source — Hadoop returns false; must surface, not no-op
        fs.rename(str(tmp_path / "nope"), str(tmp_path / "dst"))


def test_fs_for_picks_impl_by_scheme(spark, tmp_path):
    assert isinstance(fs_for(spark, str(tmp_path)), LocalFS)
    assert isinstance(fs_for(spark, f"file://{tmp_path}"), LocalFS)
    # (no namenode in the sandbox: constructing HadoopFS for hdfs://
    # resolves the authority eagerly — the Hadoop impl is exercised
    # over file:// URIs in the tests above/below instead)
    runner = ReplicationRunner(spark, RunConfig(target_dir=str(tmp_path / "wh")))
    assert isinstance(runner.fs, LocalFS)


class _FailNthRename(LocalFS):
    """Injects one rename failure (the mid-swap crash) then heals."""

    def __init__(self, fail_on: int):
        self.calls = 0
        self.fail_on = fail_on

    def rename(self, src: str, dst: str) -> None:
        self.calls += 1
        if self.calls == self.fail_on:
            raise OSError(f"injected rename failure #{self.calls}: {src}")
        super().rename(src, dst)


def test_rename_failure_mid_swap_preserves_staged_data(spark, tmp_path):
    """Kill the SECOND partition rename of a two-month compaction swap:
    the first month must be promoted, the second must SURVIVE in the
    staging dir (never deleted before full promotion), and re-running
    the same job must converge to the one-shot result."""
    runner = ReplicationRunner(spark, RunConfig(target_dir=str(tmp_path / "wh")))
    rows = []
    for i in range(120):
        key = i % 6
        ts = T0 + dt.timedelta(days=35 * (i % 2), minutes=i)
        rows.append(("I" if i < 60 else "U", "visits", key, i, 0, ts, float(i), "e"))
    cl = spark.createDataFrame(rows, SCHEMA)
    runner.run_once(cl)
    path = runner.table_path("visits")
    latest_before = {
        (r["key"], r["value"])
        for r in latest_by_key(
            spark.read.parquet(path), ["key"], "dateid"
        ).collect()
    }

    failing = _FailNthRename(fail_on=2)
    runner.fs = failing
    with pytest.raises(OSError, match="injected"):
        runner.compact_table("visits", [202403, 202404], keys=["key"])
    assert failing.calls == 2

    staging = path + "__compact"
    # the un-promoted month is still fully staged, together with the
    # committed swap manifest — nothing was lost, the swap can roll
    # forward
    staged_parts = sorted(
        d for d in os.listdir(staging) if d.startswith("yyyymm=")
    )
    assert staged_parts, "staging dir must survive a mid-swap failure"
    assert "_SWAP_COMMIT" in os.listdir(staging)

    # retry with a healthy fs: entry recovery rolls the interrupted
    # swap forward, then the job converges to the fully-compacted state
    runner.fs = LocalFS()
    runner.compact_table("visits", [202403, 202404], keys=["key"])
    assert not os.path.exists(staging)
    full = spark.read.parquet(path)
    assert full.groupBy("key").count().filter(F.col("count") > 1).count() == 0
    latest_after = {
        (r["key"], r["value"])
        for r in latest_by_key(full, ["key"], "dateid").collect()
    }
    assert latest_after == latest_before


def test_runner_end_to_end_through_hadoopfs_file_uri(spark, tmp_path):
    """The whole replication batch with the store-commit layer routed
    through Hadoop FileSystem (file:// in the sandbox): applies, swap
    commits, and read-back all work off the non-POSIX seam."""
    wh = str(tmp_path / "wh")
    runner = ReplicationRunner(spark, RunConfig(target_dir=wh))
    runner.fs = HadoopFS(spark, f"file://{wh}")
    rows = []
    for i in range(100):
        key = i % 8
        op = "I" if i % 5 in (0, 1) else ("U" if i % 5 in (2, 3) else "D")
        tbl = "visits" if key % 2 == 0 else "events_state"
        rows.append((op, tbl, key, i, i // 25, T0 + dt.timedelta(minutes=i), float(i), "e"))
    cl = spark.createDataFrame(rows, SCHEMA)
    r = runner.run_once(cl)
    assert r.rows_applied > 0
    runner.compact_table("visits", [202403], keys=["key"])
    vis = spark.read.parquet(runner.table_path("visits"))
    assert vis.groupBy("key").count().filter(F.col("count") > 1).count() == 0


def test_interrupted_ledger_compaction_recovers_before_next_run(spark, tmp_path):
    """A compact_ledger swap killed between rmtree(live) and the rename
    leaves the whole ledger staged. The NEXT run_once must roll it
    forward before resuming — otherwise it would resume from an empty
    ledger and a later recovery would clobber its appended rows."""
    import datetime as dt

    from pyspark.sql import functions as F

    T0 = dt.datetime(2024, 3, 1)
    runner = ReplicationRunner(
        spark, RunConfig(target_dir=str(tmp_path / "wh"), max_files_per_run=1)
    )
    rows = [
        ("I", "visits", i % 10, i, i // 50, T0 + dt.timedelta(minutes=i), float(i), "e")
        for i in range(100)
    ]
    cl = spark.createDataFrame(rows, SCHEMA)
    runner.run_once(cl)  # file 0
    resume = runner.resume_seq()
    assert resume == 49

    # interrupt the compaction exactly between rmtree(live) and rename:
    # rename is the FIRST fs.rename of the whole-dir swap
    failing = _FailNthRename(fail_on=1)
    runner.fs = failing
    with pytest.raises(OSError, match="injected"):
        runner.compact_ledger()
    assert not os.path.isdir(runner.ledger_path)  # live ledger is gone...
    assert os.path.isdir(runner.ledger_path + "__staging")  # ...but staged

    # next cron run: recovery happens inside run_once, resume point is
    # intact, and the run consumes the NEXT file instead of replaying
    runner.fs = LocalFS()
    r = runner.run_once(cl)
    assert r.start_seq == resume and r.end_seq == 99
    assert runner.resume_seq() == 99
