#!/usr/bin/env python
"""O1 analog of the reference's batched-vs-row claim.

The reference reports ~12x end-to-end speedup from grouping per-table
INSERT VALUES into ~2000-row batches instead of executing row-at-a-time
(changelog matomo2clickhouse.py:43-44, README.md:396-398; tuning
constant _settings.py:75-77). Its row-at-a-time mode still exists as the
degraded/poison-isolation path (replication_batch_sql=0).

This script measures the same contrast on the Spark engine, using the
REAL replication runner both ways:

- batched: ONE run_once over the whole changelog slice (the hot path —
  one DataFrame job per table per run);
- row-at-a-time: RunConfig(batch_row_budget=1), run_once in a loop until
  caught up — the engine's actual degraded mode (B3/O8), one full
  resume->slice->apply->ledger cycle per row.

Prints one JSON line: {"batched_s": .., "per_row_s": .., "rows": N,
"speedup": ..}. The BASELINE.md target is speedup >= 10x; in practice
Spark's per-job overhead makes it far larger — which is exactly the
point of B1/O1: never apply rows one job at a time.

Usage: python scripts/bench_batch_vs_row.py [n_rows=50]
"""

from __future__ import annotations

import datetime as dt
import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from mysql2clickhouse_spark.session import get_spark  # noqa: E402
from mysql2clickhouse_spark.streaming.runner import (  # noqa: E402
    ReplicationRunner,
    RunConfig,
)

SCHEMA = (
    "op string, table_name string, key bigint, seq bigint, file_seq bigint,"
    " ts timestamp, value double, event_type string"
)


def mk_changelog(spark, n):
    t0 = dt.datetime(2024, 3, 1)
    rows = [
        (
            "I" if i % 3 else "U",
            "visits",
            i % 10,
            i,
            0,
            t0 + dt.timedelta(minutes=i),
            float(i),
            "e",
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, SCHEMA)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    spark = get_spark("batch-vs-row")
    cl = mk_changelog(spark, n).cache()
    cl.count()

    wh = tempfile.mkdtemp(prefix="b1_")
    try:
        # warm codegen/JIT on a throwaway target so neither side pays it
        warm = ReplicationRunner(spark, RunConfig(target_dir=f"{wh}/warm"))
        warm.run_once(cl)

        batched = ReplicationRunner(spark, RunConfig(target_dir=f"{wh}/batched"))
        t0 = time.perf_counter()
        batched.run_once(cl)
        t_batch = time.perf_counter() - t0

        row = ReplicationRunner(
            spark, RunConfig(target_dir=f"{wh}/row", batch_row_budget=1)
        )
        t0 = time.perf_counter()
        runs = 0
        while (row.resume_seq() or -1) < n - 1:
            row.run_once(cl)
            runs += 1
            if runs > n + 5:  # safety: never loop forever
                raise RuntimeError("row-at-a-time loop did not converge")
        t_row = time.perf_counter() - t0

        print(
            json.dumps(
                {
                    "batched_s": round(t_batch, 2),
                    "per_row_s": round(t_row, 2),
                    "rows": n,
                    "speedup": round(t_row / t_batch, 1),
                }
            )
        )
    finally:
        shutil.rmtree(wh, ignore_errors=True)


if __name__ == "__main__":
    main()
