#!/usr/bin/env python
"""Empirical scale probe for the replication runner (the CDC core).

Synthesizes a changelog of n rows (interleaved I/U/D over mixed
append/mutate tables, FIXTURES §F1 shape), runs ONE ``run_once`` into a
fresh target at n and at k·n, and prints one JSON line:

  {"n": ..., "k": ..., "run_1x": s, "run_kx": s, "growth": ...,
   "rows_1x": ..., "rows_kx": ...}

What "passes": growth ≲ k — the batch path is scan + per-table
partitioned writes + one bounded mutate fold; nothing quadratic, no
single-task stage (the budget cutoff is file-boundary based, the apply
is a pure partitioned append, the mutate fold touches only affected
partitions).

Usage: python scripts/scale_check_runner.py [n] [k]
"""

from __future__ import annotations

import datetime as dt
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from mysql2clickhouse_spark.session import get_spark, scratch_dir  # noqa: E402
from mysql2clickhouse_spark.streaming.runner import (  # noqa: E402
    ReplicationRunner,
    RunConfig,
)

T0 = dt.datetime(2024, 3, 1)


def changelog(spark, n: int):
    """n events, 1000 keys, 3 tables (one mutate-mode), n/5000-ish files."""
    base = spark.range(n).select(
        F.when(F.col("id") % 5 < 2, "I")
        .when(F.col("id") % 5 < 4, "U")
        .otherwise("D")
        .alias("op"),
        F.when(F.col("id") % 3 == 0, "visits")
        .when(F.col("id") % 3 == 1, "actions")
        .otherwise("events_state")
        .alias("table_name"),
        (F.col("id") % 1000).alias("key"),
        F.col("id").alias("seq"),
        F.floor(F.col("id") / 5000).cast("bigint").alias("file_seq"),
        (
            F.lit(T0) + F.make_interval(secs=F.col("id").cast("double"))
        ).alias("ts"),
        F.col("id").cast("double").alias("value"),
        F.lit("e").alias("event_type"),
    )
    return base


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("runner-scale")
    spark.sparkContext.setLogLevel("ERROR")

    out = {"n": n, "k": k}
    for mult, tag in ((1, "1x"), (k, "kx")):
        cl_dir = scratch_dir("m2c_rsc_") + "/cl"
        changelog(spark, n * mult).write.mode("overwrite").parquet(cl_dir)
        cl = spark.read.parquet(cl_dir)
        runner = ReplicationRunner(
            spark,
            RunConfig(
                target_dir=scratch_dir("m2c_rsc_") + "/wh",
                batch_row_budget=n * k * 2,   # never clamps
                max_files_per_run=10_000,
            ),
        )
        if tag == "1x":
            # warm codegen/pathing once on a throwaway target
            warm = ReplicationRunner(
                spark,
                RunConfig(target_dir=scratch_dir("m2c_rsc_") + "/warm",
                          batch_row_budget=n * k * 2, max_files_per_run=10_000),
            )
            warm.run_once(cl)
        t0 = time.perf_counter()
        rep = runner.run_once(cl)
        out[f"run_{tag}"] = round(time.perf_counter() - t0, 2)
        out[f"rows_{tag}"] = rep.rows_applied
    out["growth"] = round(out["run_kx"] / out["run_1x"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
