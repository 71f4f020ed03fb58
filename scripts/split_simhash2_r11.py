#!/usr/bin/env python
"""Finer simhash fingerprint split: which part of with_simhash costs."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mysql2clickhouse_spark.plans.extensions import _docs_with_mutants  # noqa: E402
from mysql2clickhouse_spark.session import get_spark  # noqa: E402


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("m2c-simhash-split2")
    spark.range(100_000).groupBy((F.col("id") % 7).alias("k")).count().collect()
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "6"))
    d = _docs_with_mutants(spark, sf_dir)

    lane_mask = 0x0001000100010001
    tokens = F.slice(
        F.filter(
            F.split(F.lower(F.trim(F.col("text"))), " +"),
            lambda t: F.length(t) > 0,
        ),
        1,
        32768,
    )
    ex = d.select(F.col("doc_id"), F.explode(tokens).alias("__tok")).withColumn(
        "__h", F.xxhash64("__tok")
    )
    lane_sums = [
        F.sum(F.shiftright("__h", i).bitwiseAND(F.lit(lane_mask))).alias(f"__l{i}")
        for i in range(16)
    ]
    staged = (
        ex.groupBy("doc_id")
        .agg(*lane_sums, F.count(F.lit(1)).alias("__n"))
        .select(
            F.col("doc_id"),
            F.array(*[F.col(f"__l{i}") for i in range(16)]).alias("__lanes"),
            "__n",
        )
    )

    def bit(k: int):
        i, j = k % 16, k // 16
        lane = F.shiftright(
            F.element_at("__lanes", i + 1), 16 * j
        ).bitwiseAND(F.lit(0xFFFF))
        return F.when(lane * 2 > F.col("__n"), F.lit(1)).otherwise(F.lit(0))

    half = 32
    hi = sum((bit(i) * F.lit(1 << (half - 1 - i)) for i in range(half)), F.lit(0))
    lo = sum((bit(half + i) * F.lit(1 << (half - 1 - i)) for i in range(half)), F.lit(0))
    sig = staged.select(
        F.col("doc_id"),
        F.format_string("%08x%08x", hi.cast("bigint"), lo.cast("bigint")).alias("simhash"),
    )

    cases = {
        "explode_only": ex,
        "lane_agg": staged,
        "full_sig": sig,
    }
    for name, df in cases.items():
        runs = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            noop(df)
            runs.append(round(time.perf_counter() - t0, 3))
        print(f"{name:14s} min={min(runs):7.3f} runs={runs}")


if __name__ == "__main__":
    main()
