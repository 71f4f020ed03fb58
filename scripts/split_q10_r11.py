#!/usr/bin/env python
"""Component split for q10_regional_revenue (guide §1)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mysql2clickhouse_spark.session import get_spark  # noqa: E402
from mysql2clickhouse_spark.sources.tables import load_table  # noqa: E402


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("m2c-q10-split")
    spark.range(100_000).groupBy((F.col("id") % 7).alias("k")).count().collect()
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "6"))

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )

    cases = {
        "li_scan3": li.select("l_orderkey", "l_extendedprice", "l_discount"),
        "li_scan3_agg": li.agg(F.sum(rev).cast("double"), F.count(F.lit(1))),
        "li_join_o": li.join(o, li.l_orderkey == o.o_orderkey).select(
            "l_extendedprice", "l_discount", "o_custkey"
        ),
        "li_join_o_agg": (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_custkey")
            .agg(F.sum(rev).alias("s"), F.count(F.lit(1)).alias("n"))
        ),
        "full_q10": (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .groupBy("r_name")
            .agg(F.sum(rev).cast("double").alias("revenue"),
                 F.count(F.lit(1)).alias("n_items"))
            .orderBy("r_name")
        ),
    }
    for name, df in cases.items():
        runs = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            noop(df)
            runs.append(round(time.perf_counter() - t0, 3))
        print(f"{name:16s} min={min(runs):7.3f} runs={runs}")


if __name__ == "__main__":
    main()
