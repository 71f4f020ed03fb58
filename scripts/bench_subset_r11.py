#!/usr/bin/env python
"""Re-measure a subset of headline queries with the bench's exact
methodology (sf0.1, min-of-N, noop sink, per-query sf0.001 codegen
warm-up, clearCache per sample). Usage:
    python scripts/bench_subset_r11.py q1_latest_join dedup_exact ...
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mysql2clickhouse_spark.plans import all_queries_extended  # noqa: E402
from mysql2clickhouse_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "5")))
    names = sys.argv[1:]
    spark = get_spark("m2c-bench-subset")
    spark.range(100_000).groupBy((F.col("id") % 7).alias("k")).count().collect()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1000).agg(
        F.count(F.lit(1))
    ).collect()
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s):
        return s

    spark.range(10_000).repartition(64).select(_warm(F.col("id"))).write.mode(
        "overwrite"
    ).format("noop").save()

    queries = all_queries_extended()
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    out = {}
    for name in names:
        fn = queries[name]
        fn(spark, warm_dir).write.mode("overwrite").format("noop").save()
        runs = []
        for _ in range(repeats):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            runs.append(round(time.perf_counter() - t0, 3))
        out[name] = {"min": min(runs), "samples": runs}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
