#!/usr/bin/env python
"""Stage-split probe for dedup_simhash_pairs (round 11, guide §1):
time each pipeline stage from its persisted input with the noop sink,
so the split is additive and points at the expensive stage.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mysql2clickhouse_spark.functions.minhash import (  # noqa: E402
    _quarantine_hot_buckets,
    simhash_near_dups,
    with_simhash,
)
from mysql2clickhouse_spark.plans.extensions import _docs_with_mutants  # noqa: E402
from mysql2clickhouse_spark.session import get_spark  # noqa: E402


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("m2c-simhash-split")
    spark.range(100_000).groupBy((F.col("id") % 7).alias("k")).count().collect()

    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    out = {}

    def t(name, fn):
        runs = []
        for _ in range(repeats):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn()
            runs.append(round(time.perf_counter() - t0, 3))
        out[name] = (min(runs), runs)

    d = _docs_with_mutants(spark, sf_dir)
    print("corpus rows:", d.count())
    print(
        "avg text len:",
        d.agg(F.avg(F.length("text"))).collect()[0][0],
    )

    # 1. raw corpus scan+union+spread
    t("scan", lambda: noop(d.select("doc_id", "text")))

    # 2. fingerprint total (scan + explode + lane agg + hex extraction)
    t("fingerprint", lambda: noop(with_simhash(d, "text", attach=False)))

    # 3. whole query (fingerprint + banding + verify), as the bench runs it
    def whole():
        noop(
            simhash_near_dups(
                with_simhash(d, "text", attach=False), "doc_id"
            )
            .repartition(1)
            .sortWithinPartitions("id_a", "id_b")
        )

    t("whole_query", whole)

    # 4. banding+verify alone from a PERSISTED fingerprint frame
    sh = with_simhash(d, "text", attach=False).persist()
    sh.count()

    def pairs_only():
        noop(
            simhash_near_dups(sh, "doc_id")
            .repartition(1)
            .sortWithinPartitions("id_a", "id_b")
        )

    t("pairs_from_cached_sh", pairs_only)
    sh.unpersist()

    for k, (m, runs) in out.items():
        print(f"{k:24s} min={m:7.3f}  runs={runs}")


if __name__ == "__main__":
    main()
