#!/usr/bin/env python
"""Focused re-adjudication interleave, r12 edition (r11 verdict task 5
and the standing >1.08 discipline): 9-repeat cur/ref A/B of the named
headline queries against the round-start pin ``m2c_r12sref``
(39e31ef), alternating the within-pair order per repeat — the
protocol whose order-swap experiment in r11 showed a fixed order
biases the first run of each clearCache'd pair by up to 1.4×.

Run:  PYTHONPATH=/root/repo:/root/repo/.ab \
          python scripts/bench_ab_focused_r12.py [query ...]
Default queries: the seven rows the r11 driver flagged regressed on
byte-identical code (the noise re-adjudication set).
"""

from __future__ import annotations

import importlib
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, ".ab"))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from mysql2clickhouse_spark.plans import all_queries_extended  # noqa: E402
from mysql2clickhouse_spark.session import get_spark  # noqa: E402

REF_PKG = "m2c_r12sref"
REPEATS = 9

#: the rows PERF_r11 marked regressed although r11 did not touch them
DEFAULT = [
    "ann_cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "text_stats",
    "q1_latest_window",
    "q2_duplicate_audit",
    "dedup_embedding_cosine",
]


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("m2c-bench-ab-focused-r12")
    spark.range(100_000).groupBy((F.col("id") % 7).alias("k")).count().collect()
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s):
        return s

    spark.range(10_000).repartition(64).select(_warm(F.col("id"))).write.mode(
        "overwrite"
    ).format("noop").save()

    cur_q = all_queries_extended()
    ref_q = importlib.import_module(f"{REF_PKG}.plans").all_queries_extended()
    warm = "/root/testdata/sf0.001"
    if not os.path.isdir(warm):
        warm = sf_dir

    out: dict = {}
    for name in names:
        fc, fr = cur_q[name], ref_q[name]
        fc(spark, warm).write.mode("overwrite").format("noop").save()
        fr(spark, warm).write.mode("overwrite").format("noop").save()
        cs: list[float] = []
        rs: list[float] = []
        for r in range(REPEATS):
            pair = ((fc, cs), (fr, rs)) if r % 2 == 0 else ((fr, rs), (fc, cs))
            for fn, acc in pair:
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                acc.append(round(time.perf_counter() - t0, 3))
        ratio = round(min(cs) / min(rs), 3) if min(rs) > 0 else None
        out[name] = {
            "cur": min(cs),
            "ref": min(rs),
            "ratio": ratio,
            "cur_samples": cs,
            "ref_samples": rs,
        }
        print(
            f"  {name:26s} cur={min(cs):7.3f} ref={min(rs):7.3f} ratio={ratio}",
            file=sys.stderr,
            flush=True,
        )
    print(
        json.dumps(
            {
                "metric": "ab_focused_r12",
                "queries": out,
                "repeats": REPEATS,
                "ref_pkg": REF_PKG,
            }
        )
    )


if __name__ == "__main__":
    main()
