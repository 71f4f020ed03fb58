#!/usr/bin/env python
"""Focused interleaved A/B for ARBITRARY headline queries vs the pinned
round-start ref (bench_ab.py REF_COMMIT) — the load-immune adjudicator
for this optimization round's per-query changes. Alternating
within-pair order per repeat (the corrected r11 protocol).

Run:  python scripts/bench_ab_subset_r11.py [-nN] query [query ...]
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

REF_PKG = "m2c_r11sref"


def main() -> None:
    repeats = 7
    names = []
    for a in sys.argv[1:]:
        if a.startswith("-n"):
            repeats = int(a[2:])
        else:
            names.append(a)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("m2c-bench-ab-subset")
    spark.range(100_000).groupBy((F.col("id") % 7).alias("k")).count().collect()
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s):
        return s

    spark.range(10_000).repartition(64).select(_warm(F.col("id"))).write.mode(
        "overwrite"
    ).format("noop").save()

    cur_reg = all_queries_extended()
    ref_reg = importlib.import_module(f"{REF_PKG}.plans").all_queries_extended()
    warm = "/root/testdata/sf0.001"
    if not os.path.isdir(warm):
        warm = sf_dir

    out: dict = {}
    for name in names:
        fc, fr = cur_reg[name], ref_reg[name]
        fc(spark, warm).write.mode("overwrite").format("noop").save()
        fr(spark, warm).write.mode("overwrite").format("noop").save()
        cs: list[float] = []
        rs: list[float] = []
        for r in range(repeats):
            pair = ((fc, cs), (fr, rs)) if r % 2 == 0 else ((fr, rs), (fc, cs))
            for fn, acc in pair:
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                acc.append(round(time.perf_counter() - t0, 3))
        ratio = round(min(cs) / min(rs), 3) if min(rs) > 0 else None
        out[name] = {
            "cur": min(cs), "ref": min(rs), "ratio": ratio,
            "cur_samples": cs, "ref_samples": rs,
        }
        print(
            f"  {name:26s} cur={min(cs):7.3f} ref={min(rs):7.3f} ratio={ratio}",
            file=sys.stderr, flush=True,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
