#!/usr/bin/env python
"""Focused interleaved A/B for r11 verdict task 7: the FULL
``dedup_simhash_pairs`` query with the JVM packed-lane vote aggregate
(current default) vs the Arrow/numpy signer (`with_simhash_arrow`, the
bit-identical twin), retried under the r11-prescribed variance fixes:
an explicit keyed repartition of the fingerprint frame before the
pairs job, and sized Arrow batches
(``spark.sql.execution.arrow.maxRecordsPerBatch``).

Variants, strict interleave, alternating within-pair order:
- ``aggregate``       — the shipped pipeline, untouched
- ``arrow_repart``    — Arrow signer + repartition(shuffle_n, id)
- ``arrow_repart_2k`` — same + maxRecordsPerBatch=2048 for its samples

The signer is monkeypatched at the symbol ``dedup_simhash_pairs``
resolves (``plans.extensions.with_simhash``), so each sample runs the
REAL query end-to-end. Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from mysql2clickhouse_spark.functions.minhash import (  # noqa: E402
    with_simhash,
    with_simhash_arrow,
)
from mysql2clickhouse_spark.plans import extensions  # noqa: E402
from mysql2clickhouse_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "7")))
    spark = get_spark("m2c-simhash-signer-ab")
    spark.range(100_000).groupBy((F.col("id") % 7).alias("k")).count().collect()
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s):
        return s

    spark.range(10_000).repartition(64).select(_warm(F.col("id"))).write.mode(
        "overwrite"
    ).format("noop").save()

    q = extensions.dedup_simhash_pairs
    default_batch = spark.conf.get(
        "spark.sql.execution.arrow.maxRecordsPerBatch", "10000"
    )

    def arrow_signer(df, text_col="text", bits=64, id_col="doc_id",
                     attach=True):
        shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
        return with_simhash_arrow(df, text_col, bits, id_col).repartition(
            shuffle_n, id_col
        )

    def run(tag):
        if tag == "aggregate":
            extensions.with_simhash = with_simhash
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", default_batch
            )
        else:
            extensions.with_simhash = arrow_signer
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch",
                "2048" if tag == "arrow_repart_2k" else default_batch,
            )
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        q(spark, sf_dir).write.mode("overwrite").format("noop").save()
        return round(time.perf_counter() - t0, 3)

    tags = ["aggregate", "arrow_repart", "arrow_repart_2k"]
    warm = "/root/testdata/sf0.001"
    if not os.path.isdir(warm):
        warm = sf_dir
    saved_sf = sf_dir  # warm each variant's codegen on the tiny dir
    sf_dir = warm
    for tag in tags:
        run(tag)
    sf_dir = saved_sf

    samples = {t: [] for t in tags}
    order_flip = list(tags)
    for r in range(repeats):
        seq = order_flip if r % 2 == 0 else list(reversed(order_flip))
        for tag in seq:
            samples[tag].append(run(tag))
            print(f"  r{r} {tag:16s} {samples[tag][-1]:7.3f}",
                  file=sys.stderr, flush=True)
    extensions.with_simhash = with_simhash  # restore
    out = {t: {"min": min(s), "samples": s} for t, s in samples.items()}
    agg = out["aggregate"]["min"]
    print(
        json.dumps(
            {
                "metric": "simhash_signer_ab_r12",
                "variants": out,
                "ratio_arrow_repart_over_aggregate": round(
                    out["arrow_repart"]["min"] / agg, 3
                ),
                "ratio_arrow_repart_2k_over_aggregate": round(
                    out["arrow_repart_2k"]["min"] / agg, 3
                ),
                "repeats": repeats,
            }
        )
    )


if __name__ == "__main__":
    main()
