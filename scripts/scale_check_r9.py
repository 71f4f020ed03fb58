#!/usr/bin/env python
"""Wire-width probe for exact-substring dedup (r8 verdict finding #3).

The baseline ``substring_dedup`` ships every k-gram occurrence as its
token STRING (~6x the corpus text at k=10) across two corpus-wide
exchanges; ``substring_dedup_two_level`` carries 8-byte gram hashes on
the full-corpus exchanges and strings only for multi-occurrence hash
buckets. Both are bit-exact (oracle-shared twin
``corpus_substring_dedup_two_level``); this probe decides which SHIPS
by measurement, replicating the documents table k ways (every replica
an exact copy — the adversarial all-duplicated input) and recording,
for each form at 1x and kx:

- wall seconds (min over the timed run after a warm-up run);
- SHUFFLE WRITE BYTES, summed from the Spark UI REST API's completed
  stages (delta across the timed run) — the wire cost the verdict
  asked to see, not an estimate from row widths.

Prints one JSON line:
  {"sf": ..., "k": ...,
   "baseline_1x": {"wall": s, "shuffle_mb": m}, "two_level_1x": {...},
   "baseline_kx": {...}, "two_level_kx": {...}}

Interpretation: at kx every gram collides k ways, so the duplicated
minority is the MAJORITY — the two-level form's worst case (prefilter
passes everything, pure overhead). A realistic mixed corpus sits at
1x, where testdata plants ~50% near-dup mutants. The decision and the
numbers land in BENCH_NOTES_r09.md.

Usage: python scripts/scale_check_r9.py [sf_dir] [k]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from mysql2clickhouse_spark.functions.text import (  # noqa: E402
    substring_dedup,
    substring_dedup_two_level,
)
from mysql2clickhouse_spark.sources.tables import load_table  # noqa: E402

OFF = 10_000_000
K_GRAM = 10


def get_spark() -> SparkSession:
    """session.get_spark minus the disabled UI — the REST metrics API
    is this probe's measurement instrument."""
    import os

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    return (
        SparkSession.builder.appName("scale-check-r9")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.retainedStages", "100000")
        .getOrCreate()
    )


def total_shuffle_write_bytes(spark: SparkSession) -> int:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}/stages?status=complete"
    with urllib.request.urlopen(url) as r:
        stages = json.load(r)
    return sum(int(s.get("shuffleWriteBytes", 0)) for s in stages)


def measured(spark: SparkSession, fn) -> dict:
    fn()  # warm-up: codegen/broadcast/worker spin-up off the clock
    b0 = total_shuffle_write_bytes(spark)
    t0 = time.perf_counter()
    fn()
    wall = round(time.perf_counter() - t0, 3)
    mb = round((total_shuffle_write_bytes(spark) - b0) / 1e6, 1)
    return {"wall": wall, "shuffle_mb": mb}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark()
    out: dict = {"sf": sf_dir, "k": k, "k_gram": K_GRAM}

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def docs_k(mult: int):
        d = docs
        for r in range(1, mult):
            d = d.unionByName(
                docs.select((F.col("doc_id") + r * OFF).alias("doc_id"), "text")
            )
        return d

    def run(fn, mult: int):
        return lambda: fn(docs_k(mult), K_GRAM).write.mode("overwrite").format(
            "noop"
        ).save()

    for mult, tag in ((1, "1x"), (k, "kx")):
        out[f"baseline_{tag}"] = measured(spark, run(substring_dedup, mult))
        out[f"two_level_{tag}"] = measured(
            spark, run(substring_dedup_two_level, mult)
        )

    print(json.dumps(out))


if __name__ == "__main__":
    main()
