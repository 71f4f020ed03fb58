#!/usr/bin/env python
"""r12 scaling evidence (r11 verdict task 6): at sf0.1 every headline
query is stage-latency-bound — the driver's 8-core run BEATS its
32-core run, so per-query deltas under ±30% say nothing about scale
behavior. This probe builds a DETERMINISTIC larger corpus (sf0.1
documents replicated K× with disjoint id ranges and per-replica text
salts — no RNG, same recipe as the planted-mutant fixtures) and times
the compute-bound dedup legs at the caller's core count. Run it twice:

    SPARK_GRAFT_CPUS=32 python scripts/scale_check_r12_cores.py
    SPARK_GRAFT_CPUS=8  python scripts/scale_check_r12_cores.py

and compare — a path that parallelizes shows wall(8) / wall(32) well
above 1 at this size (the headline bench at sf0.1 shows ≤ 1.0 on every
query). Prints one JSON line per leg.

This is an EVIDENCE script, not a bench-contract change: bench.py's
frozen query set, SF handling and JSON line stay exactly as the driver
expects.
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
    verified_near_dups,
    simhash_near_dups,
    with_simhash,
)
from mysql2clickhouse_spark.session import get_spark  # noqa: E402
from mysql2clickhouse_spark.sources.tables import load_table  # noqa: E402

K = int(os.environ.get("SCALE_K", "8"))


def big_corpus(spark, sf_dir: str):
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    reps = [
        d.select(
            (F.col("doc_id") + i * 10_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" replica {i}")).alias("text"),
        )
        for i in range(K)
    ]
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("m2c-scale-cores")
    spark.range(100_000).groupBy((F.col("id") % 7).alias("k")).count().collect()
    corpus = big_corpus(spark, sf_dir)
    n = corpus.count()

    legs = {
        "minhash_full": lambda: verified_near_dups(corpus, "doc_id"),
        "simhash_full": lambda: simhash_near_dups(
            with_simhash(corpus, "text", attach=False), "doc_id"
        ),
    }
    for name, fn in legs.items():
        spark.catalog.clearCache()
        samples = []
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn().write.mode("overwrite").format("noop").save()
            samples.append(round(time.perf_counter() - t0, 3))
        print(
            json.dumps(
                {
                    "leg": name,
                    "cpus": cpus,
                    "k": K,
                    "n_docs": n,
                    "wall_min": min(samples),
                    "samples": samples,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
