#!/usr/bin/env python
"""Empirical scale probe for the round-8 operators.

Replicates the documents table k× (ids offset so rows are distinct —
every replica is an exact copy of its source doc, the adversarial
input for dedup ops: every gram/signature collides k ways) and times
each op at 1× and k×. Prints one JSON line:

  {"sf": ..., "k": ...,
   "substring_dedup_1x": s, "substring_dedup_kx": s,
   "minhash_fused_1x": s, "minhash_fused_kx": s}

What "passes": wall growth ≲ k for both —

- substring_dedup: three corpus×token exchanges; the k-way gram
  collisions stress exactly the partial-aggregated min-struct groupBy
  the docstring claims absorbs hot grams map-side (a window-over-gram
  formulation would sort k× rows per gram in one task);
- minhash fused pipeline (verified_near_dups): the round-8 layout fix
  (signed_partitioned) must hold its parallelism as the corpus grows —
  replicas multiply both the corpus AND the candidate-pair volume, so
  growth somewhat above k is expected from the k²-per-bucket verify
  join; what must NOT appear is the starved-partition cliff.

Usage: python scripts/scale_check_r8.py [sf_dir] [k]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from mysql2clickhouse_spark.functions.minhash import (  # noqa: E402
    verified_near_dups,
)
from mysql2clickhouse_spark.functions.text import substring_dedup  # noqa: E402
from mysql2clickhouse_spark.session import get_spark  # noqa: E402
from mysql2clickhouse_spark.sources.tables import load_table  # noqa: E402

OFF = 10_000_000


def timed(fn):
    fn()  # warm-up: codegen/broadcast/Python-worker spin-up off the clock
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("scale-check-r8")
    out = {"sf": sf_dir, "k": k}

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def docs_k(mult: int):
        d = docs
        for r in range(1, mult):
            d = d.unionByName(
                docs.select(
                    (F.col("doc_id") + r * OFF).alias("doc_id"), "text"
                )
            )
        return d

    def substr(mult: int):
        substring_dedup(docs_k(mult), 10).write.mode("overwrite").format(
            "noop"
        ).save()

    out["substring_dedup_1x"] = timed(lambda: substr(1))
    out["substring_dedup_kx"] = timed(lambda: substr(k))

    def minhash(mult: int):
        verified_near_dups(docs_k(mult), "doc_id", threshold=0.7).write.mode(
            "overwrite"
        ).format("noop").save()

    out["minhash_fused_1x"] = timed(lambda: minhash(1))
    out["minhash_fused_kx"] = timed(lambda: minhash(k))

    print(json.dumps(out))


if __name__ == "__main__":
    main()
