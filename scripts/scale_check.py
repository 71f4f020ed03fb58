#!/usr/bin/env python
"""Empirical scale probe for the near-dup pipelines.

Replicates the ``documents`` corpus k× (ids offset so replicas are
distinct docs, texts perturbed per replica so near-dup group sizes stay
constant instead of growing with k) and times the MinHash+LSH and
SimHash pair pipelines at 1× and k×. Prints one JSON line:

  {"sf": ..., "k": ..., "minhash_1x": s, "minhash_kx": s,
   "simhash_1x": s, "simhash_kx": s}

What "passes": wall growth ≲ k (linear scan + bucketed joins; nothing
quadratic, no single-task stage). Pair output volume is kept k-linear
by the per-replica perturbation — an UN-perturbed replication would
inflate true near-dup group sizes to k+1 and the pair stage would grow
quadratically by problem definition, not by plan defect.

Usage: python scripts/scale_check.py [sf_dir] [k]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from mysql2clickhouse_spark.functions.minhash import (  # noqa: E402
    simhash_near_dups,
    verified_near_dups,
    with_simhash,
)
from mysql2clickhouse_spark.session import get_spark  # noqa: E402
from mysql2clickhouse_spark.sources.tables import load_table, spread  # noqa: E402

REP_OFFSET = 10_000_000


def corpus(spark, sf_dir: str, k: int):
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    alpha = "abcdefghijklmnopqrstuvwxyz"
    reps = [d]
    for r in range(1, k):
        # per-replica alphabet ROTATION: every character shingle changes,
        # so replicas share ~no shingles and group sizes stay constant as
        # k grows. (A prefix/suffix salt is NOT enough — a 200-shingle
        # doc with a 15-shingle salt still has Jaccard ≈ 0.93 to its
        # replica, which makes every replica set a true near-dup group
        # and the pair stage quadratic by problem definition.)
        rot = alpha[r % 26 :] + alpha[: r % 26]
        reps.append(
            d.select(
                (F.col("doc_id") + REP_OFFSET * r).alias("doc_id"),
                F.translate(F.col("text"), alpha, rot).alias("text"),
            )
        )
    out = reps[0]
    for rdf in reps[1:]:
        out = out.unionByName(rdf)
    return spread(out)


def run(label: str, df) -> float:
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return round(time.perf_counter() - t0, 2)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("scale-check")
    spark.sparkContext.setLogLevel("ERROR")

    out = {"sf_dir": sf_dir, "k": k}
    for kk, tag in ((1, "1x"), (k, "kx")):
        c = corpus(spark, sf_dir, kk)
        # warm codegen once per shape
        if tag == "1x":
            run("warm", verified_near_dups(c, "doc_id", threshold=0.7))
            run("warm", simhash_near_dups(with_simhash(c, "text", attach=False), "doc_id"))
            spark.catalog.clearCache()
        out[f"minhash_{tag}"] = run(
            tag, verified_near_dups(c, "doc_id", threshold=0.7)
        )
        spark.catalog.clearCache()
        out[f"simhash_{tag}"] = run(
            tag, simhash_near_dups(with_simhash(c, "text", attach=False), "doc_id")
        )
        spark.catalog.clearCache()
    out["minhash_growth"] = round(out["minhash_kx"] / out["minhash_1x"], 2)
    out["simhash_growth"] = round(out["simhash_kx"] / out["simhash_1x"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
