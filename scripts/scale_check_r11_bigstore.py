#!/usr/bin/env python
"""Probe pushdown at a store size where the scan actually dominates.

The sf0.1 probe A/B (scale_check_r11_probe.py) is honest but
under-powered: a 6-batch sf0.1 MinHash store is ~5M band rows, the
whole store joins in ~0.3 s on local[32] warm cache, and the pruning's
fixed key-collect job (~0.2-0.4 s) eats the saving
(fullscan_over_pruned 1.07). The 100 TB question is what happens when
the store side is big enough that scanning+joining it IS the probe's
cost — this script builds that store.

Protocol: synthesize a MinHash store of N_DOCS documents (default
2.5M → ~40M band rows + ~1.5 GB of signature arrays) through the
store's OWN staging+journal seam (stage_bucketed + StagedCommit — the
exact on-disk layout add_batch produces, without paying the signing
cost of 2.5M real documents), then run the REAL probe() for a fixed
20-doc batch, min-of-3, pruned vs probe_pruned-patched-to-identity
(the pre-r11 full-scan plan). The probe finds zero matches — the
common decontam outcome — so the measured wall is pure
candidate-mining cost.

Prints one JSON line:
  {"n_docs": N, "band_rows": R, "store_bytes": B,
   "pruned_wall": w, "fullscan_wall": w, "fullscan_over_pruned": r}

Usage: python scripts/scale_check_r11_bigstore.py [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from mysql2clickhouse_spark.operators import neardup_index  # noqa: E402
from mysql2clickhouse_spark.session import get_spark, scratch_dir  # noqa: E402
from mysql2clickhouse_spark.sources.tables import load_table  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_500_000
    spark = get_spark("scale-check-r11-bigstore")
    idx = neardup_index.MinHashIndex(
        spark, os.path.join(scratch_dir("m2c_bigstore_"), "nd")
    )
    bands, num_perm = idx.bands, idx.num_perm

    docs = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    # signature rows with the index's real geometry: the arrays are
    # synthetic but full-size, so the fullscan arm pays the true
    # array-decode cost the pruned arm skips
    sigs = docs.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(0), F.lit(49)),
            lambda i: F.pmod(
                F.xxhash64(F.col("doc_id"), i), F.lit(2_147_483_647)
            ).cast("int"),
        ).alias("hset"),
        F.transform(
            F.sequence(F.lit(0), F.lit(num_perm - 1)),
            lambda i: F.pmod(
                F.xxhash64(F.col("doc_id"), i, F.lit(7)), F.lit(2_147_483_647)
            ).cast("int"),
        ).alias("minhash"),
    )
    band_rows = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band_idx"),
    ).select(
        "band_idx",
        F.xxhash64("doc_id", "band_idx").alias("band_hash"),
        "doc_id",
    )
    t0 = time.perf_counter()
    staging = idx.staging_path
    idx._sigs.stage_bucketed(sigs, os.path.join(staging, "sigs"))
    idx._bands.stage_bucketed(band_rows, os.path.join(staging, "bands"))
    docs.write.mode("overwrite").parquet(os.path.join(staging, "ids"))
    idx._journal().commit()
    build = round(time.perf_counter() - t0, 1)

    probe = (
        load_table(spark, "/root/testdata/sf0.01", "documents")
        .select("doc_id", "text")
        .limit(20)
        .localCheckpoint(eager=True)
    )

    def wall(repeat=3):
        best = None
        for _ in range(repeat):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            idx.probe(probe).write.mode("overwrite").format("noop").save()
            w = time.perf_counter() - t0
            best = w if best is None else min(best, w)
        return round(best, 3)

    out = {
        "n_docs": n_docs,
        "band_rows": n_docs * bands,
        "store_bytes": idx.fs.du(idx.path),
        "build_wall": build,
        "pruned_wall": wall(),
    }
    orig = neardup_index.probe_pruned
    neardup_index.probe_pruned = lambda store, *a, **k: store
    try:
        out["fullscan_wall"] = wall()
    finally:
        neardup_index.probe_pruned = orig
    out["fullscan_over_pruned"] = round(
        out["fullscan_wall"] / out["pruned_wall"], 2
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
