#!/usr/bin/env python
"""Ingest-cost flatness probe — ALL maintained stores (five as of r10).

Round 9's probe (scale_check_r9_ingest.py) certified O(batch) ingest
for the substring and BM25 stores only; the r9 adjudication flagged the
asymmetry — MinHash was precisely the store whose layout could NOT
deliver flat ingest (three O(store) joins per add_batch on plain
parquet), and IVF had no measurement at all. Round 10 moved MinHash
onto the bucketed-store + slim-ledger layout; this probe is the
measured counterpart of the new plan pins, for every store at once.

Protocol (same as r9): equal-sized batches of fresh docs/vectors (ids
offset per batch, so nothing anti-joins away) are ingested one after
another and each ``add_batch`` wall is recorded; a store with an
O(store)-per-batch term shows a rising sequence.

Prints one JSON line:
  {"sf": ..., "batches": B,
   "substr_walls": [...], "bm25_walls": [...],
   "minhash_walls": [...], "ivf_walls": [...],
   "<store>_last_over_first": r, ...}

Caveat at test scale: per-job fixed overhead dominates small batches,
so mild drift is expected (file counts grow; the MinHash candidate
join's output is genuinely larger when later batches duplicate earlier
ones — that is O(batch × dup-rate), not O(store)); what must NOT
appear is proportional growth (last/first ≈ B).

Usage: python scripts/scale_check_r10_ingest.py [sf_dir] [n_batches]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from mysql2clickhouse_spark.operators.ann_index import IVFIndex  # noqa: E402
from mysql2clickhouse_spark.operators.bm25_index import BM25Index  # noqa: E402
from mysql2clickhouse_spark.operators.neardup_index import (  # noqa: E402
    MinHashIndex,
)
from mysql2clickhouse_spark.operators.simhash_index import (  # noqa: E402
    SimHashIndex,
)
from mysql2clickhouse_spark.operators.substring_index import (  # noqa: E402
    SubstringIndex,
)
from mysql2clickhouse_spark.session import get_spark, scratch_dir  # noqa: E402
from mysql2clickhouse_spark.sources.tables import load_table  # noqa: E402

OFF = 10_000_000


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    spark = get_spark("scale-check-r10-ingest")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dim = len(emb.select("embedding").first()[0])

    def batch(i: int):
        # fresh ids per batch; same text, so later batches are the
        # adversarial all-duplicate input for the dedup stores
        return docs.select((F.col("doc_id") + i * OFF).alias("doc_id"), "text")

    def vbatch(i: int):
        return emb.select((F.col("vec_id") + i * OFF).alias("vec_id"), "embedding")

    out = {"sf": sf_dir, "batches": n_batches}
    base = scratch_dir("m2c_ingest_probe_")

    def run(tag, ingest):
        walls = []
        for i in range(n_batches):
            t0 = time.perf_counter()
            ingest(i)
            walls.append(round(time.perf_counter() - t0, 3))
        out[f"{tag}_walls"] = walls
        out[f"{tag}_last_over_first"] = round(walls[-1] / walls[0], 2)

    ss = SubstringIndex(spark, os.path.join(base, "ss"), k=10)
    run("substr", lambda i: ss.add_batch(batch(i))
        .write.mode("overwrite").format("noop").save())

    bm = BM25Index(spark, os.path.join(base, "bm25"))
    run("bm25", lambda i: bm.add_batch(batch(i)))

    nd = MinHashIndex(spark, os.path.join(base, "nd"))
    run("minhash", lambda i: nd.add_batch(batch(i))
        .write.mode("overwrite").format("noop").save())

    sh = SimHashIndex(spark, os.path.join(base, "sh"))
    run("simhash", lambda i: sh.add_batch(batch(i))
        .write.mode("overwrite").format("noop").save())

    iv = IVFIndex(spark, os.path.join(base, "ivf"), dim=dim)
    iv.build(vbatch(0))  # batch 0 trains the frozen quantizer
    run("ivf", lambda i: iv.add_batch(vbatch(i + 1)))

    print(json.dumps(out))


if __name__ == "__main__":
    main()
