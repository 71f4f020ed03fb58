#!/usr/bin/env python
"""Ingest-cost flatness probe for the round-9 maintained stores.

The plan pins prove the SHAPE (no Exchange above the bucketed store
side of the substring membership join; IVF/BM25 replay probes hit slim
ledgers); this probe measures the CLAIM those shapes exist for: per
batch ingest cost must stay ~flat as the store grows — O(batch), not
O(store). Equal-sized batches of fresh docs (ids offset per batch, so
nothing anti-joins away) are ingested one after another and each
``add_batch`` wall is recorded; a store with an O(store)-per-batch
term shows a rising sequence.

Prints one JSON line:
  {"sf": ..., "batches": B, "substr_walls": [...], "bm25_walls": [...],
   "substr_last_over_first": r, "bm25_last_over_first": r}

Caveat at test scale: per-job fixed overhead dominates small batches,
so mild drift is expected (file counts grow, the batch side's
anti-join ledger grows by design); what must NOT appear is
proportional growth (last/first ≈ B).

Usage: python scripts/scale_check_r9_ingest.py [sf_dir] [n_batches]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from mysql2clickhouse_spark.operators.bm25_index import BM25Index  # noqa: E402
from mysql2clickhouse_spark.operators.substring_index import (  # noqa: E402
    SubstringIndex,
)
from mysql2clickhouse_spark.session import get_spark, scratch_dir  # noqa: E402
from mysql2clickhouse_spark.sources.tables import load_table  # noqa: E402

OFF = 10_000_000


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    spark = get_spark("scale-check-r9-ingest")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def batch(i: int):
        # fresh ids per batch; same text, so later batches are the
        # adversarial all-duplicate input for the substring store
        return docs.select((F.col("doc_id") + i * OFF).alias("doc_id"), "text")

    out = {"sf": sf_dir, "batches": n_batches}
    base = scratch_dir("m2c_ingest_probe_")

    ss = SubstringIndex(spark, os.path.join(base, "ss"), k=10)
    walls = []
    for i in range(n_batches):
        t0 = time.perf_counter()
        ss.add_batch(batch(i)).write.mode("overwrite").format("noop").save()
        walls.append(round(time.perf_counter() - t0, 3))
    out["substr_walls"] = walls
    out["substr_last_over_first"] = round(walls[-1] / walls[0], 2)

    bm = BM25Index(spark, os.path.join(base, "bm25"))
    walls = []
    for i in range(n_batches):
        t0 = time.perf_counter()
        bm.add_batch(batch(i))
        walls.append(round(time.perf_counter() - t0, 3))
    out["bm25_walls"] = walls
    out["bm25_last_over_first"] = round(walls[-1] / walls[0], 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
