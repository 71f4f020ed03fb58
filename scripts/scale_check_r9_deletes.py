#!/usr/bin/env python
"""Delete-lifecycle cost probe for the four maintained stores.

Round 9 completed the tombstone discipline (remove_batch → logical
deletion; compact → physical apply) across MinHash, Substring, BM25,
and IVF stores. The correctness certs pin VALUES; this probe measures
the COSTS the design claims:

- ``remove``       — tombstoning a fixed-size id set: one membership
  semi-join against the store's id ledger (slim for substring/BM25/IVF;
  the signature table for MinHash — a scan, never a store re-shuffle)
  plus the journaled tombstone commit;
- ``ingest_before`` vs ``ingest_after`` — a same-sized fresh batch
  ingested before and after the delete: the tombstone filter must not
  bend the O(batch) ingest contract (ratio ≈ 1, not O(tombstones));
- ``compact``      — the one full-store rewrite that applies the
  tombstones (O(store) by design, paid once per maintenance window);
- ``ingest_post_compact`` — flatness after the rewrite.

Prints one JSON line:
  {"sf": ..., "<store>": {"remove": s, "ingest_before": s,
   "ingest_after": s, "after_over_before": r, "compact": s,
   "ingest_post_compact": s}, ...}

Usage: python scripts/scale_check_r9_deletes.py [sf_dir]
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


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


def _lifecycle(idx, batch, doomed, ingest):
    """Build 2 batches, then: timed pre-delete ingest, remove, timed
    post-delete ingest, compact, timed post-compact ingest."""
    ingest(idx, batch(0))
    ingest(idx, batch(1))
    r = {}
    r["ingest_before"] = _timed(lambda: ingest(idx, batch(2)))
    r["remove"] = _timed(lambda: idx.remove_batch(doomed))
    r["ingest_after"] = _timed(lambda: ingest(idx, batch(3)))
    r["after_over_before"] = round(r["ingest_after"] / r["ingest_before"], 2)
    r["compact"] = _timed(idx.compact)
    r["ingest_post_compact"] = _timed(lambda: ingest(idx, batch(4)))
    return r


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("scale-check-r9-deletes")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dim = len(emb.select("embedding").first()[0])

    def dbatch(i: int):
        return docs.select((F.col("doc_id") + i * OFF).alias("doc_id"), "text")

    # tombstone 20% of batch 0 (ids are the raw doc ids)
    doomed = docs.filter(F.pmod("doc_id", F.lit(5)) == 2).select("doc_id")

    base = scratch_dir("m2c_del_probe_")
    out = {"sf": sf_dir}

    def drain(df):
        df.write.mode("overwrite").format("noop").save()

    nd = MinHashIndex(spark, os.path.join(base, "nd"), threshold=0.7)
    out["minhash"] = _lifecycle(
        nd, dbatch, doomed, lambda idx, b: drain(idx.add_batch(b))
    )

    sh = SimHashIndex(spark, os.path.join(base, "sh"))
    out["simhash"] = _lifecycle(
        sh, dbatch, doomed, lambda idx, b: drain(idx.add_batch(b))
    )

    ss = SubstringIndex(spark, os.path.join(base, "ss"), k=10)
    out["substring"] = _lifecycle(
        ss, dbatch, doomed, lambda idx, b: drain(idx.add_batch(b))
    )

    bm = BM25Index(spark, os.path.join(base, "bm25"))
    out["bm25"] = _lifecycle(
        bm, dbatch, doomed, lambda idx, b: idx.add_batch(b)
    )

    def ebatch(i: int):
        return emb.select((F.col("vec_id") + i * OFF).alias("vec_id"), "embedding")

    edoomed = emb.filter(F.pmod("vec_id", F.lit(5)) == 2).select("vec_id")
    iv = IVFIndex(spark, os.path.join(base, "ivf"), dim=dim, n_list=32)
    iv.build(ebatch(0))
    r = {}
    iv.add_batch(ebatch(1))
    r["ingest_before"] = _timed(lambda: iv.add_batch(ebatch(2)))
    r["remove"] = _timed(lambda: iv.remove_batch(edoomed))
    r["ingest_after"] = _timed(lambda: iv.add_batch(ebatch(3)))
    r["after_over_before"] = round(r["ingest_after"] / r["ingest_before"], 2)
    r["compact"] = _timed(iv.compact)
    r["ingest_post_compact"] = _timed(lambda: iv.add_batch(ebatch(4)))
    out["ivf"] = r

    print(json.dumps(out))


if __name__ == "__main__":
    main()
