#!/usr/bin/env python
"""Dump the store-ingest plan fragments r12 changed, as judge-checkable
files under plans/r12/:

- ``store_ingest_candidates_<suffix>.txt`` — the MinHashIndex
  ``_candidates`` fragment over a grown store (the occupancy +
  candidate-join DAG). With ``--force-gate`` the 256 MB size gate is
  zeroed so the AT-SCALE pruned form (BroadcastHashJoin LeftSemi above
  the bucketed store scan) is visible at test-store size; without it
  the dump shows the bench-scale plan (gate closed, store joins whole —
  the measured break-even).
- ``store_ingest_verify_<suffix>.txt`` — the ``_verified_pairs``
  fragment with the candidate-id-pruned sigs read (gate forced the
  same way).

Usage: python scripts/dump_store_plans_r12.py <suffix> [--force-gate]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from mysql2clickhouse_spark.operators import store_common  # noqa: E402
from mysql2clickhouse_spark.operators.neardup_index import MinHashIndex  # noqa: E402
from mysql2clickhouse_spark.plans.extensions import _docs_with_mutants  # noqa: E402
from mysql2clickhouse_spark.session import get_spark, scratch_dir  # noqa: E402


def dump(df, path: str) -> None:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    with open(path, "w") as f:
        f.write(buf.getvalue())
    print(f"wrote {path}")


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "after"
    if "--force-gate" in sys.argv:
        store_common.PROBE_PUSHDOWN_MIN_STORE_BYTES = 0
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", "r12")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("m2c-store-plan-dump")

    corpus = (
        _docs_with_mutants(spark, sf_dir)
        .select("doc_id", "text")
        .limit(4000)
        .localCheckpoint(eager=True)
    )
    idx = MinHashIndex(spark, os.path.join(scratch_dir("m2c_plandump_"), "nd"))
    idx.add_batch(corpus).write.mode("overwrite").format("noop").save()

    batch = corpus.limit(500).select(
        (F.col("doc_id") + 77_000_000).alias("doc_id"), "text"
    )
    b = store_common.batch_keyed_wide(batch, idx.id_col).dropDuplicates(
        [idx.id_col]
    )
    b = b.join(spark.read.parquet(idx.ids_path), idx.id_col, "left_anti")
    new = idx._batch_tables(b).persist()
    new.count()
    new_bands = idx._band_rows(
        new.filter(F.col("minhash").isNotNull()).select(idx.id_col, "minhash")
    )
    cands = idx._candidates(new_bands)
    dump(cands, os.path.join(out_dir, f"store_ingest_candidates_{suffix}.txt"))

    store_rows = None
    if store_common.PROBE_PUSHDOWN_MIN_STORE_BYTES == 0:
        cands_ck = cands.localCheckpoint(eager=True)
        store_rows = store_common.ingest_pruned(
            idx._sigs.read(),
            (idx.id_col,),
            cands_ck.select(F.col("id_a").alias(idx.id_col)).union(
                cands_ck.select(F.col("id_b").alias(idx.id_col))
            ),
        )
        cands = cands_ck
    pairs = idx._verified_pairs(cands, new, store_rows=store_rows)
    dump(pairs, os.path.join(out_dir, f"store_ingest_verify_{suffix}.txt"))


if __name__ == "__main__":
    main()
