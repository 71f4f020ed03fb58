#!/usr/bin/env python
"""Round 12 ingest profiling: where does one MinHashIndex.add_batch
spend its wall at bench geometry? Builds the store_ops fixture (3 x
12k docs), then times one 2k-doc ingest broken into its pieces:
signing barrier, candidate materialization, verify materialization,
the three staging writes, journal commit. Also dumps the mining plan.

Read-only instrumentation: calls the same private fragments add_batch
composes, in the same order, against the same store — so the split is
additive and attributable.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from mysql2clickhouse_spark.operators.neardup_index import MinHashIndex  # noqa: E402
from mysql2clickhouse_spark.plans.extensions import _docs_with_mutants  # noqa: E402
from mysql2clickhouse_spark.session import get_spark, scratch_dir  # noqa: E402
from mysql2clickhouse_spark.session import release_cache, rotate_cache  # noqa: E402

from bench import STORE_OPS_BUILD_DOCS, STORE_OPS_INGEST_DOCS  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("m2c-profile-ingest")
    spark.range(100_000).groupBy((F.col("id") % 7).alias("k")).count().collect()

    OFF = 50_000_000
    corpus = (
        _docs_with_mutants(spark, sf_dir)
        .select("doc_id", "text")
        .limit(STORE_OPS_BUILD_DOCS)
        .localCheckpoint(eager=True)
    )
    sample = corpus.limit(STORE_OPS_INGEST_DOCS).localCheckpoint(eager=True)
    idx = MinHashIndex(spark, os.path.join(scratch_dir("m2c_prof_store_"), "nd"))
    t0 = time.perf_counter()
    for b in range(3):
        idx.add_batch(
            corpus.select((F.col("doc_id") + b * OFF).alias("doc_id"), "text")
        ).write.mode("overwrite").format("noop").save()
    print(f"build3: {time.perf_counter() - t0:.3f}s", flush=True)

    # warm-up ingest (codegen), same as bench
    idx.add_batch(
        sample.select((F.col("doc_id") + 9 * OFF).alias("doc_id"), "text")
    ).write.mode("overwrite").format("noop").save()

    for i in range(3):
        batch = sample.select(
            (F.col("doc_id") + (10 + i) * OFF).alias("doc_id"), "text"
        )
        spark.catalog.clearCache()
        split = {}
        t_all = time.perf_counter()
        # --- mirror add_batch step by step ---
        t0 = time.perf_counter()
        idx.recover()
        split["recover"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        b = batch
        try:  # r12 tree: the wide keyed exchange feeds dedup + signing
            from mysql2clickhouse_spark.operators.store_common import (
                batch_keyed_wide,
            )

            b = batch_keyed_wide(b, idx.id_col)
        except ImportError:
            pass
        b = b.dropDuplicates([idx.id_col])
        if idx._has_files(idx.ids_path):
            stored_ids = spark.read.parquet(idx.ids_path)
            b = b.join(stored_ids, idx.id_col, "left_anti")
        release_cache("neardup_index.add_batch")
        new = idx._batch_tables(b).persist()
        n_new = new.count()
        rotate_cache("neardup_index.add_batch", new)
        split["sign_barrier"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        new_sigs = new.filter(F.col("minhash").isNotNull()).select(
            idx.id_col, "minhash"
        )
        new_bands = idx._band_rows(new_sigs)
        cands = idx._candidates(new_bands)
        n_cands = cands.count()
        split["cands_count"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        pairs = idx._verified_pairs(cands, new)
        out = pairs.localCheckpoint(eager=True)
        split["mine_checkpoint"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        staging = idx.staging_path
        idx._sigs.stage_bucketed(new, os.path.join(staging, "sigs"))
        split["stage_sigs"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        idx._bands.stage_bucketed(new_bands, os.path.join(staging, "bands"))
        split["stage_bands"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        new.select(idx.id_col).write.mode("overwrite").parquet(
            os.path.join(staging, "ids")
        )
        split["stage_ids"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        idx._journal().commit()
        split["journal"] = time.perf_counter() - t0
        split["TOTAL"] = time.perf_counter() - t_all
        print(
            f"ingest[{i}] n_new={n_new} n_cands={n_cands} "
            + " ".join(f"{k}={v:.3f}" for k, v in split.items()),
            flush=True,
        )

    # one more: time cands+verify as ONE job (the real add_batch shape,
    # no separate cands count)
    for i in range(2):
        batch = sample.select(
            (F.col("doc_id") + (20 + i) * OFF).alias("doc_id"), "text"
        )
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        idx.add_batch(batch).write.mode("overwrite").format("noop").save()
        print(f"whole add_batch[{i}]: {time.perf_counter() - t0:.3f}s", flush=True)

    # dump the mining plan of a fresh batch for inspection
    batch = sample.select((F.col("doc_id") + 99 * OFF).alias("doc_id"), "text")
    b = batch.dropDuplicates([idx.id_col]).join(
        spark.read.parquet(idx.ids_path), idx.id_col, "left_anti"
    )
    new = idx._batch_tables(b).persist()
    new.count()
    new_bands = idx._band_rows(
        new.filter(F.col("minhash").isNotNull()).select(idx.id_col, "minhash")
    )
    pairs = idx._verified_pairs(idx._candidates(new_bands), new)
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        pairs.explain("formatted")
    with open("/tmp/ingest_mining_plan_r12.txt", "w") as f:
        f.write(buf.getvalue())
    print("plan dumped to /tmp/ingest_mining_plan_r12.txt", flush=True)


if __name__ == "__main__":
    main()
