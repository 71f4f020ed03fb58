#!/usr/bin/env python
"""Focused interleaved A/B: the FULL fused ``dedup_minhash_lsh`` query
with the Arrow signer (current default) vs the aggregate signer (the
r5 form), alternated in ONE SparkSession.

Motivation: the whole-headline A/B (``scripts/bench_ab.py``) shows
every query within ~1.05x of the r5 floor run-over-run EXCEPT
``dedup_minhash_lsh``, which oscillates (1.02 in one run, 1.26 in
another). Git proves the ONLY code delta on that path since the r5
floor is the signer swap (commit 0f11722): the aggregate form's own
exchange used to leave the persisted ``sigs`` hash-partitioned for the
downstream estimate-filter joins, which the zero-shuffle Arrow form
does not — so a faster sign stage could still lose whole-query. This
harness isolates exactly that variable: same tree, same session, same
inputs, signer monkeypatched per sample, strict interleave so box
drift cancels out of the ratio.

A third variant probes the repair hypothesis: ``arrow_repart`` = the
Arrow signer followed by an explicit ``repartition(id)`` before the
persist, recovering the doc-id layout the aggregate form's exchange
used to leave for the estimate-filter joins while keeping the cheaper
sign.

Verdict (sf0.1, repeats=7, min): arrow-as-scanned 4.048 s, aggregate
3.020 s, arrow_repart 2.662 s — the regression was real (the Arrow
form inherits the scan's file layout and starves the downstream band
stages of parallelism) and the repair beats both, so
``verified_near_dups`` now repartitions the Arrow sigs on the id
before its persist. NOTE: this script monkeypatches the signer that
``verified_near_dups`` resolves at call time, and post-fix the
function ALSO applies its own repartition — re-runs therefore measure
each signer + that repartition (``arrow`` ≈ ``arrow_repart``); the
numbers above are the pre-fix tree's (commit faf7b6d).

Run:  python scripts/bench_signer_ab.py  [SPARK_GRAFT_BENCH_REPEATS=7]
Prints ONE JSON line:
  {"metric": "signer_ab", "variants": {name: {"min": s,
   "samples": [...]}}, "ratio_arrow_over_aggregate": r}
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from mysql2clickhouse_spark.functions import minhash  # noqa: E402
from mysql2clickhouse_spark.plans import all_queries_extended  # noqa: E402
from mysql2clickhouse_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "7")))
    spark = get_spark("m2c-signer-ab")

    q = all_queries_extended()["dedup_minhash_lsh"]
    arrow_fn = minhash.minhash_signatures_arrow
    agg_fn = minhash.minhash_signatures

    def arrow_repart_fn(hashed, id_col="doc_id", num_perm=48, seed=42):
        shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
        return arrow_fn(hashed, id_col, num_perm, seed).repartition(
            shuffle_n, id_col
        )

    variants = [
        ("arrow", arrow_fn),
        ("aggregate", agg_fn),
        ("arrow_repart", arrow_repart_fn),
    ]

    # warm every variant (JIT, Arrow worker pool, parquet reader)
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for _, fn in variants:
        minhash.minhash_signatures_arrow = fn
        q(spark, warm_dir).write.mode("overwrite").format("noop").save()

    samples: dict[str, list[float]] = {name: [] for name, _ in variants}
    for _ in range(repeats):
        for name, fn in variants:
            # verified_near_dups resolves the signer as a module global
            # at call time, so swapping the attribute swaps the variant
            minhash.minhash_signatures_arrow = fn
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            q(spark, sf_dir).write.mode("overwrite").format("noop").save()
            samples[name].append(round(time.perf_counter() - t0, 3))
            print(
                f"  {name:13s} {samples[name][-1]:7.3f}",
                file=sys.stderr,
                flush=True,
            )
    minhash.minhash_signatures_arrow = arrow_fn
    print(
        json.dumps(
            {
                "metric": "signer_ab",
                "variants": {
                    name: {"min": min(s), "samples": s}
                    for name, s in samples.items()
                },
                "ratio_arrow_over_aggregate": round(
                    min(samples["arrow"]) / min(samples["aggregate"]), 3
                ),
                "repeats": repeats,
            }
        )
    )


if __name__ == "__main__":
    main()
