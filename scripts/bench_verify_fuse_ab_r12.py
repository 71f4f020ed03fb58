#!/usr/bin/env python
"""r11 verdict task 4: attack dedup_minhash_lsh's verify-stage count.
Interleaved A/B of the shipped 4-join verify (sa/sb sig joins →
estimate filter → ha/hb hset joins) vs the "one sigs probe" fusion the
verdict sketched: explode each candidate pair into its two ids, join
the (sig, hset) side ONCE, regroup per pair, then estimate-filter and
jaccard in a single projection.

Scale honesty up front: the fused form attaches hset alongside the
signature BEFORE the estimate filter — at 100 TB that ships hset bytes
for every banded candidate, the exact thing the two-phase form exists
to avoid — so the fusion could only ever be adopted behind a
local-size gate. This script measures whether it even wins locally.
Equality is asserted once per session (exceptAll both ways) before
timing. Prints ONE JSON line.
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
    DEFAULT_ESTIMATE_MARGIN,
    DEFAULT_NUM_PERM,
    DEFAULT_THRESHOLD,
    estimated_jaccard_col,
    jaccard_col,
    lsh_candidate_pairs,
    signed_partitioned,
    with_hset,
)
from mysql2clickhouse_spark.plans.extensions import _docs_with_mutants  # noqa: E402
from mysql2clickhouse_spark.session import get_spark  # noqa: E402


def current_form(spark, sf_dir):
    d = _docs_with_mutants(spark, sf_dir)
    base = with_hset(d, "text", 5).select("doc_id", "hset").persist()
    sigs = signed_partitioned(base, "doc_id").persist()
    sigs.count()
    cands = lsh_candidate_pairs(sigs, "doc_id")
    sa = sigs.select(F.col("doc_id").alias("id_a"), F.col("minhash").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("id_b"), F.col("minhash").alias("sig_b"))
    plausible = (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "est",
            estimated_jaccard_col(F.col("sig_a"), F.col("sig_b"), DEFAULT_NUM_PERM),
        )
        .filter(F.col("est") >= DEFAULT_THRESHOLD - DEFAULT_ESTIMATE_MARGIN)
        .select("id_a", "id_b")
    )
    ha = base.select(F.col("doc_id").alias("id_a"), F.col("hset").alias("h_a"))
    hb = base.select(F.col("doc_id").alias("id_b"), F.col("hset").alias("h_b"))
    out = (
        plausible.join(ha, "id_a")
        .join(hb, "id_b")
        .withColumn("jaccard", F.round(jaccard_col(F.col("h_a"), F.col("h_b")), 4))
        .filter(F.col("jaccard") >= DEFAULT_THRESHOLD)
        .select("id_a", "id_b", "jaccard")
    )
    return out, (base, sigs)


def fused_form(spark, sf_dir):
    d = _docs_with_mutants(spark, sf_dir)
    base = with_hset(d, "text", 5).select("doc_id", "hset").persist()
    sigs = signed_partitioned(base, "doc_id").persist()
    sigs.count()
    cands = lsh_candidate_pairs(sigs, "doc_id")
    both = sigs.join(base, "doc_id")  # (doc_id, minhash, hset) — one probe side
    edges = cands.select(
        "id_a", "id_b", F.explode(F.array("id_a", "id_b")).alias("doc_id")
    )
    joined = edges.join(both, "doc_id")
    agg = joined.groupBy("id_a", "id_b").agg(
        F.max(F.when(F.col("doc_id") == F.col("id_a"), F.col("minhash"))).alias("sig_a"),
        F.max(F.when(F.col("doc_id") == F.col("id_b"), F.col("minhash"))).alias("sig_b"),
        F.max(F.when(F.col("doc_id") == F.col("id_a"), F.col("hset"))).alias("h_a"),
        F.max(F.when(F.col("doc_id") == F.col("id_b"), F.col("hset"))).alias("h_b"),
    )
    out = (
        agg.withColumn(
            "est",
            estimated_jaccard_col(F.col("sig_a"), F.col("sig_b"), DEFAULT_NUM_PERM),
        )
        .filter(F.col("est") >= DEFAULT_THRESHOLD - DEFAULT_ESTIMATE_MARGIN)
        .withColumn("jaccard", F.round(jaccard_col(F.col("h_a"), F.col("h_b")), 4))
        .filter(F.col("jaccard") >= DEFAULT_THRESHOLD)
        .select("id_a", "id_b", "jaccard")
    )
    return out, (base, sigs)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "7")))
    spark = get_spark("m2c-verify-fuse-ab")
    spark.range(100_000).groupBy((F.col("id") % 7).alias("k")).count().collect()
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s):
        return s

    spark.range(10_000).repartition(64).select(_warm(F.col("id"))).write.mode(
        "overwrite"
    ).format("noop").save()

    # equality gate at sf0.001 (cheap, exact)
    tiny = "/root/testdata/sf0.001"
    a, fa = current_form(spark, tiny)
    b, fb = fused_form(spark, tiny)
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty(), "forms differ!"
    for f in fa + fb:
        f.unpersist()
    print("equality gate passed at sf0.001", file=sys.stderr, flush=True)

    forms = {"current": current_form, "fused": fused_form}
    samples = {t: [] for t in forms}
    for t, fn in forms.items():  # codegen warm
        out, fr = fn(spark, tiny)
        out.write.mode("overwrite").format("noop").save()
        for f in fr:
            f.unpersist()
    for r in range(repeats):
        seq = list(forms) if r % 2 == 0 else list(reversed(list(forms)))
        for t in seq:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            out, fr = forms[t](spark, sf_dir)
            out.write.mode("overwrite").format("noop").save()
            samples[t].append(round(time.perf_counter() - t0, 3))
            for f in fr:
                f.unpersist()
            print(f"  r{r} {t:8s} {samples[t][-1]:7.3f}",
                  file=sys.stderr, flush=True)
    out = {t: {"min": min(s), "samples": s} for t, s in samples.items()}
    print(
        json.dumps(
            {
                "metric": "verify_fuse_ab_r12",
                "variants": out,
                "ratio_fused_over_current": round(
                    out["fused"]["min"] / out["current"]["min"], 3
                ),
                "repeats": repeats,
            }
        )
    )


if __name__ == "__main__":
    main()
