#!/usr/bin/env python
"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>,
   "repeats": n, "samples": {name: [sec, ...]},
   "minhash_stages": {stage: sec, ...}}

Methodology (v2, round 5): each query is measured ``REPEATS`` times
(default 5, override SPARK_GRAFT_BENCH_REPEATS) and reported as the
per-query MINIMUM — the box has documented 2-4x residual-load variance
(BENCH_r04 regressed every untouched query uniformly), and min-of-n is
the standard way to separate machine load from real plan cost. All
samples ship in "samples" so the spread itself is visible. The query
set and warm-up protocol are FROZEN from round 1 so totals stay
comparable; "value" = sum of per-query minima.

Each run executes fully (noop sink — results materialize through the
whole plan without driver-side transfer skew) from a cold cache
(clearCache before every sample).

"minhash_stages" is the dedup_minhash_lsh wall-time split (hset / sign
/ band_join / verify) measured from persisted inputs — the stage
breakdown that decides whether routing the pipeline through a
precomputed signature store (operators/neardup_index.py) would pay.
"dedup_minhash_indexed" then MEASURES that store-backed path: build
once, run the recurring band+verify from the stored sig/hset parquet,
and report warm_over_scratch vs the headline dedup_minhash_lsh minimum
from the same session.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from mysql2clickhouse_spark.plans import all_queries_extended  # noqa: E402
from mysql2clickhouse_spark.session import get_spark  # noqa: E402

#: headline set — one per operator family (SURVEY §2); the rest of the
#: query corpus is covered by the driver's correctness run.
#:
#: Committed reference points, sf0.1 on local[32] (BENCH_r01.json):
#:   r1 total 23.76 s; heaviest: dedup_minhash_lsh 4.74,
#:   dedup_simhash_pairs 4.10, dedup_embedding_cosine 2.60,
#:   q1_latest_window 1.63, q10_regional_revenue 1.45
HEADLINE = [
    "q1_latest_window",        # Q1 dedup view (window form)
    "q1_latest_join",          # Q1 faithful groupBy+join form
    "q2_duplicate_audit",      # Q2 audit join
    "q3_dedup_window",         # Q3 windowed compaction
    "q8_daily_volume",         # agg profile
    "q10_regional_revenue",    # flagship join chain
    "cdc_apply_ins_upd",       # hot-path append rewrite
    "cdc_apply_mutate",        # merge-mode replay
    "cdc_ledger_summary",      # ledger agg
    "dedup_exact",             # hash dedup
    "dedup_minhash_lsh",       # MinHash+LSH near-dup
    "dedup_simhash_pairs",     # SimHash banding near-dup
    "dedup_embedding_cosine",  # embedding-cosine near-dup
    "text_stats",              # text feature pass
    "ann_cosine_topk",         # brute-force ANN baseline
    "ann_lsh_topk",            # bucketed ANN
    "ann_ivf_topk",            # IVF-flat ANN (inverted-list scale path)
]


def minhash_stage_split(spark, sf_dir: str) -> dict[str, float]:
    """Wall-time split of the dedup_minhash_lsh pipeline, each stage
    measured FROM ITS PERSISTED INPUT (so the split is additive):
    hset (scan+shingle+hash), sign (signature aggregation), band_join
    (LSH banding self-join -> distinct candidates), verify (estimate
    filter + exact Jaccard). band_join+verify is what the query would
    cost if signatures were read from the incremental
    ``neardup_index`` store instead of recomputed per run."""
    from mysql2clickhouse_spark.functions.minhash import (
        estimated_jaccard_col,
        jaccard_col,
        lsh_candidate_pairs,
        minhash_signatures_arrow,
        with_hset,
    )
    from mysql2clickhouse_spark.plans.extensions import _docs_with_mutants

    out: dict[str, float] = {}
    spark.catalog.clearCache()
    d = _docs_with_mutants(spark, sf_dir)

    t0 = time.perf_counter()
    base = with_hset(d, "text", 5).select("doc_id", "hset").persist()
    base.count()
    out["hset"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    # the signer the pipeline actually runs (round 6: arrow form)
    sigs = minhash_signatures_arrow(base, "doc_id").persist()
    sigs.count()
    out["sign"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    cands = lsh_candidate_pairs(sigs, "doc_id").persist()
    cands.count()
    out["band_join"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    sa = sigs.select(F.col("doc_id").alias("id_a"), F.col("minhash").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("id_b"), F.col("minhash").alias("sig_b"))
    plausible = (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("est", estimated_jaccard_col(F.col("sig_a"), F.col("sig_b"), 48))
        .filter(F.col("est") >= 0.7 - 0.15)
        .select("id_a", "id_b")
    )
    ha = base.select(F.col("doc_id").alias("id_a"), F.col("hset").alias("h_a"))
    hb = base.select(F.col("doc_id").alias("id_b"), F.col("hset").alias("h_b"))
    (
        plausible.join(ha, "id_a")
        .join(hb, "id_b")
        .withColumn("jaccard", F.round(jaccard_col(F.col("h_a"), F.col("h_b")), 4))
        .filter(F.col("jaccard") >= 0.7)
        .write.mode("overwrite").format("noop").save()
    )
    out["verify"] = round(time.perf_counter() - t0, 3)

    for frame in (cands, sigs, base):
        frame.unpersist()
    return out


def indexed_dedup_bench(spark, sf_dir: str, repeats: int) -> dict:
    """``dedup_minhash_lsh`` through a PRE-BUILT ``neardup_index``
    store — the RECURRING-dedup path a production corpus runs after the
    first pass.  ``build`` = one-shot index construction over the
    corpus (text scan + shingle + sign + band + store write, paid once);
    ``warm`` = min-of-n of the recurring run: candidates banded from
    the STORED signatures, estimate-filtered, exact-verified from the
    STORED hsets — no text scan, no signing, reading parquet cold each
    sample.  ``warm_over_scratch`` divides by the headline
    ``dedup_minhash_lsh`` minimum measured in the same session: the
    store-backed fraction of the from-scratch cost (the previously
    inferred "~45% skip", now measured).  Correctness of the warm path
    is not asserted here — the ``dedup_incremental`` oracle row
    certifies store-backed == one-shot pair-for-pair."""
    from mysql2clickhouse_spark.functions.minhash import (
        DEFAULT_ESTIMATE_MARGIN,
        DEFAULT_NUM_PERM,
        DEFAULT_THRESHOLD,
        estimated_jaccard_col,
        jaccard_col,
        lsh_candidate_pairs,
    )
    from mysql2clickhouse_spark.operators.neardup_index import MinHashIndex
    from mysql2clickhouse_spark.plans.extensions import _docs_with_mutants
    from mysql2clickhouse_spark.session import scratch_dir

    # same operating point as the headline dedup_minhash_lsh — shared
    # constants, not copies, so a pipeline retune can't silently leave
    # this row measuring the old shape
    threshold, margin = DEFAULT_THRESHOLD, DEFAULT_ESTIMATE_MARGIN

    spark.catalog.clearCache()
    corpus = _docs_with_mutants(spark, sf_dir)
    idx = MinHashIndex(
        spark, os.path.join(scratch_dir("m2c_bench_ndidx_"), "idx"),
        threshold=threshold,
    )
    t0 = time.perf_counter()
    idx.add_batch(corpus).write.mode("overwrite").format("noop").save()
    build = round(time.perf_counter() - t0, 3)

    def warm_run() -> None:
        store = spark.read.parquet(idx.sigs_path)
        sigs = store.filter(F.size("minhash") > 0).select("doc_id", "minhash")
        cands = lsh_candidate_pairs(sigs, "doc_id")
        sa = sigs.select(F.col("doc_id").alias("id_a"), F.col("minhash").alias("sig_a"))
        sb = sigs.select(F.col("doc_id").alias("id_b"), F.col("minhash").alias("sig_b"))
        plausible = (
            cands.join(sa, "id_a")
            .join(sb, "id_b")
            .withColumn(
                "est",
                estimated_jaccard_col(
                    F.col("sig_a"), F.col("sig_b"), DEFAULT_NUM_PERM
                ),
            )
            .filter(F.col("est") >= threshold - margin)
            .select("id_a", "id_b")
        )
        ha = store.select(F.col("doc_id").alias("id_a"), F.col("hset").alias("h_a"))
        hb = store.select(F.col("doc_id").alias("id_b"), F.col("hset").alias("h_b"))
        (
            plausible.join(ha, "id_a")
            .join(hb, "id_b")
            .withColumn("jaccard", F.round(jaccard_col(F.col("h_a"), F.col("h_b")), 4))
            .filter(F.col("jaccard") >= threshold)
            .write.mode("overwrite").format("noop").save()
        )

    warm_samples = []
    for _ in range(repeats):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        warm_run()
        warm_samples.append(round(time.perf_counter() - t0, 3))
    return {
        "build": build,
        "warm": min(warm_samples),
        "warm_samples": warm_samples,
    }


#: store-ops fixture geometry — FIXED across scale factors (the row is
#: a regression ratio, not a scale measurement)
STORE_OPS_BUILD_DOCS = 12_000
STORE_OPS_INGEST_DOCS = 2_000


def store_ops_bench(spark, sf_dir: str, repeats: int,
                    index_cls=None) -> dict:
    """Maintained-store hot-path row (round 11 — r10 verdict task 2:
    store ingest/probe regressions previously surfaced only in
    manually-run probe scripts, never as a bench ratio). Protocol:

    - build a MinHash store GROWN over 3 FIXED-SIZE batches (12k docs,
      fresh ids per batch), once per session — size-capped so the row
      costs seconds, not minutes, at every sf: this is the REGRESSION
      instrument for the store hot paths, the scale instrument stays
      the dedicated probe scripts (scale_check_r1*_*.py);
    - ``probe``  = min-of-n wall of the READ-ONLY decontam lookup for
      a fixed 20-doc mutant batch against the grown store;
    - ``ingest`` = per-sample wall of one more fixed 2k-doc
      ``add_batch`` (fresh ids each sample — ingest flatness is the
      store's contract, so the slight growth across samples is part of
      what the number certifies).

    ``index_cls`` lets the A/B harness pass another tree's
    MinHashIndex so both variants run their own store code."""
    from mysql2clickhouse_spark.plans.extensions import _docs_with_mutants
    from mysql2clickhouse_spark.session import scratch_dir

    if index_cls is None:
        from mysql2clickhouse_spark.operators.neardup_index import (
            MinHashIndex,
        )

        index_cls = MinHashIndex
    OFF = 50_000_000
    spark.catalog.clearCache()
    corpus = (
        _docs_with_mutants(spark, sf_dir)
        .select("doc_id", "text")
        .limit(STORE_OPS_BUILD_DOCS)
        .localCheckpoint(eager=True)
    )
    sample = corpus.limit(STORE_OPS_INGEST_DOCS).localCheckpoint(eager=True)
    idx = index_cls(spark, os.path.join(scratch_dir("m2c_bench_store_"), "nd"))
    t0 = time.perf_counter()
    for b in range(3):
        idx.add_batch(
            corpus.select(
                (F.col("doc_id") + b * OFF).alias("doc_id"), "text"
            )
        ).write.mode("overwrite").format("noop").save()
    build = round(time.perf_counter() - t0, 3)
    probe_batch = (
        corpus.limit(20)
        .select(
            (F.col("doc_id") + 900 * OFF).alias("doc_id"),
            F.concat("text", F.lit(" probe-suffix")).alias("text"),
        )
        .localCheckpoint(eager=True)
    )
    # warm-up, same rationale as the headline queries' per-query warm
    # pass: the first probe/ingest pays whole-stage codegen for the
    # store plans — one unmeasured round moves that out of the samples
    # (the warm ingest grows the fixture by one batch; ingest flatness
    # is the store's contract, so the samples measure the same thing)
    idx.probe(probe_batch).write.mode("overwrite").format("noop").save()
    idx.add_batch(
        sample.select((F.col("doc_id") + 9 * OFF).alias("doc_id"), "text")
    ).write.mode("overwrite").format("noop").save()
    probe_samples, ingest_samples = [], []
    for i in range(repeats):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        idx.probe(probe_batch).write.mode("overwrite").format("noop").save()
        probe_samples.append(round(time.perf_counter() - t0, 3))
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        idx.add_batch(
            sample.select(
                (F.col("doc_id") + (10 + i) * OFF).alias("doc_id"), "text"
            )
        ).write.mode("overwrite").format("noop").save()
        ingest_samples.append(round(time.perf_counter() - t0, 3))
    return {
        "build3": build,
        "probe": min(probe_samples),
        "ingest": min(ingest_samples),
        "probe_samples": probe_samples,
        "ingest_samples": ingest_samples,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "5")))
    spark = get_spark("m2c-bench")
    # JVM warm-up: exercise codegen, shuffle, and the parquet reader once
    # so the first measured query doesn't absorb one-time JIT/classload
    # costs (it would otherwise read ~2 s slower than steady state).
    spark.range(100_000).groupBy((F.col("id") % 7).alias("k")).count().collect()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1000).agg(
        F.count(F.lit(1))
    ).collect()
    # spawn the Python/Arrow worker pool once (pandas-UDF queries would
    # otherwise each pay ~1-2 s of per-core worker startup)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s):
        return s

    spark.range(10_000).repartition(64).select(_warm(F.col("id"))).write.mode(
        "overwrite"
    ).format("noop").save()

    queries = all_queries_extended()
    # Per-query codegen warm-up at the smallest SF: whole-stage codegen
    # compiles each query's generated classes once per PLAN SHAPE (the
    # codegen cache keys on generated source, which is identical across
    # scale factors) — so running each headline query on the tiny dir
    # first moves the one-time Janino/JIT compile (~11 s for the widest
    # aggregate plans, measured) out of the measured runs. That is the
    # honest steady-state number: on a long-lived cluster the compile
    # amortizes to zero; at sf0.1 it would otherwise dominate the wall.
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir

    times: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    for name in HEADLINE:
        fn = queries[name]
        # warm THIS query's codegen right before measuring it: the
        # generator cache is a 100-entry LRU, so warming all queries up
        # front lets later compilations evict earlier ones
        fn(spark, warm_dir).write.mode("overwrite").format("noop").save()
        runs = []
        for _ in range(repeats):
            # cold cache per sample; queries are independent, and
            # cached blocks from earlier runs must not GC-stall later
            # ones
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            runs.append(round(time.perf_counter() - t0, 3))
        samples[name] = runs
        times[name] = min(runs)
        # flush any hot-bucket quarantine drop counts observed by the
        # runs above (zero-wait poll — no Spark job)
        from mysql2clickhouse_spark.functions.minhash import (
            drain_quarantine_logs,
        )

        drain_quarantine_logs()
    spark.catalog.clearCache()

    stages = minhash_stage_split(spark, sf_dir)
    indexed = indexed_dedup_bench(spark, sf_dir, repeats)
    indexed["warm_over_scratch"] = round(
        indexed["warm"] / times["dedup_minhash_lsh"], 3
    )
    store_ops = store_ops_bench(spark, sf_dir, repeats)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "repeats": repeats,
                "samples": samples,
                "minhash_stages": stages,
                "dedup_minhash_indexed": indexed,
                "store_ops": store_ops,
            }
        )
    )


if __name__ == "__main__":
    main()
