#!/usr/bin/env python
"""Interleaved A/B bench: CURRENT tree vs the pinned floor ref
(REF_COMMIT below — since round 10 the r9 tree f31be1b; round 9 used
the r8 tree a228d70, rounds 6-8 the r5 floor 79d3d22), both
variants in ONE SparkSession, samples alternated per query so box load
drift cancels out of the per-query ratio.

Motivation (VERDICT r6/r7): the official bench regressed three rounds
in a row (16.20 -> 20.29 -> 23.68 s) on paths git proves untouched;
the working theory was builder-box load, but attribution without
demonstration is not evidence. This harness is the demonstration: the
floor tree's package is checked out under ``.ab/m2c_<REF_TAG>ref`` (a
``git worktree`` of REF_COMMIT with the package renamed so both import
side-by-side), and every headline query runs interleaved
cur,ref,cur,ref,... in the same JVM. Whatever the box is doing, it is
doing it to BOTH variants within the same few seconds — the ratio
min(cur)/min(ref) isolates CODE cost from MACHINE state. This is the
same methodology that adjudicated the Arrow signer in round 6
(BENCH_NOTES_r06.md), promoted from one operator to the whole
headline set.

Run:  PYTHONPATH=/root/repo:/root/repo/.ab python scripts/bench_ab.py
Prep: python scripts/bench_ab.py --prep   (idempotent; equivalent to:)
      git worktree add .ab/<REF_TAG>tree <REF_COMMIT>
      cp -r .ab/<REF_TAG>tree/mysql2clickhouse_spark .ab/m2c_<REF_TAG>ref
      find .ab/m2c_<REF_TAG>ref -name '*.py' \
          -exec sed -i 's/mysql2clickhouse_spark/m2c_<REF_TAG>ref/g' {} +

Prints ONE JSON line:
  {"metric": "ab_ratio_cur_over_ref", "queries": {name: {"cur": min,
   "ref": min, "ratio": r, "cur_samples": [...], "ref_samples":
   [...]}}, "total_cur": s, "total_ref": s, "total_ratio": r}
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
#: the pinned floor: re-pin to the best-measured tree when the current
#: tree beats the old floor (r11 note — the r10 A/B closed at total
#: 0.995 vs the r9 floor, so per the r10 verdict task 6 the floor
#: advances to the r10 tree, 48cec92 — package-identical to the last
#: r10 code commit 5b1383d; rounds 6-8 used r5 79d3d22, round 9 the
#: r8 a228d70, round 10 the r9 f31be1b with the r9 worktree dropped
#: once re-pinned)
REF_COMMIT = "39e31ef"  # round-12 OPTIMIZATION floor: the round-start tree
REF_TAG = "r12s"
REF_PKG = f"m2c_{REF_TAG}ref"


def prep() -> None:
    """Idempotently materialize the pinned floor tree as the renamed
    side-by-side package ``.ab/m2c_<REF_TAG>ref`` (safe to re-run; a
    stale half-copy is rebuilt)."""
    import shutil
    import subprocess

    ab = os.path.join(REPO, ".ab")
    tree = os.path.join(ab, f"{REF_TAG}tree")
    pkg = os.path.join(ab, REF_PKG)
    if not os.path.isdir(tree):
        subprocess.run(
            ["git", "worktree", "add", tree, REF_COMMIT],
            cwd=REPO,
            check=True,
        )
    if os.path.isdir(pkg):
        shutil.rmtree(pkg)
    shutil.copytree(os.path.join(tree, "mysql2clickhouse_spark"), pkg)
    for root, _dirs, files in os.walk(pkg):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            with open(path, encoding="utf-8") as f:
                src = f.read()
            with open(path, "w", encoding="utf-8") as f:
                f.write(src.replace("mysql2clickhouse_spark", REF_PKG))
    print(f"prepared {pkg} from {REF_COMMIT}", file=sys.stderr)


if "--prep" in sys.argv:
    prep()
    sys.exit(0)

sys.path.insert(0, os.path.join(REPO, ".ab"))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from mysql2clickhouse_spark.plans import all_queries_extended  # noqa: E402
from mysql2clickhouse_spark.session import get_spark  # noqa: E402

import importlib  # noqa: E402

ref_queries = importlib.import_module(f"{REF_PKG}.plans").all_queries_extended

from bench import HEADLINE  # noqa: E402  (repo-root bench.py)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "5")))
    spark = get_spark("m2c-bench-ab")

    # same warm-up protocol as bench.py: JIT/codegen, parquet reader,
    # Python/Arrow worker pool
    spark.range(100_000).groupBy((F.col("id") % 7).alias("k")).count().collect()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1000).agg(
        F.count(F.lit(1))
    ).collect()
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s):
        return s

    spark.range(10_000).repartition(64).select(_warm(F.col("id"))).write.mode(
        "overwrite"
    ).format("noop").save()

    cur = all_queries_extended()
    ref = ref_queries()
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir

    out: dict[str, dict] = {}
    for name in HEADLINE:
        fc, fr = cur[name], ref[name]
        # warm BOTH variants' codegen on the tiny dir right before
        # measuring (bench.py's per-query warm-up, doubled)
        fc(spark, warm_dir).write.mode("overwrite").format("noop").save()
        fr(spark, warm_dir).write.mode("overwrite").format("noop").save()
        cs: list[float] = []
        rs: list[float] = []
        # strict interleave: cur,ref,cur,ref,... so any load transient
        # hits adjacent samples of both variants; the WITHIN-PAIR order
        # alternates per repeat — the first run after clearCache pays
        # the cache refill, and under box load that fixed-order bias
        # measured up to 1.4× on an untouched query (r11 adjudication)
        for r in range(repeats):
            pair = ((fc, cs), (fr, rs)) if r % 2 == 0 else ((fr, rs), (fc, cs))
            for fn, acc in pair:
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                acc.append(round(time.perf_counter() - t0, 3))
        ratio = round(min(cs) / min(rs), 3) if min(rs) > 0 else None
        out[name] = {
            "cur": min(cs),
            "ref": min(rs),
            "ratio": ratio,
            "cur_samples": cs,
            "ref_samples": rs,
        }
        print(
            f"  {name:26s} cur={min(cs):7.3f} ref={min(rs):7.3f} "
            f"ratio={ratio}",
            file=sys.stderr,
            flush=True,
        )

    # maintained-store hot-path rows (r10 verdict task 2): each
    # variant builds its OWN grown store with its own code (layouts
    # may differ between pins), then probe and ingest samples run
    # STRICTLY INTERLEAVED cur,ref,cur,ref like every headline query.
    # Refs older than r10 have no probe(); skip the rows there.
    ref_idx_cls = importlib.import_module(
        f"{REF_PKG}.operators.neardup_index"
    ).MinHashIndex
    if hasattr(ref_idx_cls, "probe"):
        from mysql2clickhouse_spark.operators.neardup_index import (
            MinHashIndex as cur_idx_cls,
        )
        from mysql2clickhouse_spark.plans.extensions import (
            _docs_with_mutants,
        )
        from mysql2clickhouse_spark.session import scratch_dir

        from bench import STORE_OPS_BUILD_DOCS, STORE_OPS_INGEST_DOCS

        OFF = 50_000_000
        corpus = (
            _docs_with_mutants(spark, sf_dir)
            .select("doc_id", "text")
            .limit(STORE_OPS_BUILD_DOCS)
            .localCheckpoint(eager=True)
        )
        sample = corpus.limit(STORE_OPS_INGEST_DOCS).localCheckpoint(
            eager=True
        )
        probe_batch = (
            corpus.limit(20)
            .select(
                (F.col("doc_id") + 900 * OFF).alias("doc_id"),
                F.concat("text", F.lit(" probe-suffix")).alias("text"),
            )
            .localCheckpoint(eager=True)
        )
        variants = {}
        for tag, cls in (("cur", cur_idx_cls), ("ref", ref_idx_cls)):
            idx = cls(
                spark,
                os.path.join(scratch_dir(f"m2c_ab_store_{tag}_"), "nd"),
            )
            for b in range(3):  # the grown fixture, built once
                idx.add_batch(
                    corpus.select(
                        (F.col("doc_id") + b * OFF).alias("doc_id"), "text"
                    )
                ).write.mode("overwrite").format("noop").save()
            variants[tag] = idx
        # per-variant warm-up (same as the headline queries' warm
        # pass): the first probe/ingest pays codegen — unmeasured
        for tag in ("cur", "ref"):
            variants[tag].probe(probe_batch).write.mode(
                "overwrite"
            ).format("noop").save()
            variants[tag].add_batch(
                sample.select(
                    (F.col("doc_id") + 9 * OFF).alias("doc_id"), "text"
                )
            ).write.mode("overwrite").format("noop").save()
        rows = {op: {"cur": [], "ref": []} for op in ("probe", "ingest")}
        for i in range(repeats):
            # alternate the within-pair order per repeat: the first
            # run after clearCache pays the cache refill, so a fixed
            # order biases whichever variant goes first (r11 focused
            # runs measured the bias at up to 15% on sub-2 s walls)
            order = ("cur", "ref") if i % 2 == 0 else ("ref", "cur")
            for tag in order:
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                variants[tag].probe(probe_batch).write.mode(
                    "overwrite"
                ).format("noop").save()
                rows["probe"][tag].append(
                    round(time.perf_counter() - t0, 3)
                )
            for tag in order:
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                variants[tag].add_batch(
                    sample.select(
                        (F.col("doc_id") + (10 + i) * OFF).alias("doc_id"),
                        "text",
                    )
                ).write.mode("overwrite").format("noop").save()
                rows["ingest"][tag].append(
                    round(time.perf_counter() - t0, 3)
                )
        for op, r2 in rows.items():
            c, r = min(r2["cur"]), min(r2["ref"])
            out[f"store_{op}"] = {
                "cur": c,
                "ref": r,
                "ratio": round(c / r, 3) if r > 0 else None,
                "cur_samples": r2["cur"],
                "ref_samples": r2["ref"],
            }
            print(
                f"  store_{op:20s} cur={c:7.3f} ref={r:7.3f} "
                f"ratio={out[f'store_{op}']['ratio']}",
                file=sys.stderr,
                flush=True,
            )

    total_cur = round(sum(v["cur"] for v in out.values()), 3)
    total_ref = round(sum(v["ref"] for v in out.values()), 3)
    print(
        json.dumps(
            {
                "metric": "ab_ratio_cur_over_ref",
                "queries": out,
                "total_cur": total_cur,
                "total_ref": total_ref,
                "total_ratio": round(total_cur / total_ref, 3),
                "repeats": repeats,
                "ref_commit": REF_COMMIT,
            }
        )
    )


if __name__ == "__main__":
    main()
