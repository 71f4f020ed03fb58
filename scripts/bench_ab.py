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
#: tree beats the old floor (r10 note — the r9 A/B closed at total
#: 1.019 vs r8 with one deliberate recall-for-cost trade, so per the
#: r9 verdict task 4 the floor advances to the last r9 code commit;
#: rounds 6-8 used r5 79d3d22, round 9 used r8 a228d70)
REF_COMMIT = "f31be1b"
REF_TAG = "r9"
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
        # hits adjacent samples of both variants
        for _ in range(repeats):
            for fn, acc in ((fc, cs), (fr, rs)):
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
