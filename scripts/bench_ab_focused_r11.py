#!/usr/bin/env python
"""Focused re-adjudication interleave (the >1.08 discipline): 9-repeat
cur/ref A/B of ONLY the rows the full r11 A/B flagged — ``dedup_exact``
(1.158; path untouched this round) and the two new maintained-store
rows (``store_probe`` 1.165 / ``store_ingest`` 1.122).

What this script's own runs then established (BENCH_NOTES_r11 §4): the
flags were the harness's FIXED within-pair order — the first run of
each clearCache'd pair pays the cache refill, biasing whichever
variant goes first (the untouched dedup_exact measured 0.993 and
1.151 across two fixed-order runs; an order-swap experiment flipped
the sign). The loops below alternate the pair order per repeat — the
corrected protocol, under which all three rows cleared (1.032 / 0.913
/ 1.034).

Run:  PYTHONPATH=/root/repo:/root/repo/.ab python scripts/bench_ab_focused_r11.py
"""

from __future__ import annotations

import importlib
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, ".ab"))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from bench import STORE_OPS_BUILD_DOCS, STORE_OPS_INGEST_DOCS  # noqa: E402
from mysql2clickhouse_spark.plans import all_queries_extended  # noqa: E402
from mysql2clickhouse_spark.session import get_spark, scratch_dir  # noqa: E402

REF_PKG = "m2c_r10ref"
REPEATS = 9


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("m2c-bench-ab-focused")
    spark.range(100_000).groupBy((F.col("id") % 7).alias("k")).count().collect()

    out: dict = {}

    # --- dedup_exact, strict interleave ---------------------------------
    cur = all_queries_extended()["dedup_exact"]
    ref = importlib.import_module(f"{REF_PKG}.plans").all_queries_extended()[
        "dedup_exact"
    ]
    warm = "/root/testdata/sf0.001"
    cur(spark, warm).write.mode("overwrite").format("noop").save()
    ref(spark, warm).write.mode("overwrite").format("noop").save()
    cs, rs = [], []
    for r in range(REPEATS):
        # ALTERNATE the within-pair order per repeat: the first run
        # after clearCache systematically pays the cache refill, so a
        # fixed order biases whichever variant goes first (observed:
        # the same untouched query measured 0.99 and 1.15 across two
        # fixed-order runs, and an order-swap experiment flipped the
        # sign)
        pair = ((cur, cs), (ref, rs)) if r % 2 == 0 else ((ref, rs), (cur, cs))
        for fn, acc in pair:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            acc.append(round(time.perf_counter() - t0, 3))
    out["dedup_exact"] = {
        "cur": min(cs), "ref": min(rs),
        "ratio": round(min(cs) / min(rs), 3),
        "cur_samples": cs, "ref_samples": rs,
    }

    # --- store rows, per-variant stores, strict interleave --------------
    from mysql2clickhouse_spark.operators.neardup_index import (
        MinHashIndex as cur_cls,
    )
    from mysql2clickhouse_spark.plans.extensions import _docs_with_mutants

    ref_cls = importlib.import_module(
        f"{REF_PKG}.operators.neardup_index"
    ).MinHashIndex
    OFF = 50_000_000
    corpus = (
        _docs_with_mutants(spark, sf_dir)
        .select("doc_id", "text")
        .limit(STORE_OPS_BUILD_DOCS)
        .localCheckpoint(eager=True)
    )
    sample = corpus.limit(STORE_OPS_INGEST_DOCS).localCheckpoint(eager=True)
    probe_batch = (
        corpus.limit(20)
        .select(
            (F.col("doc_id") + 900 * OFF).alias("doc_id"),
            F.concat("text", F.lit(" probe-suffix")).alias("text"),
        )
        .localCheckpoint(eager=True)
    )
    variants = {}
    for tag, cls in (("cur", cur_cls), ("ref", ref_cls)):
        idx = cls(spark, os.path.join(scratch_dir(f"m2c_abf_{tag}_"), "nd"))
        for b in range(3):
            idx.add_batch(
                corpus.select(
                    (F.col("doc_id") + b * OFF).alias("doc_id"), "text"
                )
            ).write.mode("overwrite").format("noop").save()
        variants[tag] = idx
    for tag in ("cur", "ref"):  # codegen warm-up, unmeasured
        variants[tag].probe(probe_batch).write.mode("overwrite").format(
            "noop"
        ).save()
        variants[tag].add_batch(
            sample.select((F.col("doc_id") + 9 * OFF).alias("doc_id"), "text")
        ).write.mode("overwrite").format("noop").save()
    rows = {op: {"cur": [], "ref": []} for op in ("probe", "ingest")}
    for i in range(REPEATS):
        order = ("cur", "ref") if i % 2 == 0 else ("ref", "cur")
        for tag in order:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            variants[tag].probe(probe_batch).write.mode("overwrite").format(
                "noop"
            ).save()
            rows["probe"][tag].append(round(time.perf_counter() - t0, 3))
        for tag in order:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            variants[tag].add_batch(
                sample.select(
                    (F.col("doc_id") + (10 + i) * OFF).alias("doc_id"),
                    "text",
                )
            ).write.mode("overwrite").format("noop").save()
            rows["ingest"][tag].append(round(time.perf_counter() - t0, 3))
    for op, r2 in rows.items():
        out[f"store_{op}"] = {
            "cur": min(r2["cur"]), "ref": min(r2["ref"]),
            "ratio": round(min(r2["cur"]) / min(r2["ref"]), 3),
            "cur_samples": r2["cur"], "ref_samples": r2["ref"],
        }
    print(json.dumps({"metric": "ab_focused_r11", "repeats": REPEATS,
                      "rows": out}))


if __name__ == "__main__":
    main()
