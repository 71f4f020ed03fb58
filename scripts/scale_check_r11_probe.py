#!/usr/bin/env python
"""Probe-wall scale check — the measured counterpart of the r11 probe
pushdown (r10 verdict finding #1: the READ-ONLY decontam lookup was a
full store scan).

Protocol: grow each text store (MinHash / SimHash / substring) over N
equal batches of fresh docs — same growth protocol as
scale_check_r10_ingest.py — and after EVERY batch measure the wall of
a fixed SMALL probe (the decontam shape: a handful of eval docs). A
probe that scans the whole store shows a rising wall as the store
grows; a pruned probe stays flat. At the final store size the pruned
probe is also A/B'd against the full-scan path (probe_pruned patched
to identity) — the direct pruned-vs-unpruned ratio on the same bytes.

Prints one JSON line:
  {"sf": ..., "batches": B, "probe_docs": P,
   "<store>_probe_walls": [...per growth step...],
   "<store>_probe_last_over_first": r,
   "<store>_pruned_wall": w, "<store>_fullscan_wall": w,
   "<store>_fullscan_over_pruned": r}

Walls are min-of-3 at the final step (the growth-step walls are
single-shot — the trend is the signal there, not the point value).

Usage: python scripts/scale_check_r11_probe.py [sf_dir] [n_batches]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from mysql2clickhouse_spark.operators import (  # noqa: E402
    neardup_index,
    simhash_index,
    substring_index,
)
from mysql2clickhouse_spark.session import get_spark, scratch_dir  # noqa: E402
from mysql2clickhouse_spark.sources.tables import load_table  # noqa: E402

OFF = 10_000_000
PROBE_DOCS = 20


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    spark = get_spark("scale-check-r11-probe")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def batch(i: int):
        return docs.select((F.col("doc_id") + i * OFF).alias("doc_id"), "text")

    # the fixed probe: PROBE_DOCS mutants of stored docs (offset far out
    # of every batch's id space so no self-pairs) — realistic decontam
    # input that actually matches
    probe = (
        docs.limit(PROBE_DOCS)
        .select(
            (F.col("doc_id") + 900 * OFF).alias("doc_id"),
            F.concat("text", F.lit(" probe-suffix")).alias("text"),
        )
        .localCheckpoint(eager=True)
    )

    out = {"sf": sf_dir, "batches": n_batches, "probe_docs": PROBE_DOCS}
    base = scratch_dir("m2c_probe_scale_")

    def consume(df):
        df.write.mode("overwrite").format("noop").save()

    def wall(fn, repeat=1):
        best = None
        for _ in range(repeat):
            t0 = time.perf_counter()
            fn()
            w = time.perf_counter() - t0
            best = w if best is None else min(best, w)
        return round(best, 3)

    stores = {
        "minhash": (
            neardup_index,
            neardup_index.MinHashIndex(spark, os.path.join(base, "nd")),
        ),
        "simhash": (
            simhash_index,
            simhash_index.SimHashIndex(spark, os.path.join(base, "sh")),
        ),
        "substr": (
            substring_index,
            substring_index.SubstringIndex(
                spark, os.path.join(base, "ss"), k=10
            ),
        ),
    }
    for tag, (mod, idx) in stores.items():
        walls = []
        ingest_walls = []
        for i in range(n_batches):
            ingest_walls.append(wall(lambda: consume(idx.add_batch(batch(i)))))
            walls.append(wall(lambda: consume(idx.probe(probe))))
        # ingest flatness at this sf rides the same run (r10 verdict
        # task 7: one scale up from the r10 record)
        out[f"{tag}_ingest_walls"] = ingest_walls
        out[f"{tag}_ingest_last_over_first"] = round(
            ingest_walls[-1] / ingest_walls[0], 2
        )
        out[f"{tag}_probe_walls"] = walls
        out[f"{tag}_probe_last_over_first"] = round(walls[-1] / walls[0], 2)
        # final-size A/B: pruned vs full-scan on the SAME grown store —
        # patch the module-bound probe_pruned to identity for the
        # full-scan arm (the pre-r11 plan)
        out[f"{tag}_pruned_wall"] = wall(
            lambda: consume(idx.probe(probe)), repeat=3
        )
        orig = mod.probe_pruned
        mod.probe_pruned = lambda store, *a, **k: store
        try:
            out[f"{tag}_fullscan_wall"] = wall(
                lambda: consume(idx.probe(probe)), repeat=3
            )
        finally:
            mod.probe_pruned = orig
        out[f"{tag}_fullscan_over_pruned"] = round(
            out[f"{tag}_fullscan_wall"] / out[f"{tag}_pruned_wall"], 2
        )

    print(json.dumps(out))


if __name__ == "__main__":
    main()
