#!/usr/bin/env python
"""Empirical scale probe for the round-6 operators.

Replicates each op's input k× (ids offset so rows are distinct) and
times the op at 1× and k×. Prints one JSON line:

  {"sf": ..., "k": ...,
   "consistency_1x": s, "consistency_kx": s,
   "shuffle_1x": s, "shuffle_kx": s,
   "bpe_encode_1x": s, "bpe_encode_kx": s,
   "ivf_ingest_1x": s, "ivf_ingest_kx": s}

What "passes": wall growth ≲ k for every op —

- consistency check: two map-side checksum folds + a tiny join;
- shuffle order: one projection + one shuffle on the shard key;
- BPE encode: broadcast vocab lookup + one doc_id shuffle (the vocab
  is TRAINED ONCE on the 1× corpus and reused, isolating the encode
  pass — training cost is vocabulary-bound, not corpus-bound);
- IVF ingest+search: O(batch) assignment GEMM + partitioned append,
  probe reads only probed lists.

Usage: python scripts/scale_check_r6.py [sf_dir] [k]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from mysql2clickhouse_spark.session import get_spark, scratch_dir  # noqa: E402
from mysql2clickhouse_spark.sources.tables import load_table  # noqa: E402

OFF = 10_000_000


def timed(fn):
    fn()  # warm-up: codegen/broadcast/Python-worker spin-up off the clock
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("scale-check-r6")
    out = {"sf": sf_dir, "k": k}

    # --- consistency check: events replicated with offset ids/keys ---
    from mysql2clickhouse_spark.operators.apply import (
        apply_insert_as_update,
        apply_mutate,
        latest_by_key,
    )
    from mysql2clickhouse_spark.operators.checksum import (
        checksum_compare,
        row_digest,
        table_checksums,
    )
    from mysql2clickhouse_spark.sources.changelog import changelog_from_events

    ev = load_table(spark, sf_dir, "events")

    def events_k(mult: int):
        reps = [ev]
        for r in range(1, mult):
            reps.append(
                ev.select(
                    (F.col("event_id") + OFF * r).alias("event_id"),
                    "ts",
                    (F.col("user_id") + OFF * r).alias("user_id"),
                    "event_type",
                    "value",
                    "props",
                )
            )
        cur = reps[0]
        for r in reps[1:]:
            cur = cur.unionByName(r)
        return cur

    def consistency(mult: int):
        cl = changelog_from_events(events_k(mult))
        digest = row_digest([
            F.col("key"),
            F.col("seq"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss"),
            F.floor(F.col("value") * 100).cast("bigint"),
            F.col("event_type"),
        ])
        src = apply_mutate(cl, ["key"], form="argmax")
        dst = latest_by_key(
            apply_insert_as_update(cl, ["key"]), ["key"], "dateid", form="argmax"
        )
        checksum_compare(
            table_checksums(src, digest), table_checksums(dst, digest)
        ).write.mode("overwrite").format("noop").save()

    out["consistency_1x"] = timed(lambda: consistency(1))
    out["consistency_kx"] = timed(lambda: consistency(k))

    # --- shuffle order: documents replicated ---
    from mysql2clickhouse_spark.plans.curation import (
        shuffle_key_col,
        shuffle_shards_for,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")

    def docs_k(mult: int):
        reps = [docs]
        for r in range(1, mult):
            reps.append(
                docs.select(
                    (F.col("doc_id") + OFF * r).alias("doc_id"), "source", "text"
                )
            )
        cur = reps[0]
        for r in reps[1:]:
            cur = cur.unionByName(r)
        return cur

    def shuffle_order(mult: int):
        d = docs_k(mult)
        n_shards = shuffle_shards_for(d.count())
        key = shuffle_key_col(F.col("doc_id"), n_shards)
        (
            d.select("doc_id", "source", key.alias("skey"),
                     F.pmod(key, F.lit(n_shards)).alias("shard"))
            .groupBy("shard", "source")
            .agg(F.count(F.lit(1)).alias("n"), F.expr("bit_xor(skey)").alias("x"))
            .write.mode("overwrite").format("noop").save()
        )

    out["shuffle_1x"] = timed(lambda: shuffle_order(1))
    out["shuffle_kx"] = timed(lambda: shuffle_order(k))

    # --- BPE encode: vocab trained once on 1x, encode scales with corpus ---
    from mysql2clickhouse_spark.functions.bpe import encode_docs, train_bpe

    _merges, vocab = train_bpe(docs.select("doc_id", "text"), n_merges=8)
    vocab = vocab.persist()
    vocab.count()

    def encode(mult: int):
        (
            encode_docs(docs_k(mult).select("doc_id", "text"), vocab)
            .select("doc_id", "n_tokens", F.md5("roundtrip_text"))
            .write.mode("overwrite").format("noop").save()
        )

    out["bpe_encode_1x"] = timed(lambda: encode(1))
    out["bpe_encode_kx"] = timed(lambda: encode(k))

    # --- IVF incremental: ingest + search at 1x and kx corpus ---
    from mysql2clickhouse_spark.operators.ann_index import IVFIndex

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dim = len(emb.first()["embedding"])
    queries = emb.filter(F.col("vec_id") < 5)

    def emb_k(mult: int):
        reps = [emb]
        for r in range(1, mult):
            reps.append(
                emb.select((F.col("vec_id") + OFF * r).alias("vec_id"), "embedding")
            )
        cur = reps[0]
        for r in reps[1:]:
            cur = cur.unionByName(r)
        return cur

    seq = iter(range(100))

    def ivf(mult: int):
        # fresh index root per call (timed() runs each op twice)
        idx = IVFIndex(
            spark,
            scratch_dir(f"m2c_scale_ivf_{next(seq)}_") + "/index",
            dim=dim,
            n_list=32,
        )
        idx.build(emb_k(mult))
        idx.search(queries, k=10, nprobe=8).write.mode("overwrite").format(
            "noop"
        ).save()

    out["ivf_ingest_1x"] = timed(lambda: ivf(1))
    out["ivf_ingest_kx"] = timed(lambda: ivf(k))

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
