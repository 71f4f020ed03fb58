#!/usr/bin/env python
"""Empirical scale probe for the near-dup pipelines.

Replicates the ``documents`` corpus k× (ids offset so replicas are
distinct docs, texts perturbed per replica so near-dup group sizes stay
constant instead of growing with k) and times the MinHash+LSH and
SimHash pair pipelines at 1× and k×. Prints one JSON line:

  {"sf": ..., "k": ..., "minhash_1x": s, "minhash_kx": s,
   "simhash_1x": s, "simhash_kx": s}

What "passes": wall growth ≲ k (linear scan + bucketed joins; nothing
quadratic, no single-task stage). Pair output volume is kept k-linear
by the per-replica perturbation — an UN-perturbed replication would
inflate true near-dup group sizes to k+1 and the pair stage would grow
quadratically by problem definition, not by plan defect.

Usage: python scripts/scale_check.py [sf_dir] [k]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from mysql2clickhouse_spark.functions.minhash import (  # noqa: E402
    simhash_near_dups,
    verified_near_dups,
    with_simhash,
)
from mysql2clickhouse_spark.session import get_spark  # noqa: E402
from mysql2clickhouse_spark.sources.tables import load_table, spread  # noqa: E402

REP_OFFSET = 10_000_000


def corpus(spark, sf_dir: str, k: int):
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    alpha = "abcdefghijklmnopqrstuvwxyz"
    reps = [d]
    for r in range(1, k):
        # per-replica alphabet ROTATION: every character shingle changes,
        # so replicas share ~no shingles and group sizes stay constant as
        # k grows. (A prefix/suffix salt is NOT enough — a 200-shingle
        # doc with a 15-shingle salt still has Jaccard ≈ 0.93 to its
        # replica, which makes every replica set a true near-dup group
        # and the pair stage quadratic by problem definition.)
        rot = alpha[r % 26 :] + alpha[: r % 26]
        reps.append(
            d.select(
                (F.col("doc_id") + REP_OFFSET * r).alias("doc_id"),
                F.translate(F.col("text"), alpha, rot).alias("text"),
            )
        )
    out = reps[0]
    for rdf in reps[1:]:
        out = out.unionByName(rdf)
    return spread(out)


def emb_corpus(spark, sf_dir: str, k: int):
    """Embeddings replicated k× with per-replica SIGN FLIPS (dim j
    negated when bit j of r·2654435761 is set) — an orthogonal
    transform: norms and within-replica geometry are preserved, but
    replicas decorrelate from each other, so duplicate-group sizes stay
    constant as k grows (the vector analog of the alphabet rotation)."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    reps = [e]
    for r in range(1, k):
        mask = (r * 2654435761) & 0xFFFFFFFFFFFFFFFF
        signs = F.array(
            *[F.lit(-1.0 if (mask >> (j % 63)) & 1 else 1.0) for j in range(64)]
        )
        reps.append(
            e.select(
                (F.col("vec_id") + REP_OFFSET * r).alias("vec_id"),
                F.zip_with(
                    F.transform(F.col("embedding"), lambda x: x.cast("double")),
                    signs,
                    lambda x, s: x * s,
                ).alias("embedding"),
            )
        )
    out = reps[0]
    for rdf in reps[1:]:
        out = out.unionByName(rdf)
    return spread(out)


def run(label: str, df) -> float:
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return round(time.perf_counter() - t0, 2)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("scale-check")
    spark.sparkContext.setLogLevel("ERROR")

    out = {"sf_dir": sf_dir, "k": k}
    for kk, tag in ((1, "1x"), (k, "kx")):
        c = corpus(spark, sf_dir, kk)
        # warm codegen once per shape
        if tag == "1x":
            run("warm", verified_near_dups(c, "doc_id", threshold=0.7))
            run("warm", simhash_near_dups(with_simhash(c, "text", attach=False), "doc_id"))
            spark.catalog.clearCache()
        out[f"minhash_{tag}"] = run(
            tag, verified_near_dups(c, "doc_id", threshold=0.7)
        )
        spark.catalog.clearCache()
        out[f"simhash_{tag}"] = run(
            tag, simhash_near_dups(with_simhash(c, "text", attach=False), "doc_id")
        )
        spark.catalog.clearCache()
    from mysql2clickhouse_spark.functions.similarity import (
        cosine_topk,
        lsh_bucketed_topk,
        unit_vec_col,
        with_lsh_buckets,
    )

    def emb_cosine_pairs(e):
        """Same shape as dedup_embedding_cosine, parameterized corpus."""
        b = with_lsh_buckets(e, dim=64, n_planes=12, n_tables=2).select(
            "vec_id", "tbl", "bucket"
        ).persist()
        b.count()
        a_, b_ = b.alias("a"), b.alias("b")
        cands = (
            a_.join(
                b_,
                (F.col("a.tbl") == F.col("b.tbl"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.vec_id") < F.col("b.vec_id")),
            )
            .select(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"))
            .distinct()
        )
        unit = e.select("vec_id", unit_vec_col(F.col("embedding")).alias("u"))
        va = unit.select(F.col("vec_id").alias("id_a"), F.col("u").alias("u_a"))
        vb = unit.select(F.col("vec_id").alias("id_b"), F.col("u").alias("u_b"))
        dot = F.aggregate(
            F.zip_with(F.col("u_a"), F.col("u_b"), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return (
            cands.join(va, "id_a").join(vb, "id_b")
            .withColumn("sim", F.round(dot, 4))
            .filter(F.col("sim") >= 0.95)
        )

    for kk, tag in ((1, "1x"), (k, "kx")):
        e = emb_corpus(spark, sf_dir, kk)
        q = e.filter(F.col("vec_id") < 5)
        c = e.filter(F.col("vec_id") >= 5)
        if tag == "1x":
            run("warm", emb_cosine_pairs(e))
            run("warm", lsh_bucketed_topk(c, q, dim=64, k=10, n_planes=None))
            spark.catalog.clearCache()
        out[f"embcos_{tag}"] = run(tag, emb_cosine_pairs(e))
        spark.catalog.clearCache()
        out[f"annlsh_{tag}"] = run(tag, lsh_bucketed_topk(c, q, dim=64, k=10, n_planes=None))
        spark.catalog.clearCache()

    # incremental index: a FIXED-size batch added against a 1× vs k×
    # store. The claim under test is O(batch) work per run: batch text
    # hashing is constant, and the store participates only through an
    # ints-only band/sig columnar scan (broadcast-probed, never
    # re-shingled) — so wall growth must stay far under k even though
    # the store is k× larger.
    import tempfile

    from mysql2clickhouse_spark.operators.neardup_index import MinHashIndex

    # the same FIXED batch both times, with doc_ids (offset k·REP_OFFSET,
    # replica index k) DISJOINT from both stores (replicas 0..k-1): the
    # timed call is a clean incremental ingest, not a replay the
    # idempotence guard would short-circuit into a no-op
    alpha = "abcdefghijklmnopqrstuvwxyz"
    rot = alpha[k % 26 :] + alpha[: k % 26]
    batch = load_table(spark, sf_dir, "documents").select(
        (F.col("doc_id") + REP_OFFSET * k).alias("doc_id"),
        F.translate(F.col("text"), alpha, rot).alias("text"),
    )
    for kk, tag in ((1, "1x"), (k, "kx")):
        store = corpus(spark, sf_dir, kk)
        idx = MinHashIndex(spark, tempfile.mkdtemp(prefix="m2c_scale_idx_"))
        idx.add_batch(store).count()  # build the store (not timed)
        t0 = time.perf_counter()
        idx.add_batch(batch).count()
        out[f"incidx_{tag}"] = round(time.perf_counter() - t0, 2)
        spark.catalog.clearCache()

    # text/quality family: TF-IDF doc-sim (posting-list join — probe side
    # is the fixed 10 query docs, so work should grow ~k with the corpus
    # postings, never n²) and the C4 boilerplate STRIP (corpus-frequency
    # df table + covered-position rebuild — 3 bounded shuffles)
    from mysql2clickhouse_spark.functions.text import token_ngrams_col, tokens_col

    def tfidf_top1(d):
        tok = d.select(
            "doc_id",
            F.explode(tokens_col(F.coalesce(F.col("text"), F.lit("")))).alias("token"),
        )
        tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
        n_docs = d.select(F.countDistinct("doc_id").alias("n_docs"))
        df_t = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
        w = (
            tf.join(df_t, "token")
            .crossJoin(F.broadcast(n_docs))
            .select(
                "doc_id", "token",
                (F.col("tf") * F.log(F.col("n_docs") / F.col("df"))).alias("w"),
            )
        )
        norms = w.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
        qa = w.filter(F.col("doc_id") < 10).select(
            F.col("doc_id").alias("src"), "token", F.col("w").alias("wa")
        )
        cb = w.select(F.col("doc_id").alias("dst"), "token", F.col("w").alias("wb"))
        dots = (
            qa.join(cb, "token")
            .filter(F.col("src") != F.col("dst"))
            .groupBy("src", "dst")
            .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
        )
        na = norms.select(F.col("doc_id").alias("src"), F.col("nrm").alias("na"))
        nb = norms.select(F.col("doc_id").alias("dst"), F.col("nrm").alias("nb"))
        from pyspark.sql.window import Window as W

        win = W.partitionBy("src").orderBy(F.col("sim").desc(), F.col("dst").asc())
        return (
            dots.join(na, "src").join(nb, "dst")
            .withColumn("sim", F.col("dot") / (F.col("na") * F.col("nb")))
            .select("src", "dst", "sim")
            .withColumn("rk", F.row_number().over(win))
            .filter(F.col("rk") == 1)
        )

    def strip_boilerplate(d):
        toks = tokens_col(F.coalesce(F.col("text"), F.lit("")))
        tok_rows = d.select("doc_id", F.posexplode(toks).alias("p0", "token"))
        gram_rows = d.select(
            "doc_id", F.posexplode(token_ngrams_col(toks, 5)).alias("g0", "gram")
        )
        bp = (
            gram_rows.groupBy("gram")
            .agg(F.countDistinct("doc_id").alias("df"))
            .filter(F.col("df") >= 5)
            .select("gram")
        )
        covered = (
            gram_rows.join(bp, "gram")
            .select("doc_id", F.explode(F.sequence(F.col("g0"), F.col("g0") + 4)).alias("p0"))
            .distinct()
        )
        kept = tok_rows.join(covered, ["doc_id", "p0"], "left_anti")
        return kept.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_kept"))

    for kk, tag in ((1, "1x"), (k, "kx")):
        d = corpus(spark, sf_dir, kk)
        if tag == "1x":
            run("warm", tfidf_top1(d))
            run("warm", strip_boilerplate(d))
            spark.catalog.clearCache()
        out[f"tfidf_{tag}"] = run(tag, tfidf_top1(d))
        spark.catalog.clearCache()
        out[f"bpstrip_{tag}"] = run(tag, strip_boilerplate(d))
        spark.catalog.clearCache()

    for fam in ("minhash", "simhash", "embcos", "annlsh", "incidx", "tfidf", "bpstrip"):
        out[f"{fam}_growth"] = round(out[f"{fam}_kx"] / out[f"{fam}_1x"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
