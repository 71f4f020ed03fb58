"""Vector similarity search over an ``array<float>`` embedding column.

Baseline: brute-force cosine top-k — one broadcast of the (small) query
set against a scan of the (huge) corpus; the dot product is a JVM-side
fold (``zip_with`` + ``aggregate``) in DOUBLE, so no Python crosses the
hot path and results are deterministic.

Scale path: LSH bucketing via deterministic random hyperplanes — sign
bits bucket the corpus; only same-bucket candidates are reranked
exactly. Bucket assignment is again a pure column expression, so the
corpus pass is a scan + one shuffle on (bucket).

At 100 TB the brute force is O(|corpus| * |queries|) multiply-adds but
embarrassingly parallel with NO shuffle (broadcast join + per-partition
top-k then a tiny driver-side merge via TakeOrdered); the LSH variant
cuts the rerank set by ~2^bits.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_sim_col(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k: for each query row, the k most similar
    corpus rows. Queries are broadcast; the per-query top-k is a window
    over the (query) key — with few queries this is a light shuffle.

    Returns (qid, cid, sim, rk).
    """
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("c_vec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .withColumn("sim", cosine_sim_col(F.col("q_vec"), F.col("c_vec")))
        .select("qid", "cid", "sim")
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("cid").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .withColumn("sim", F.round("sim", 4))
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (Box-Muller over a
    SplitMix64 stream — reproducible anywhere, no numpy RNG state)."""
    def splitmix(x: int) -> int:
        x = (x + 0x9E3779B97F4A7C15) % (1 << 64)
        z = x
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) % (1 << 64)
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) % (1 << 64)
        return z ^ (z >> 31)

    planes = []
    state = seed
    for _ in range(n_planes):
        vals = []
        while len(vals) < dim:
            state = splitmix(state)
            u1 = ((state >> 11) + 1) / (1 << 53)
            state = splitmix(state)
            u2 = (state >> 11) / (1 << 53)
            r = math.sqrt(-2.0 * math.log(u1))
            vals.append(r * math.cos(2 * math.pi * u2))
            if len(vals) < dim:
                vals.append(r * math.sin(2 * math.pi * u2))
        planes.append(vals[:dim])
    return planes


def with_lsh_bucket(
    df: DataFrame, dim: int, n_planes: int = 12, vec_col: str = "embedding", seed: int = 42
) -> DataFrame:
    """Random-hyperplane LSH: bucket = the sign-bit string of the vector
    against ``n_planes`` fixed hyperplanes (cosine-LSH, Charikar 2002).
    Hyperplanes are literals folded into the plan — broadcast for free.
    """
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = F.concat(
        *[
            F.when(
                _dot(F.col(vec_col), F.array(*[F.lit(v) for v in p])) >= 0, F.lit("1")
            ).otherwise(F.lit("0"))
            for p in planes
        ]
    )
    return df.withColumn("bucket", bucket)


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """ANN: exact rerank restricted to the query's LSH bucket. Recall
    trades off with ``n_planes``; multi-probe = union over neighboring
    buckets (left to the caller). Returns (qid, cid, sim, rk)."""
    cb = with_lsh_bucket(corpus, dim, n_planes, vec_col, seed).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("c_vec"), "bucket"
    )
    qb = with_lsh_bucket(queries, dim, n_planes, vec_col, seed).select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("q_vec"), "bucket"
    )
    scored = (
        cb.join(F.broadcast(qb), "bucket")
        .withColumn("sim", cosine_sim_col(F.col("q_vec"), F.col("c_vec")))
        .select("qid", "cid", "sim")
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("cid").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .withColumn("sim", F.round("sim", 4))
    )
