"""Near-duplicate detection: shingling, MinHash+LSH, SimHash,
n-gram Jaccard — all as native column expressions + joins.

Design for 100 TB:
- signatures are computed in one pass over the text during the scan
  (higher-order array functions run in the JVM, no Python);
- LSH banding turns the O(n²) pair space into a groupBy on
  (band_idx, band_hash) — an ordinary shuffle whose fan-out is bounded
  by bucket size; hot buckets are breakable via AQE skew handling or a
  per-bucket cap;
- only candidate pairs (same bucket) are verified with exact Jaccard —
  the verify join is a tiny fraction of the corpus.

MinHash math: h_i(s) = (a_i * murmur3(s) + b_i) mod p, signature =
elementwise min over a document's shingle set; P(sig_i matches) =
Jaccard(A, B). Bands of r rows: candidate iff some band agrees
(standard Broder MinHash / LSH construction).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Mersenne prime 2^31-1: with 31-bit shingle hashes, h*a + b < 2^62 —
# stays inside BIGINT so the whole permutation family runs as native
# integer arithmetic (no overflow, no BigDecimal fallback).
MERSENNE_P = (1 << 31) - 1

def _perm_params(num_perm: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) permutation params via a small LCG (no
    global RNG; replay-stable across cluster restarts)."""
    params, state = [], seed
    for _ in range(num_perm):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = (state % (MERSENNE_P - 1)) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = state % MERSENNE_P
        params.append((a, b))
    return params


def with_shingles(df: DataFrame, text_col: str = "text", k: int = 5) -> DataFrame:
    """Character k-shingle set, lower-cased, distinct. One pass, JVM-side:
    sequence → transform(substring) → array_distinct."""
    t = F.lower(F.col(text_col))
    n = F.greatest(F.length(t) - (k - 1), F.lit(1))
    shingles = F.array_distinct(
        F.transform(F.sequence(F.lit(1), n), lambda i: F.substring(t, i, k))
    )
    return df.withColumn("shingles", shingles)


def with_minhash_signature(df: DataFrame, num_perm: int = 32, seed: int = 42) -> DataFrame:
    """MinHash signature as ``array<bigint>`` of length ``num_perm``.

    Single fold over the shingle array: each shingle expands to its
    ``num_perm`` permuted hashes (murmur3 via ``F.hash``), folded with
    elementwise min. No shuffle, no UDF.
    """
    params = _perm_params(num_perm, seed)
    init = F.array(*[F.lit(MERSENNE_P).cast("bigint") for _ in range(num_perm)])

    def perm_hashes(sh: Column) -> Column:
        h = F.hash(sh).cast("bigint").bitwiseAND(F.lit((1 << 31) - 1))
        return F.array(*[((h * a + b) % MERSENNE_P).cast("bigint") for a, b in params])

    sig = F.aggregate(
        F.col("shingles"),
        init,
        lambda acc, sh: F.zip_with(acc, perm_hashes(sh), lambda x, y: F.least(x, y)),
    )
    return df.withColumn("minhash", sig)


def lsh_candidate_pairs(
    df: DataFrame, id_col: str = "doc_id", bands: int = 8, rows: int = 4
) -> DataFrame:
    """LSH banding: split the signature into ``bands`` bands of ``rows``
    values, bucket on (band_idx, hash(band)), self-join buckets for
    candidate pairs (id_a < id_b), distinct.

    The self-join is bucket-local — with band size r and threshold
    t ≈ (1/b)^(1/r), bucket cardinality stays small; the groupBy is the
    only corpus-wide shuffle.
    """
    exploded = df.select(
        F.col(id_col),
        F.posexplode(
            F.array(*[F.slice("minhash", i * rows + 1, rows) for i in range(bands)])
        ).alias("band_idx", "band"),
    ).select(id_col, "band_idx", F.hash("band").alias("band_hash"))
    a = exploded.alias("a")
    b = exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def jaccard_col(sh_a: Column, sh_b: Column) -> Column:
    """Exact Jaccard over two shingle arrays (already distinct)."""
    inter = F.size(F.array_intersect(sh_a, sh_b)).cast("double")
    union = (F.size(sh_a) + F.size(sh_b)).cast("double") - inter
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def verified_near_dups(
    shingled: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.7,
    num_perm: int = 32,
    bands: int = 8,
    rows: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Full MinHash+LSH pipeline: signature → banded candidates → exact
    Jaccard verify ≥ threshold. Returns (id_a, id_b, jaccard)."""
    sigs = with_minhash_signature(shingled, num_perm=num_perm, seed=seed)
    cands = lsh_candidate_pairs(sigs, id_col=id_col, bands=bands, rows=rows)
    sh = shingled.select(F.col(id_col), F.col("shingles"))
    pairs = (
        cands.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("shingles", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("shingles", "sh_b"), "id_b")
        .withColumn("jaccard", F.round(jaccard_col(F.col("sh_a"), F.col("sh_b")), 4))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return pairs


def with_simhash(df: DataFrame, text_col: str = "text", bits: int = 64) -> DataFrame:
    """SimHash: xxhash64 per token; for each bit position sum ±1 weights;
    the sign vector packs into a hex string (sign-safe — no BIGINT
    overflow games). Hamming-close docs share most bits; pairing uses
    byte-block banding like MinHash.

    One fold over the token array, entirely JVM-side.
    """
    tokens = F.split(F.lower(F.trim(F.col(text_col))), " +")
    init = F.array(*[F.lit(0).cast("bigint") for _ in range(bits)])

    def bit_votes(tok: Column) -> Column:
        h = F.xxhash64(tok)
        return F.array(
            *[(F.shiftright(h, i).bitwiseAND(F.lit(1)) * 2 - 1).cast("bigint") for i in range(bits)]
        )

    votes = F.aggregate(tokens, init, lambda acc, t: F.zip_with(acc, bit_votes(t), lambda x, y: x + y))
    bitsarr = F.transform(votes, lambda v: F.when(v > 0, F.lit(1)).otherwise(F.lit(0)))
    # pack 4 bits per hex nibble
    nibbles = F.transform(
        F.sequence(F.lit(0), F.lit(bits // 4 - 1)),
        lambda i: F.conv(
            F.concat(
                *[F.element_at(bitsarr, (F.lit(1) + i * 4 + j)).cast("string") for j in range(4)]
            ),
            2,
            16,
        ),
    )
    return df.withColumn("simhash", F.lower(F.concat_ws("", nibbles)))
