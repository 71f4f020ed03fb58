"""Source-vs-target replication integrity checking (checksum compare).

The reference documents mounting the MySQL source INTO ClickHouse
(``CREATE DATABASE ... ENGINE = MySQL``) explicitly "для проверки
целостности данных" — source-vs-target diffing after replication
(/root/reference/README.md:259-278).  The engine-side re-expression is
the classic pt-table-checksum pattern rather than a row-level cross-DB
join: each side folds, MAP-SIDE, to ONE row per table —

    (table, n_rows, sum(row_digest), bit_xor(row_digest))

— and only these tiny aggregates are joined and compared.  At 100 TB
neither table ever crosses the network for the check: the digests are
order-insensitive (sum/xor commute), partial aggregation folds them
per-partition, and the final exchange carries a handful of rows per
table.  A row-level drill-down (full outer join) is deliberately a
SEPARATE bounded op the operator runs only on tables the checksum
already flagged.

The per-row digest is built from an explicitly CANONICALIZED string so
the same arithmetic is expressible in ANSI SQL (the DuckDB oracle) and
in ClickHouse/MySQL dialects in a real deployment:

    bigint( first 15 hex chars of md5(concat_ws('|', cols...)) )

15 hex chars = 60 bits, always positive, no bigint overflow on the
parse.  Two independent order-insensitive accumulators — ``bit_xor``
of the 60-bit digest and ``sum`` of the digest reduced mod 1e9+7 — so
a pair of compensating edits must fool both.  The mod-reduce keeps the
sum exact int64 arithmetic on BOTH engines (Spark would silently wrap
a raw 60-bit sum while DuckDB widens to hugeint): < 1e9 per row leaves
headroom for ~9e9 rows per table; beyond that, shard the fold (the xor
accumulator has no such limit).
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: hex digits of the md5 kept in the numeric digest (60 bits < int64)
DIGEST_HEX_LEN = 15

#: modulus for the sum accumulator (keeps per-row terms < 1e9 so the
#: int64 sum stays exact on both engines up to ~9e9 rows per table)
SUM_MOD = 1_000_000_007


def row_digest(cols: Sequence[Column | str]) -> Column:
    """60-bit numeric digest of the canonicalized column tuple.

    Callers are responsible for canonicalization (timestamps formatted,
    doubles truncated to a fixed scale) so that an independent engine
    computing the same expression over the same rows gets the same
    digest; ``concat_ws`` maps NULL to the empty string on every
    engine, keeping NULL handling deterministic too.
    """
    canon = F.concat_ws("|", *[F.col(c) if isinstance(c, str) else c for c in cols])
    return F.conv(F.substring(F.md5(canon), 1, DIGEST_HEX_LEN), 16, 10).cast("bigint")


def table_checksums(
    state: DataFrame,
    digest: Column,
    table_col: str = "table_name",
) -> DataFrame:
    """Per-table checksum fold: ``(table_name, n_rows, sum_digest,
    xor_digest)`` — one aggregation, map-side partial combine, output
    rows = number of tables (tiny by construction)."""
    return (
        state.select(F.col(table_col).alias("table_name"), digest.alias("__d"))
        .groupBy("table_name")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("__d") % F.lit(SUM_MOD)).alias("sum_digest"),
            F.expr("bit_xor(__d)").alias("xor_digest"),
        )
    )


def checksum_compare(src: DataFrame, dst: DataFrame) -> DataFrame:
    """Join the two tiny per-table checksum frames and verdict each
    table: counts equal AND both digest accumulators equal.  A table
    present on only one side compares as a mismatch with the other
    side's count read as 0 (the replica dropped or invented a table).
    """
    s = src.select(
        "table_name",
        F.col("n_rows").alias("n_src"),
        F.col("sum_digest").alias("sum_src"),
        F.col("xor_digest").alias("xor_src"),
    )
    d = dst.select(
        "table_name",
        F.col("n_rows").alias("n_dst"),
        F.col("sum_digest").alias("sum_dst"),
        F.col("xor_digest").alias("xor_dst"),
    )
    j = s.join(d, "table_name", "full_outer")
    n_src = F.coalesce(F.col("n_src"), F.lit(0))
    n_dst = F.coalesce(F.col("n_dst"), F.lit(0))
    count_match = n_src == n_dst
    digest_match = (
        count_match
        & F.col("sum_src").eqNullSafe(F.col("sum_dst"))
        & F.col("xor_src").eqNullSafe(F.col("xor_dst"))
    )
    return j.select(
        "table_name",
        n_src.alias("n_src"),
        n_dst.alias("n_dst"),
        count_match.alias("count_match"),
        digest_match.alias("digest_match"),
    )


def row_diff(
    src: DataFrame,
    dst: DataFrame,
    keys: Iterable[str],
    digest: Column,
) -> DataFrame:
    """Row-level drill-down for a table the checksum FLAGGED: full
    outer join on the business key, classify each divergent key as
    ``only_src`` / ``only_dst`` / ``value_diff``.  Bounded use only —
    run it per flagged table, never as the primary check (it shuffles
    both sides on the key, which is exactly what the checksum fold
    exists to avoid at 100 TB)."""
    keys = list(keys)
    s = src.select(*keys, digest.alias("__src_d"))
    d = dst.select(*keys, digest.alias("__dst_d"))
    j = s.join(d, keys, "full_outer")
    status = (
        F.when(F.col("__dst_d").isNull(), F.lit("only_src"))
        .when(F.col("__src_d").isNull(), F.lit("only_dst"))
        .when(F.col("__src_d") != F.col("__dst_d"), F.lit("value_diff"))
    )
    return (
        j.select(*keys, status.alias("diff"))
        .filter(F.col("diff").isNotNull())
    )
