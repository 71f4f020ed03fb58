"""Skew mitigation for hot join keys.

AQE's skew-join split (on in ``session.py``) rebalances SORT-MERGE
joins at runtime, but a shuffle-hash join on a pathologically hot key —
or any engine without runtime re-planning — still funnels that key's
rows into one task. Salting is the planning-time fix: spread the hot
side across ``n_salts`` sub-keys and replicate the other side to match.
Result rows are IDENTICAL to the plain join (pinned by
``test_salted_join_equals_plain_join``); only the task layout changes.

The salt must be DETERMINISTIC (replays and retries must route a row
the same way — a ``rand()`` salt breaks recomputed-stage consistency on
task retry, a real correctness hazard, not a style point), so it hashes
the row's full column set: a hot key's rows carry differing payloads,
which is exactly what spreads them.

Cost model: the replicated side grows ``n_salts``×, so salt the join
only when the skewed side's hot-key volume dominates the replicated
side's total size — the classic fact⋈mid-size-dim skew shape where the
dim is too big to broadcast. Size ``n_salts`` ≈ hot-key rows / target
task size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SUPPORTED = ("inner", "left", "left_outer", "left_semi", "left_anti")


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    keys: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the SKEWED side salted and ``other`` replicated.

    Supported join types keep ``skewed`` on the preserved side
    (inner/left/left_semi/left_anti): replicating ``other`` cannot then
    duplicate or drop results. Right/full joins would emit one row per
    replica for unmatched ``other`` rows — refused, flip the call.
    """
    if how not in _SUPPORTED:
        raise ValueError(f"salted_join supports {_SUPPORTED}, got {how!r}")
    keys = list(keys)
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(n_salts)
    ).cast("int")
    left = skewed.withColumn("__salt", salt)
    right = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return left.join(right, keys + ["__salt"], how).drop("__salt")


def hot_keys(df: DataFrame, keys: Sequence[str], min_rows: int) -> DataFrame:
    """Keys whose row count reaches ``min_rows`` — the profiling query
    that decides whether a join needs salting (and sizes ``n_salts``).
    One map-side-combined aggregation."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") >= min_rows)
    )
