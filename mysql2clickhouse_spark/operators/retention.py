"""Retention / cleanup jobs (Q4-Q6, Q12).

The reference trims the *source* (MySQL) in bounded bites so replication
never sees an unbounded delete storm: probe the oldest <=10,001 ids for
the newest one older than the horizon, count, then delete below it
(_settings.py:174-223; executor matomo2clickhouse.py:400-443). It also
purges consumed binlog files, guarded by replication progress
(matomo2clickhouse.py:382-398), and prunes its own ledger
(README.md:131-134).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def retention_probe(
    df: DataFrame,
    id_col: str,
    date_col: str,
    cutoff,
    scan_limit: int = 10001,
) -> DataFrame:
    """Q4 — top-k retention probe, faithful shape
    (_settings.py:177-188): among the oldest ``scan_limit`` rows by id,
    the max id whose date is older than ``cutoff``. Bounding the scan to
    10,001 ids bounds the subsequent delete — that's the reference's
    backpressure trick, and on Spark the ``orderBy().limit()`` compiles
    to a TakeOrdered (partial per-partition top-k, no full sort).

    Returns 1 row ``(id_max BIGINT)`` (possibly NULL-empty).
    """
    oldest = df.select(id_col, date_col).orderBy(F.col(id_col).asc()).limit(scan_limit)
    return (
        oldest.filter(F.col(date_col) < F.lit(cutoff))
        .orderBy(F.col(id_col).desc())
        .limit(1)
        .select(F.col(id_col).alias("id_max"))
    )


def retention_count(df: DataFrame, id_col: str, probe: DataFrame) -> DataFrame:
    """Q5 — ``SELECT count(id) WHERE id < {id_max}``
    (_settings.py:189-190). ``probe`` is the 1-row Q4 result; cross-join
    broadcast keeps it fully distributed (no driver collect)."""
    return (
        df.select(id_col)
        .crossJoin(F.broadcast(probe))
        .filter(F.col(id_col) < F.col("id_max"))
        .agg(F.count(F.lit(1)).alias("del_count"))
    )


def retention_delete(df: DataFrame, id_col: str, probe: DataFrame) -> DataFrame:
    """Q5 delete half — survivors after ``DELETE WHERE id < id_max``
    (_settings.py:205-206) as a filtered rewrite. NULL id_max (nothing to
    delete) keeps every row, matching the reference's skip."""
    return (
        df.crossJoin(F.broadcast(probe))
        .filter(F.col("id_max").isNull() | (F.col(id_col) >= F.col("id_max")))
        .drop("id_max")
    )


def purge_eligible_files(
    changelog: DataFrame,
    ledger: DataFrame,
    keep_days: int = 180,
    file_col: str = "file_seq",
    ts_col: str = "ts",
    ledger_ts_col: str = "log_time",
) -> DataFrame:
    """Q6 — binlog purge guard (matomo2clickhouse.py:382-398): drop
    changelog files wholly older than the horizon, but ONLY if
    replication progress (max ledger log_time) has passed the horizon —
    never purge what isn't applied yet (guard at :389).

    Returns the file ids eligible for purge. Horizon is derived from the
    data's own max(ts) so the job is deterministic/replayable rather than
    wall-clock dependent.
    """
    horizon = changelog.agg(
        F.date_sub(F.max(ts_col).cast("date"), keep_days).alias("horizon")
    )
    progress = ledger.agg(F.max(ledger_ts_col).alias("progress"))
    per_file = changelog.groupBy(file_col).agg(F.max(ts_col).alias("file_max_ts"))
    return (
        per_file.crossJoin(F.broadcast(horizon))
        .crossJoin(F.broadcast(progress))
        .filter(
            (F.col("file_max_ts").cast("date") < F.col("horizon"))
            & (F.col("progress").cast("date") >= F.col("horizon"))
        )
        .select(file_col)
    )


def ledger_prune(ledger: DataFrame, cutoff, created_col: str = "created_at") -> DataFrame:
    """Q12 — ledger maintenance: keep rows with created_at >= cutoff
    (README.md:131-134) as a filtered overwrite."""
    return ledger.filter(F.col(created_col) >= F.lit(cutoff))
