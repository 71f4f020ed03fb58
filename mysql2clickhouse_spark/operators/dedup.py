"""Duplicate audit + windowed dedup compaction (Q2/Q3).

The reference's append-only model (INS-UPD) leaves superseded versions in
the table; an hourly maintenance mutation deletes them inside a bounded
date window (_settings.py:230-287, gate matomo2clickhouse.py:756-766),
and an audit query counts the residue (README.md:334-352,
doc_old_duplicates.md:31-71). Correctness contract: rows older than
now-2h are duplicate-free (doc_old_duplicates.md:179-185).

At scale the mutation becomes a partition-scoped overwrite: only the
``yyyymm`` partitions intersecting the window are read and rewritten
(O12, _settings.py:258,286) — everything else is untouched bytes.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def duplicate_audit(
    df: DataFrame,
    keys: Iterable[str],
    version_col: str = "dateid",
    range_filter: Column | None = None,
) -> DataFrame:
    """Q2 — count superseded versions, faithful to the reference's shape:
    subquery A (key, dateid in range) RIGHT JOIN subquery B
    (``GROUP BY key HAVING count(*) > 1`` + max(dateid)) on the key;
    keep rows where ``dateid <> dateid_max``; count
    (doc_old_duplicates.md:31-71).

    Returns a 1-row DataFrame ``(dup_count BIGINT)``. The two aggregates
    share one shuffle key, so AQE reuses the exchange.
    """
    keys = list(keys)
    a = df if range_filter is None else df.filter(range_filter)
    a = a.select(*keys, version_col)
    b = (
        df.select(*keys, version_col)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("cnt"), F.max(version_col).alias("dateid_max"))
        .filter(F.col("cnt") > 1)
    )
    dup = a.join(b, on=keys, how="right").filter(
        F.col(version_col).isNotNull() & (F.col(version_col) != F.col("dateid_max"))
    )
    return dup.agg(F.count(F.lit(1)).alias("dup_count"))


def dedup_in_window(
    df: DataFrame,
    keys: Iterable[str],
    version_col: str = "dateid",
    window_filter: Column | None = None,
) -> DataFrame:
    """Q3 — the dedup compaction: inside the window keep only the latest
    version per key; outside the window keep everything.

    The reference runs this as ``ALTER TABLE ... DELETE WHERE date-range
    AND dateid IN (superseded-subquery)`` (_settings.py:230-287). The
    immutable-storage form: window-rank inside the date window, union
    with the untouched complement. When the caller scopes ``df`` to the
    affected ``yyyymm`` partitions only, this is the partition-scoped
    overwrite of O12.
    """
    keys = list(keys)
    if window_filter is None:
        in_win, out_win = df, None
    else:
        in_win, out_win = df.filter(window_filter), df.filter(~window_filter)
    # rank, not row_number: the reference deletes rows whose dateid is
    # NOT the max (_settings.py:237-256) — rows TIED at max(dateid) all
    # survive, and rank reproduces that deterministically.
    w = Window.partitionBy(*keys).orderBy(F.col(version_col).desc())
    kept = (
        in_win.withColumn("__rk", F.rank().over(w))
        .filter(F.col("__rk") == 1)
        .drop("__rk")
    )
    return kept if out_win is None else kept.unionByName(out_win)
