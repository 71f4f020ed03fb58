"""Changelog-level filters and event bookkeeping (SURVEY §2.2).

Every filter is a plain Column predicate so Catalyst pushes it into the
parquet scan (check with ``df.explain``: these land in ``PushedFilters``).
At 100 TB, F4/F5 (time/position bounds) become partition pruning when the
changelog is laid out by date/file — which the writer in
``streaming/runner.py`` does.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def filter_tables(df: DataFrame, tables: Iterable[str], col: str = "table_name") -> DataFrame:
    """F1 — only configured tables pass.

    Reference: ``only_tables`` on the stream reader
    (matomo2clickhouse.py:493; set at _settings.py:105-122)."""
    return df.filter(F.col(col).isin(list(tables)))


def filter_schemas(df: DataFrame, schemas: Iterable[str], col: str = "schema_name") -> DataFrame:
    """F2 — source-database restriction (matomo2clickhouse.py:492)."""
    return df.filter(F.col(col).isin(list(schemas)))


def filter_dml(df: DataFrame, ops: Iterable[str] = ("I", "U", "D"), col: str = "op") -> DataFrame:
    """F3 — keep only row events / a sql-type whitelist
    (binlog2sql_util.py:196-211; gate matomo2clickhouse.py:550)."""
    return df.filter(F.col(col).isin(list(ops)))


def filter_time_range(df: DataFrame, start=None, stop=None, col: str = "ts") -> DataFrame:
    """F4 — skip events before ``start``; stop at ``stop`` (exclusive),
    matching the reference's ``event_time < start_time`` skip and
    ``>= stop_time`` break (matomo2clickhouse.py:522-533)."""
    out = df
    if start is not None:
        out = out.filter(F.col(col) >= F.lit(start))
    if stop is not None:
        out = out.filter(F.col(col) < F.lit(stop))
    return out


def filter_pos_range(df: DataFrame, start_seq=None, end_seq=None, col: str = "seq") -> DataFrame:
    """F5 — position-bounded slice of the totally-ordered changelog
    (start exclusive / end inclusive, matching resume-from-checkpoint
    semantics: the ledger stores the *last applied* position,
    matomo2clickhouse.py:518-533, 786-812)."""
    out = df
    if start_seq is not None:
        out = out.filter(F.col(col) > F.lit(start_seq))
    if end_seq is not None:
        out = out.filter(F.col(col) <= F.lit(end_seq))
    return out


def split_old_deletes(
    df: DataFrame,
    date_col: str,
    now_col: Column,
    days: int = 31,
    op_col: str = "op",
) -> tuple[DataFrame, DataFrame]:
    """F6 — old-DELETE rejection.

    For guarded tables, a DELETE whose row date is more than ``days`` old
    is NOT applied: the target keeps history the source drops
    (matomo2clickhouse.py:583-606, threshold ``dv_count_days > 31`` at
    :593; table set _settings.py:132-138). Returns ``(kept, rejected)``;
    the caller counts ``rejected`` for the run report
    (matomo2clickhouse.py:728-731) — with ``observe()`` in streaming.

    Both branches are single predicates over one scan; Spark will read the
    source once per branch with the filter pushed down (or reuse the
    exchange under AQE when the changelog is cached in the runner).
    """
    is_old_delete = (F.col(op_col) == "D") & (
        F.datediff(now_col, F.col(date_col)) > F.lit(days)
    )
    return df.filter(~is_old_delete), df.filter(is_old_delete)


def _null_key_reason(keys: Iterable[str]) -> Column:
    whens = [F.when(F.col(k).isNull(), F.lit(f"null_key:{k}")) for k in keys]
    if not whens:
        return F.lit(None).cast("string")
    return F.coalesce(*whens, F.lit(None).cast("string"))


def split_poison(
    df: DataFrame,
    key_cols: Iterable[str],
    seq_col: str = "seq",
    op_col: str = "op",
    valid_ops: Iterable[str] = ("I", "U", "D"),
    table_col: str | None = "table_name",
    key_cols_by_table: dict[str, list[str]] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """B3/O8 — poison-record quarantine.

    The reference isolates a poisoned statement by degrading to
    row-at-a-time replay after a failure (matomo2clickhouse.py:841-847;
    procedure README.md:162-170) — a binary search by re-execution.
    Declaratively we can do better: the reasons a row can poison an
    apply are schema invariants (null/absent key, null position, unknown
    op), and those are *predicates*, so the bad rows are diverted to a
    reject table in the same scan instead of killing the batch.

    Returns ``(valid, rejected-with-reason)``. The reason column makes
    the reject table the operator-facing diagnosis the reference surfaces
    through DEBUG logs (``dv_sql_for_execute_last``).

    A NULL ``table_col`` (when the column exists) is poison too: such a
    row can't be routed to any table policy, so without this check it
    would be consumed into the ledger yet applied nowhere — a silent
    drop. Pass ``table_col=None`` for table-less frames.

    ``key_cols_by_table`` scopes the key-null check per row to the
    row's OWN table's key columns (a matomo-shaped changelog carries
    many tables' key columns; a visits row legitimately has NULL
    idgoal). Tables not in the map fall back to ``key_cols``.
    """
    keys = list(key_cols)
    reason = (
        F.when(F.col(seq_col).isNull(), F.lit("null_position"))
        # isNull first: ``~isin`` is NULL (not true) for a NULL op, which
        # would let a corrupt-envelope row through as "valid".
        .when(
            F.col(op_col).isNull() | ~F.col(op_col).isin(list(valid_ops)),
            F.lit("unknown_op"),
        )
    )
    have_table = table_col is not None and table_col in df.columns
    if have_table:
        reason = reason.when(F.col(table_col).isNull(), F.lit("null_table_name"))
    null_key = _null_key_reason(keys)
    if key_cols_by_table and have_table:
        # per-row scoping: each table checks only its own key columns
        per_table = null_key
        for tbl, cols in key_cols_by_table.items():
            per_table = F.when(
                F.col(table_col) == F.lit(tbl), _null_key_reason(cols)
            ).otherwise(per_table)
        null_key = per_table
    reason = reason.otherwise(null_key)
    tagged = df.withColumn("__poison", reason)
    valid = tagged.filter(F.col("__poison").isNull()).drop("__poison")
    rejected = tagged.filter(F.col("__poison").isNotNull()).withColumnRenamed(
        "__poison", "reject_reason"
    )
    return valid, rejected


def with_txn_start(
    df: DataFrame,
    marker: Column,
    seq_col: str = "seq",
    partition_col: str = "file_seq",
) -> DataFrame:
    """G1 — transaction-begin tracking.

    The reference remembers the position of the last ``BEGIN`` QueryEvent
    so each row's SQL is attributed to its transaction start
    (matomo2clickhouse.py:539-541). Declaratively: carry forward the last
    marker position over the per-file order — a transaction marker can
    never cross a file boundary in the binlog model, so the window
    partitions by ``file_seq`` and each file is an independent task.

    The partition column is REQUIRED: the old fallback (a window ordered
    over the whole changelog when ``file_seq`` was absent) was a
    single-partition sort — the one plan shape that cannot survive a
    100 TB backfill, and nothing enforced the docstring's "first
    range-partition by file_seq" promise. A file-backed frame that lost
    the column can rebuild it from ``input_file_name()``; an in-memory
    frame must carry its own batch/file ordering column.
    """
    from pyspark.sql.window import Window

    if partition_col not in df.columns:
        raise ValueError(
            f"with_txn_start requires a partition column {partition_col!r} "
            "(the binlog file id): a global-order window would be a "
            "single-partition sort at scale. Derive it from "
            "input_file_name() for file-backed frames, or pass "
            "partition_col= for a frame that tracks its files elsewhere."
        )
    w = (
        Window.partitionBy(partition_col)
        .orderBy(seq_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(
        "txn_start_pos",
        F.last(F.when(marker, F.col(seq_col)), ignorenulls=True).over(w),
    )
