"""Local mirror of the driver's Spark-vs-DuckDB comparison: row count,
column names (sorted), and order-insensitive normalized values."""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb

from mysql2clickhouse_spark.sources.tables import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    if isinstance(v, Decimal):
        return repr(round(float(v), 9))
    if isinstance(v, datetime):
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, date):
        return v.isoformat()
    return str(v)


def normalize_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare(spark_df, con, sql: str) -> tuple[bool, str]:
    s_rows = spark_df.collect()
    s_cols = spark_df.columns
    rel = con.sql(sql)
    d_cols = rel.columns
    d_rows = rel.fetchall()
    if sorted(c.lower() for c in s_cols) != sorted(c.lower() for c in d_cols):
        return False, f"schema mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    sn = normalize_rows(s_cols, [tuple(r) for r in s_rows])
    dn = normalize_rows(d_cols, d_rows)
    if sn != dn:
        diff = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
        return False, f"value mismatch, first diffs: {diff}"
    return True, f"ok ({len(s_rows)} rows)"
