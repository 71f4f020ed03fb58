"""Structured Streaming wrapper: availableNow catch-up over a changelog
directory lands the same state as the batch runner."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from mysql2clickhouse_spark.operators.apply import latest_by_key
from mysql2clickhouse_spark.streaming.stream import run_streaming_replication

SCHEMA = (
    "op string, table_name string, key bigint, seq bigint, file_seq bigint,"
    " ts timestamp, value double, event_type string"
)
T0 = dt.datetime(2024, 3, 1)


def test_streaming_available_now(spark, tmp_path):
    rows1 = [
        ("I", "visits", 1, 1, 0, T0, 1.0, "e"),
        ("U", "visits", 1, 2, 0, T0, 2.0, "e"),
        ("I", "events_state", 7, 3, 0, T0, 7.0, "e"),
    ]
    rows2 = [
        ("I", "visits", 2, 4, 1, T0, 4.0, "e"),
        ("D", "events_state", 7, 5, 1, T0, 0.0, "e"),
    ]
    cl_dir = str(tmp_path / "changelog")
    spark.createDataFrame(rows1, SCHEMA).coalesce(1).write.mode("append").parquet(cl_dir)
    spark.createDataFrame(rows2, SCHEMA).coalesce(1).write.mode("append").parquet(cl_dir)

    wh = str(tmp_path / "wh")
    run_streaming_replication(spark, cl_dir, wh, SCHEMA, available_now=True)

    visits = spark.read.parquet(f"{wh}/tables/visits")
    latest = latest_by_key(visits, ["key"], "dateid", form="window")
    got = {r.key: r.value for r in latest.collect()}
    assert got == {1: 2.0, 2: 4.0}

    state = spark.read.parquet(f"{wh}/tables/events_state")
    assert state.filter(F.col("key") == 7).count() == 0  # deleted downstream

    # incremental: a third file arrives, only it is processed
    rows3 = [("I", "visits", 3, 6, 2, T0, 6.0, "e")]
    spark.createDataFrame(rows3, SCHEMA).coalesce(1).write.mode("append").parquet(cl_dir)
    run_streaming_replication(spark, cl_dir, wh, SCHEMA, available_now=True)
    visits2 = spark.read.parquet(f"{wh}/tables/visits")
    assert visits2.filter(F.col("key") == 3).count() == 1
