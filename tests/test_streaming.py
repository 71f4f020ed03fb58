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


def test_streaming_continuous_processing_time(spark, tmp_path):
    """--stop-never parity (binlog2sql_util.py:125-126): a processingTime
    query tails a GROWING changelog directory — files arriving after the
    query starts are picked up by later micro-batches — until the caller
    stops it (the reference runs forever; the test stops after the
    second wave lands)."""
    import time

    from mysql2clickhouse_spark.streaming.runner import ReplicationRunner, RunConfig

    cl_dir = str(tmp_path / "changelog")
    wh = str(tmp_path / "wh")
    spark.createDataFrame(
        [("I", "visits", 1, 1, 0, T0, 1.0, "e")], SCHEMA
    ).coalesce(1).write.mode("append").parquet(cl_dir)

    q = run_streaming_replication(
        spark, cl_dir, wh, SCHEMA,
        available_now=False, processing_interval="1 second",
    )
    try:
        assert q.isActive

        def wait_for(pred, timeout=60.0):
            deadline = time.monotonic() + timeout
            while time.monotonic() < deadline:
                if pred():
                    return True
                time.sleep(0.5)
            return False

        runner = ReplicationRunner(spark, RunConfig(target_dir=wh))
        assert wait_for(lambda: runner.resume_seq() == 1), "first wave not applied"

        # second wave arrives while the query is live
        spark.createDataFrame(
            [
                ("U", "visits", 1, 2, 1, T0, 2.0, "e"),
                ("I", "visits", 2, 3, 1, T0, 3.0, "e"),
            ],
            SCHEMA,
        ).coalesce(1).write.mode("append").parquet(cl_dir)
        assert wait_for(lambda: runner.resume_seq() == 3), "second wave not applied"
    finally:
        q.stop()
    assert not q.isActive

    visits = spark.read.parquet(f"{wh}/tables/visits")
    latest = latest_by_key(visits, ["key"], "dateid", form="window")
    got = {r.key: r.value for r in latest.collect()}
    assert got == {1: 2.0, 2: 3.0}


def test_windowed_counts_with_watermark(spark, tmp_path):
    from mysql2clickhouse_spark.streaming.windows import windowed_event_counts

    # one file per micro-batch: append-mode windows emit in the batch
    # AFTER the watermark (computed at the previous batch's end) passes
    # their end, so finalization needs subsequent batches to observe it
    cl_dir = str(tmp_path / "cl")
    files = [
        [0, 30],      # B1: watermark after = 30m - 30m = 0
        [60, 90],     # B2: wm after = 60m
        [120, 150],   # B3: wm after = 120m -> finalizes hours 0 and 1
        [180],        # B4: emits windows [0,1h) and [1h,2h)
    ]
    for i, minutes in enumerate(files):
        rows = [
            ("I", "visits", 1, m, i, T0 + dt.timedelta(minutes=m), 1.0, "e")
            for m in minutes
        ]
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(cl_dir)

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(cl_dir)
    )
    q = (
        windowed_event_counts(stream, window="1 hour", watermark="30 minutes")
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r.win_start, r.cnt) for r in spark.sql("SELECT * FROM win_counts").collect()}
    assert (T0, 2) in got and (T0 + dt.timedelta(hours=1), 2) in got
    # the 2h window is not finalized yet — held back by the watermark
    assert all(ws < T0 + dt.timedelta(hours=2) for ws, _ in got)

    # same plan runs as a plain batch query (no watermark semantics)
    batch = windowed_event_counts(spark.read.parquet(cl_dir))
    assert batch.count() == 4


def test_stateful_latest_state_across_batches(spark, tmp_path):
    from mysql2clickhouse_spark.streaming.windows import stateful_latest_state

    cl_dir = str(tmp_path / "cl2")
    spark.createDataFrame(
        [
            ("I", "visits", 1, 1, 0, T0, 1.0, "e"),
            ("U", "visits", 1, 2, 0, T0, 5.0, "e"),
            ("I", "visits", 2, 3, 0, T0, 2.0, "e"),
        ],
        SCHEMA,
    ).coalesce(1).write.mode("append").parquet(cl_dir)

    emitted: list = []

    def run():
        # memory sink can't recover from a checkpoint; foreachBatch can
        stream = spark.readStream.schema(SCHEMA).parquet(cl_dir)
        q = (
            stateful_latest_state(stream)
            .writeStream.foreachBatch(
                lambda bdf, bid: emitted.extend(bdf.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt2"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    got = {r.key: (r.seq, r.value, r.deleted) for r in emitted}
    assert got[1] == (2, 5.0, "") and got[2] == (3, 2.0, "")

    # a later batch: key 2 deleted, key 1 late lower-seq update ignored
    spark.createDataFrame(
        [
            ("D", "visits", 2, 4, 1, T0, 0.0, "e"),
            ("U", "visits", 1, 1, 1, T0, 9.0, "e"),  # stale seq — must lose
        ],
        SCHEMA,
    ).coalesce(1).write.mode("append").parquet(cl_dir)
    emitted.clear()
    run()
    got2 = {r.key: (r.seq, r.value, r.deleted) for r in emitted}
    assert got2[2] == (4, 0.0, "D")   # delete is terminal, flagged
    assert got2[1] == (2, 5.0, "")    # stale update lost — state kept seq 2


def test_session_window_boundary_semantics(spark):
    """Pins the gap boundary the oracles mirror: an event at EXACTLY
    prev + 30 min merges into the running session; one microsecond-class
    step past it opens a new session (native session_window end = last
    event + gap)."""
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00"),
            (1, "2024-01-01 00:30:00"),  # gap == 1800 s -> merge
            (2, "2024-01-01 00:00:00"),
            (2, "2024-01-01 00:30:01"),  # gap  > 1800 s -> split
        ],
        "k int, ts string",
    ).select("k", F.col("ts").cast("timestamp").alias("ts"))
    out = (
        df.groupBy(F.session_window("ts", "1800 seconds").alias("w"), "k")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("k", "w.start", "w.end", "n")
    )
    rows = {r["k"]: r for r in out.groupBy("k").count().collect()}
    assert rows[1]["count"] == 1 and rows[2]["count"] == 2
    merged = out.filter(F.col("k") == 1).collect()[0]
    assert str(merged["end"]) == "2024-01-01 01:00:00"  # last event + gap


def test_stream_stream_join_multibatch_equals_batch_join(spark, tmp_path):
    """Stream-stream inner join across MULTIPLE micro-batches (one file
    per trigger, event-time-ordered arrival — the binlog-tail shape)
    equals the batch interval join, with watermarks on both sides and
    the time-range condition bounding the join state."""
    t0 = dt.datetime(2024, 3, 1, 12, 0, 0)
    # inserts at minute 0/40/80; updates 5 and 35 min after each insert
    ins_rows = [(k, 100 + k, t0 + dt.timedelta(minutes=40 * k)) for k in range(3)]
    upd_rows = []
    for k, _seq, its in ins_rows:
        upd_rows.append((k, 500 + k, its + dt.timedelta(minutes=5)))    # in window
        upd_rows.append((k, 600 + k, its + dt.timedelta(minutes=35)))   # out of window
    ins = spark.createDataFrame(ins_rows, "key bigint, i_seq bigint, i_ts timestamp")
    upd = spark.createDataFrame(upd_rows, "u_key bigint, u_seq bigint, u_ts timestamp")

    i_dir, u_dir = str(tmp_path / "ins"), str(tmp_path / "upd")
    # 2 files per side => several micro-batches under maxFilesPerTrigger=1
    ins.repartition(2).write.parquet(i_dir)
    upd.repartition(2).write.parquet(u_dir)

    si = (
        spark.readStream.schema("key bigint, i_seq bigint, i_ts timestamp")
        .option("maxFilesPerTrigger", 1).parquet(i_dir)
        .withWatermark("i_ts", "3 hours")
    )
    su = (
        spark.readStream.schema("u_key bigint, u_seq bigint, u_ts timestamp")
        .option("maxFilesPerTrigger", 1).parquet(u_dir)
        .withWatermark("u_ts", "3 hours")
    )
    joined = si.join(
        su,
        F.expr("key = u_key AND u_ts >= i_ts AND u_ts <= i_ts + INTERVAL 30 MINUTES"),
    )
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    q = (
        joined.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {(r["key"], r["u_seq"]) for r in spark.read.parquet(sink).collect()}
    # exactly the in-window update per insert; the 35-min updates excluded
    assert got == {(0, 500), (1, 501), (2, 502)}
