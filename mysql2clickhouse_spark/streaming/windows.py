"""Streaming windowed aggregation + custom stateful operators
(SURVEY §2.7 — the capabilities the reference delegates to "binlog is
totally ordered" + its hourly dedup contract, generalized to real
event-time streams).

- ``windowed_event_counts``: watermarked tumbling-window counts — the
  streaming twin of Q8's per-day volume profile, tolerant of late data
  up to the watermark (doc_old_duplicates.md:179-185's "correct as of
  now-2h" freshness contract, made explicit).
- ``stateful_latest_state``: per-key latest-row state maintained with
  ``applyInPandasWithState`` — the streaming form of Q1/cdc_latest_state
  for consumers that need the current row continuously rather than
  dedup-at-read. State is one row per key; a processing-time timeout
  expires idle keys so state is bounded by the active key set.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def windowed_event_counts(
    stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling-window per-table counts with a late-data watermark.

    Append output mode: a window finalizes (and becomes immutable) once
    the watermark passes its end — the declarative version of the
    reference's "data older than now-2h is duplicate-free/final"
    contract. Works identically on a batch frame (window + groupBy)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"), "table_name")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "table_name",
            "cnt",
        )
    )


STATE_SCHEMA = StructType(
    [
        StructField("seq", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
        StructField("event_type", StringType()),
        StructField("deleted", StringType()),
    ]
)

LATEST_OUTPUT_SCHEMA = StructType(
    [
        StructField("key", LongType()),
        StructField("seq", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
        StructField("event_type", StringType()),
        StructField("deleted", StringType()),
    ]
)


def _make_latest_state_fn(idle_ttl_ms: int | None):
    def latest_state_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """Fold this micro-batch's events for one key into the stored
        latest-row state: highest seq wins; DELETE is a terminal marker
        that stays in state (so a late lower-seq UPDATE can't resurrect
        the row) but is emitted flagged."""
        if state.hasTimedOut:
            state.remove()
            return
        best = state.get if state.exists else None  # (seq, ts, value, event_type, deleted)
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            # vectorized fold: only the chunk's max-seq row can win
            row = pdf.loc[pdf["seq"].idxmax()]
            if best is None or int(row["seq"]) > best[0]:
                ts = row["ts"]
                best = (
                    int(row["seq"]),
                    ts.to_pydatetime() if hasattr(ts, "to_pydatetime") else ts,
                    float(row["value"]),
                    str(row["event_type"]),
                    "D" if row["op"] == "D" else "",
                )
        if best is not None:
            state.update(best)
            if idle_ttl_ms is not None:
                state.setTimeoutDuration(idle_ttl_ms)
            yield pd.DataFrame(
                {
                    "key": [key[0]],
                    "seq": [best[0]],
                    "ts": [best[1]],
                    "value": [best[2]],
                    "event_type": [best[3]],
                    "deleted": [best[4]],
                }
            )

    return latest_state_fn


def stateful_latest_state(
    changelog_stream: DataFrame, idle_ttl_ms: int | None = None
) -> DataFrame:
    """Continuous per-key latest state over a changelog stream.

    ``applyInPandasWithState`` shuffles each micro-batch by key once and
    keeps one state row per key in the state store — at scale, state
    size tracks the live key population, not the stream length. Update
    output mode: every micro-batch emits the keys it touched.

    ``idle_ttl_ms`` bounds state further by expiring idle keys — use it
    ONLY with continuous (processingTime) triggers: a registered
    processing-time timeout makes an ``availableNow`` query keep
    scheduling micro-batches to service timeouts, so a bounded catch-up
    run never terminates (observed: 450+ empty epochs)."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return changelog_stream.groupBy("key").applyInPandasWithState(
        _make_latest_state_fn(idle_ttl_ms),
        outputStructType=LATEST_OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
