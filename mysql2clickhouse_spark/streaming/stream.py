"""Structured Streaming wrapper — the ``--stop-never`` mode of the
reference (binlog2sql_util.py:125-126; blocking stream
matomo2clickhouse.py:493,511).

``readStream`` over a changelog parquet directory → ``foreachBatch``
reusing the exact same batch-apply logic as the cron-run path
(``ReplicationRunner``), with Spark's checkpointLocation giving offset
tracking on top of our queryable ledger (the reference deliberately
keeps offsets SQL-visible — README.md:16-18 — so we keep both).

``availableNow`` trigger = one bounded catch-up run (the reference's
hourly cron semantics, B4); ``processingTime`` = continuous tailing.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .runner import ReplicationRunner, RunConfig


def run_streaming_replication(
    spark: SparkSession,
    changelog_dir: str,
    target_dir: str,
    changelog_schema: str,
    available_now: bool = True,
    processing_interval: str = "10 seconds",
    max_files_per_trigger: int = 20,
):
    """Stream the changelog directory into managed tables.

    ``maxFilesPerTrigger`` is the streaming twin of the reference's
    20-binlog-files-per-session clamp (O3). Each micro-batch runs the
    same two-phase apply as a batch run; exactly-once file tracking from
    the checkpoint + our at-least-once ledger + dedup-at-read together
    reproduce the reference's delivery contract (SURVEY §2.7).

    ``available_now=True`` (the hourly-cron semantics) BLOCKS until the
    bounded catch-up completes. ``available_now=False`` is the
    ``--stop-never`` continuous mode (binlog2sql_util.py:125-126,
    blocking stream matomo2clickhouse.py:493,511): the query keeps
    tailing the directory on ``processing_interval``; the RUNNING
    StreamingQuery is returned and the caller owns its lifecycle
    (``awaitTermination()`` for reference-faithful run-forever,
    ``stop()`` for a controlled shutdown).
    """
    runner = ReplicationRunner(spark, RunConfig(target_dir=target_dir))

    stream = (
        spark.readStream.schema(changelog_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(changelog_dir)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # inside foreachBatch the frame is bounded — same code path as
        # the cron run, minus the resume slice (the checkpoint does it)
        runner.run_once(batch_df)

    writer = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", os.path.join(target_dir, "_checkpoint"))
        .outputMode("update")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.trigger(processingTime=processing_interval).start()
