"""Changelog (CDC event stream) source.

The reference's source is a MySQL row-based binlog stream
(``BinLogStreamReader``, /root/reference/matomo2clickhouse.py:490-495)
yielding Write/Update/DeleteRows events, totally ordered by
``(log_file, log_pos)``. Here the changelog is a DataFrame with the shape
of FIXTURES.md §F1:

    op          STRING    -- 'I' | 'U' | 'D'
    schema_name STRING    -- source database (F2 only_schemas analog)
    key         BIGINT    -- business key of the changed row
    seq       BIGINT    -- total order (binlog position analog)
    file_seq  BIGINT    -- binlog *file* analog (seq div 1000)
    ts        TIMESTAMP -- event time
    value     DOUBLE    -- payload column
    event_type STRING   -- raw source event label

The driver's ``events`` table plays the role of the decoded binlog; the
adapter below is the deterministic mapping used by BOTH the Spark plans
and the DuckDB oracle SQL (kept textually in ``CHANGELOG_VIEW_SQL`` so the
two sides can never drift).

Mapping: signup/view => 'I' (WriteRowsEvent), click/purchase => 'U'
(UpdateRowsEvent), error => 'D' (DeleteRowsEvent); ``event_id`` is the
total order (log_pos analog); ``user_id`` is the business key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: ANSI SQL body of the changelog adapter — referenced verbatim by the
#: oracle queries (DuckDB) via `FROM ({CHANGELOG_VIEW_SQL}) c`.
CHANGELOG_VIEW_SQL = """
SELECT
    CASE WHEN event_type IN ('signup', 'view') THEN 'I'
         WHEN event_type IN ('click', 'purchase') THEN 'U'
         ELSE 'D' END AS op,
    CASE WHEN user_id % 5 = 4 THEN 'matomo_archive'
         ELSE 'matomo' END AS schema_name,
    CASE WHEN user_id % 3 = 0 THEN 'visits'
         WHEN user_id % 3 = 1 THEN 'actions'
         ELSE 'conversions' END AS table_name,
    user_id AS key,
    event_id AS seq,
    CAST(FLOOR(event_id / 1000) AS BIGINT) AS file_seq,
    CAST(ts AS TIMESTAMP) AS ts,
    value,
    event_type
FROM events
"""


def changelog_from_events(events: DataFrame) -> DataFrame:
    """DataFrame twin of ``CHANGELOG_VIEW_SQL``.

    Stays fully in native column expressions (whole-stage codegen); the
    CASE and arithmetic are evaluated JVM-side during the parquet scan, so
    the adapter adds no extra stage or shuffle.
    """
    return events.select(
        F.when(F.col("event_type").isin("signup", "view"), F.lit("I"))
        .when(F.col("event_type").isin("click", "purchase"), F.lit("U"))
        .otherwise(F.lit("D"))
        .alias("op"),
        # F2 source-database dimension (only_schemas,
        # matomo2clickhouse.py:492): a second schema holds 1/5 of traffic
        F.when(F.col("user_id") % 5 == 4, F.lit("matomo_archive"))
        .otherwise(F.lit("matomo"))
        .alias("schema_name"),
        F.when(F.col("user_id") % 3 == 0, F.lit("visits"))
        .when(F.col("user_id") % 3 == 1, F.lit("actions"))
        .otherwise(F.lit("conversions"))
        .alias("table_name"),
        F.col("user_id").alias("key"),
        F.col("event_id").alias("seq"),
        F.floor(F.col("event_id") / 1000).cast("bigint").alias("file_seq"),
        F.col("ts"),
        F.col("value"),
        F.col("event_type"),
    )
