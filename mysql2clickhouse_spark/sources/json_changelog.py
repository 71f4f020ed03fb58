"""JSON-envelope changelog source (Debezium-style CDC ingestion).

The reference consumes decoded binlog events in-process
(/root/reference/matomo2clickhouse.py:490-495). The standard way the
same row-event stream reaches Spark in production is as serialized CDC
envelopes (Debezium wire format: ``op`` c/u/d, ``before``/``after`` row
images, a ``source`` block with file/position): Kafka or object-store
JSON lines. This module is that source adapter — envelope build and
parse as pure column expressions (``to_json`` / ``from_json``), no UDF,
so at 100 TB the parse rides inside the scan stage with whole-stage
codegen and nothing shuffles.

Envelope shape (field names follow Debezium; payload is the engine's
changelog row):

    {"op": "c"|"u"|"d",
     "before": {key, value, event_type} | null,   -- d (and u) carry it
     "after":  {key, value, event_type} | null,   -- c and u carry it
     "source": {"db": ..., "table": ..., "file_seq": ..., "pos": ...},
     "ts_us": <event-time in microseconds>}       -- lossless timestamp

``ts_us`` (not Debezium's ``ts_ms``) keeps microsecond precision so the
round-trip is bit-exact — which is what makes the adapter
oracle-checkable end-to-end (``cdc_json_roundtrip``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: payload struct carried in before/after images
_IMAGE = "struct<key: bigint, value: double, event_type: string>"

ENVELOPE_SCHEMA = (
    "struct<"
    "op: string, "
    f"before: {_IMAGE}, "
    f"after: {_IMAGE}, "
    "source: struct<db: string, table: string, file_seq: bigint, pos: bigint>, "
    "ts_us: bigint"
    ">"
)

_OP_TO_WIRE = {"I": "c", "U": "u", "D": "d"}


def _image(present: Column) -> Column:
    return F.when(
        present,
        F.struct(
            F.col("key").alias("key"),
            F.col("value").alias("value"),
            F.col("event_type").alias("event_type"),
        ),
    )


def changelog_to_json(cl: DataFrame, out_col: str = "envelope") -> DataFrame:
    """Serialize a changelog frame into one JSON envelope string per
    event. Inserts carry ``after`` only, deletes ``before`` only,
    updates both (binlog_row_image=full, reference README.md:56).

    ``ignoreNullFields=false`` keeps the absent image as an explicit
    ``null`` (Debezium does the same), so the parse side can
    distinguish "no image" from "image of an all-null row"."""
    is_i = F.col("op") == "I"
    is_d = F.col("op") == "D"
    env = F.struct(
        F.when(is_i, F.lit("c")).when(is_d, F.lit("d")).otherwise(F.lit("u")).alias("op"),
        _image(~is_i).alias("before"),
        _image(~is_d).alias("after"),
        F.struct(
            F.col("schema_name").alias("db"),
            F.col("table_name").alias("table"),
            F.col("file_seq").alias("file_seq"),
            F.col("seq").alias("pos"),
        ).alias("source"),
        F.unix_micros(F.col("ts")).alias("ts_us"),
    )
    return cl.withColumn(
        out_col, F.to_json(env, {"ignoreNullFields": "false"})
    )


def changelog_from_json(df: DataFrame, json_col: str = "envelope") -> DataFrame:
    """Parse JSON envelopes back into the engine's changelog shape
    (same columns as ``sources.changelog.changelog_from_events``).

    The row image is ``after`` for c/u and ``before`` for d — the same
    precedence every CDC apply uses (the after-image is what lands,
    the delete's before-image is what's matched). Corrupt/unparseable
    envelopes surface as all-null rows (from_json PERMISSIVE mode) and
    are the caller's poison-quarantine concern (B3), not a crash."""
    e = F.from_json(F.col(json_col), ENVELOPE_SCHEMA)
    img = F.when(e["op"] == "d", e["before"]).otherwise(e["after"])
    return df.select(
        # Unmapped wire ops (e.g. Debezium snapshot-read "r") pass through
        # verbatim so split_poison tags them unknown_op instead of a NULL
        # op silently skating past the quarantine into the apply.
        F.when(e["op"] == "c", F.lit("I"))
        .when(e["op"] == "d", F.lit("D"))
        .when(e["op"] == "u", F.lit("U"))
        .otherwise(e["op"])
        .alias("op"),
        e["source"]["db"].alias("schema_name"),
        e["source"]["table"].alias("table_name"),
        img["key"].alias("key"),
        e["source"]["pos"].alias("seq"),
        e["source"]["file_seq"].alias("file_seq"),
        F.timestamp_micros(e["ts_us"]).alias("ts"),
        img["value"].alias("value"),
        img["event_type"].alias("event_type"),
    )
