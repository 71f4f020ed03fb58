"""JSON-envelope changelog source: image precedence, losslessness,
and corrupt-envelope behavior (B3 feed)."""

from __future__ import annotations

import datetime as dt
import json

from pyspark.sql import functions as F

from mysql2clickhouse_spark.sources.json_changelog import (
    changelog_from_json,
    changelog_to_json,
)

SCHEMA = (
    "op string, schema_name string, table_name string, key bigint, seq bigint,"
    " file_seq bigint, ts timestamp, value double, event_type string"
)
TS = dt.datetime(2024, 3, 1, 12, 30, 45, 123456)  # microsecond precision


def _cl(spark):
    rows = [
        ("I", "matomo", "visits", 1, 10, 0, TS, 1.5, "signup"),
        ("U", "matomo", "visits", 1, 11, 0, TS, 2.5, "click"),
        ("D", "matomo_archive", "actions", 2, 12, 0, TS, 0.25, "error"),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_roundtrip_exact(spark):
    cl = _cl(spark)
    back = changelog_from_json(changelog_to_json(cl).select("envelope"))
    assert back.schema == cl.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, cl.collect()))


def test_envelope_image_precedence(spark):
    """Inserts carry after only, deletes before only, updates both."""
    envs = [
        json.loads(r.envelope)
        for r in changelog_to_json(_cl(spark)).orderBy("seq").collect()
    ]
    ins, upd, dele = envs
    assert ins["op"] == "c" and ins["before"] is None and ins["after"]["key"] == 1
    assert upd["op"] == "u" and upd["before"] is not None and upd["after"]["value"] == 2.5
    assert dele["op"] == "d" and dele["after"] is None and dele["before"]["key"] == 2
    assert ins["source"]["table"] == "visits" and dele["source"]["db"] == "matomo_archive"
    # lossless event time: microseconds preserved
    assert ins["ts_us"] % 1_000_000 == 123456


def test_corrupt_envelope_becomes_null_row_for_quarantine(spark):
    """PERMISSIVE parse: garbage JSON surfaces as an all-null changelog
    row (null seq/key/table), which split_poison diverts to the rejects
    table — corrupt input is quarantined, never a crash."""
    from mysql2clickhouse_spark.operators.filters import split_poison

    good = changelog_to_json(_cl(spark)).select("envelope")
    bad = spark.createDataFrame([("{not json",), ('{"op":"x"}',)], "envelope string")
    parsed = changelog_from_json(good.unionByName(bad))
    ok, rejected = split_poison(parsed, ["key"])
    assert ok.count() == 3
    assert rejected.count() == 2
    reasons = {r.reject_reason for r in rejected.collect()}
    assert reasons  # poison reason attributed, rows preserved
