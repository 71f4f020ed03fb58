"""Apply-mode semantics on a hand-built changelog fixture exercising the
reference's hard cases (FIXTURES.md §F1): interleaved I/U/D with
insert-then-immediate-update ties, NULLs in match columns, quotes and
control chars in strings, old deletes."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from mysql2clickhouse_spark.operators.apply import (
    apply_append,
    apply_insert_as_update,
    apply_mutate,
    delete_full_row_antijoin,
    latest_by_key,
    merge_upsert,
    with_dateid,
)
from mysql2clickhouse_spark.operators.filters import split_old_deletes, with_txn_start

TS = dt.datetime(2024, 3, 1, 12, 0, 0)
OLD = dt.datetime(2024, 1, 1, 12, 0, 0)

CHANGELOG_ROWS = [
    # (op, key, seq, ts, value)
    ("I", 1, 1, TS, "a'quote"),          # quote in payload (P1 path)
    ("U", 1, 2, TS, "a2\nnewline"),      # insert-then-immediate-update tie + control char
    ("I", 2, 3, TS, None),               # NULL payload (P3 null-safe)
    ("U", 2, 4, TS, "b2"),
    ("D", 2, 5, TS, None),               # delete after update
    ("I", 3, 6, OLD, "c"),
    ("D", 3, 7, OLD, None),              # old delete (F6 horizon)
    ("I", 4, 8, TS, "d\tattab"),
]

SCHEMA = "op string, key bigint, seq bigint, ts timestamp, value string"


@pytest.fixture(scope="module")
def changelog(spark):
    return spark.createDataFrame(CHANGELOG_ROWS, SCHEMA)


def test_apply_append_only_inserts(changelog):
    got = apply_append(changelog).select("key", "seq").collect()
    assert sorted((r.key, r.seq) for r in got) == [(1, 1), (2, 3), (3, 6), (4, 8)]


def test_ins_upd_versions_and_latest(changelog):
    versions = apply_insert_as_update(changelog, ["key"])
    # inserts + updates, never deletes
    assert versions.count() == 6
    latest = latest_by_key(versions, ["key"], "dateid", form="window")
    got = {r.key: (r.dateid, r.value) for r in latest.collect()}
    # the same-batch insert+update tie resolves by changelog position:
    # key 1 must show the UPDATE's after-image (the reference's tie bug
    # fix, matomo2clickhouse.py:34-36)
    assert got[1] == (2, "a2\nnewline")
    assert got[2] == (4, "b2")   # versioned store ignores the delete
    assert got[4][1] == "d\tattab"


def test_latest_forms_agree_on_unique_versions(changelog):
    versions = apply_insert_as_update(changelog, ["key"])
    w = latest_by_key(versions, ["key"], "dateid", form="window")
    j = latest_by_key(versions, ["key"], "dateid", form="join")
    r = latest_by_key(versions, ["key"], "dateid", form="rank")
    s = latest_by_key(versions, ["key"], "dateid", form="semi")
    cols = ["key", "dateid", "value"]
    assert sorted(map(tuple, w.select(cols).collect())) == sorted(
        map(tuple, j.select(cols).collect())
    ) == sorted(map(tuple, r.select(cols).collect())) == sorted(
        map(tuple, s.select(cols).collect())
    )


def test_latest_semi_keeps_ties_like_join(spark):
    """The r11 semi form must reproduce the join form's tie semantics:
    every row tied at max(version) survives, as one row each."""
    rows = [(1, 5, "a"), (1, 5, "b"), (1, 3, "c"), (2, 1, "d")]
    df = spark.createDataFrame(rows, ["key", "dateid", "value"])
    j = latest_by_key(df, ["key"], "dateid", form="join")
    s = latest_by_key(df, ["key"], "dateid", form="semi")
    cols = ["key", "dateid", "value"]
    assert sorted(map(tuple, j.select(cols).collect())) == sorted(
        map(tuple, s.select(cols).collect())
    ) == [(1, 5, "a"), (1, 5, "b"), (2, 1, "d")]


def test_apply_mutate_terminal_state(changelog):
    state = apply_mutate(changelog, ["key"])
    got = {r.key: r.value for r in state.collect()}
    assert set(got) == {1, 4}          # 2 and 3 end deleted
    assert got[1] == "a2\nnewline"


def test_mutate_equals_serial_application(spark, changelog):
    """Serial-equivalence (FIXTURES.md invariant 4): replaying the
    changelog one event at a time equals the single-window fold."""
    rows = sorted(CHANGELOG_ROWS, key=lambda r: r[2])
    state: dict = {}
    for op, key, seq, ts, value in rows:
        if op == "D":
            state.pop(key, None)
        else:
            state[key] = (seq, ts, value)
    expected = sorted((k, v[0], v[2]) for k, v in state.items())
    got = sorted(
        (r.key, r.seq, r.value)
        for r in apply_mutate(changelog, ["key"]).select("key", "seq", "value").collect()
    )
    assert got == expected


def test_split_old_deletes(changelog):
    kept, rejected = split_old_deletes(
        changelog, date_col="ts", now_col=F.lit(TS), days=31
    )
    rej = [(r.key, r.seq) for r in rejected.collect()]
    assert rej == [(3, 7)]                      # only the old delete
    assert kept.count() == changelog.count() - 1


def test_merge_upsert_null_safe(spark):
    target = spark.createDataFrame(
        [(1, "x"), (2, None), (3, "z")], "key bigint, value string"
    )
    updates = spark.createDataFrame([(2, "fixed"), (9, "new")], "key bigint, value string")
    got = {r.key: r.value for r in merge_upsert(target, updates, ["key"]).collect()}
    assert got == {1: "x", 2: "fixed", 3: "z", 9: "new"}


def test_delete_full_row_antijoin_null_safe(spark):
    target = spark.createDataFrame(
        [(1, "x"), (2, None), (3, "z")], "key bigint, value string"
    )
    # full-row image with NULL must match via eqNullSafe (P3)
    deletes = spark.createDataFrame([(2, None)], "key bigint, value string")
    got = sorted(r.key for r in delete_full_row_antijoin(target, deletes).collect())
    assert got == [1, 3]


def test_with_dateid_strictly_increasing_per_key(changelog):
    v = with_dateid(changelog.filter(F.col("op") != "D"), ["key"])
    rows = v.select("key", "seq", "dateid").collect()
    by_key: dict = {}
    for r in rows:
        by_key.setdefault(r.key, []).append((r.seq, r.dateid))
    for pairs in by_key.values():
        pairs.sort()
        dids = [d for _, d in pairs]
        assert dids == sorted(set(dids)), "dateid must strictly increase per key"


def test_txn_attribution_carries_last_marker(spark):
    df = spark.createDataFrame(
        [(1, "B", 0), (2, "x", 0), (3, "x", 0), (4, "B", 1), (5, "x", 1)],
        "seq bigint, kind string, file_seq bigint",
    )
    out = with_txn_start(df, marker=F.col("kind") == "B")
    got = {r.seq: r.txn_start_pos for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4}


def test_txn_attribution_requires_partition_column(spark):
    """No silent single-partition global window: a frame without the
    binlog file column must fail fast, not degrade to the one plan
    shape that can't survive a 100 TB backfill."""
    import pytest

    df = spark.createDataFrame([(1, "B")], "seq bigint, kind string")
    with pytest.raises(ValueError, match="file_seq"):
        with_txn_start(df, marker=F.col("kind") == "B")


def test_normalize_values_set_and_binary(spark):
    """P2 fix_object semantics: set->CSV (order-preserving), bytes->hex
    (uppercase), NULLs pass through untouched, empty set -> ''."""
    from mysql2clickhouse_spark.operators.project import normalize_values

    df = spark.createDataFrame(
        [
            (1, ["a", "b", "c"], bytearray(b"MySQL")),
            (2, [], bytearray(b"")),
            (3, None, None),
        ],
        "key bigint, tags array<string>, payload binary",
    )
    out = normalize_values(df, set_cols=["tags"], bin_cols=["payload"])
    got = {r.key: (r.tags, r.payload) for r in out.collect()}
    assert got[1] == ("a,b,c", "4D7953514C")
    assert got[2] == ("", "")
    assert got[3] == (None, None)
    # pure projection: no shuffle, no Python in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_table_profile_null_and_type_channels(spark):
    from mysql2clickhouse_spark.plans.corpus import table_profile

    df = spark.createDataFrame(
        [(1, None, "b"), (2, 2.5, None), (2, 7.5, "a")],
        "k bigint, v double, s string",
    )
    prof = {r["column"]: r for r in table_profile(df).collect()}
    assert prof["k"]["n_rows"] == 3 and prof["k"]["n_nulls"] == 0
    assert prof["k"]["n_distinct"] == 2          # distinct excludes dups
    assert prof["v"]["n_nulls"] == 1 and prof["v"]["n_distinct"] == 2
    assert prof["v"]["min_num"] == 2.5 and prof["v"]["max_num"] == 7.5
    assert prof["v"]["min_str"] is None          # numeric -> num channel only
    assert prof["s"]["min_str"] == "a" and prof["s"]["max_str"] == "b"
    assert prof["s"]["min_num"] is None          # string -> str channel only
