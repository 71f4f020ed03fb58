"""Salted-join equivalence: identical results to the plain join on a
skewed fixture, for every supported join type; the salt must spread a
hot key across multiple sub-keys."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mysql2clickhouse_spark.operators.skew import hot_keys, salted_join


@pytest.fixture(scope="module")
def skewed_pair(spark):
    # key 1 is pathologically hot (80% of rows); payload varies per row
    left = spark.createDataFrame(
        [(1 if i % 5 else i % 97, i, float(i)) for i in range(5000)],
        "k bigint, seq bigint, payload double",
    )
    right = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(0, 97)], "k bigint, attr string"
    )
    return left, right


@pytest.mark.parametrize("how", ["inner", "left", "left_semi", "left_anti"])
def test_salted_join_equals_plain_join(spark, skewed_pair, how):
    left, right = skewed_pair
    # left_anti needs some truly unmatched keys: drop half the dim
    r = right.filter(F.col("k") % 2 == 0) if how == "left_anti" else right
    plain = left.join(r, ["k"], how)
    salted = salted_join(left, r, ["k"], n_salts=8, how=how)
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salt_actually_spreads_the_hot_key(spark, skewed_pair):
    left, _ = skewed_pair
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(8))
    n_subkeys = (
        left.filter(F.col("k") == 1)
        .select(salt.alias("s"))
        .distinct()
        .count()
    )
    assert n_subkeys == 8  # the hot key occupies every salt bucket


def test_salt_is_deterministic_across_recomputation(spark, skewed_pair):
    left, _ = skewed_pair
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(8))
    a = left.select("seq", salt.alias("s"))
    b = left.select("seq", salt.alias("s"))  # fresh lineage, same rows
    assert a.exceptAll(b).count() == 0


def test_unsupported_join_types_refused(spark, skewed_pair):
    left, right = skewed_pair
    with pytest.raises(ValueError):
        salted_join(left, right, ["k"], how="right")


def test_hot_keys_profile(spark, skewed_pair):
    left, _ = skewed_pair
    hot = hot_keys(left, ["k"], min_rows=1000).collect()
    assert [r["k"] for r in hot] == [1]
    # 4000 rows with i%5!=0, plus the i%5==0 rows where i%97 == 1
    assert hot[0]["n_rows"] == 4010


# --- CDC apply path under planted Zipf skew ---------------------------------
#
# The reference's hot tables are visit/action logs where one site (key)
# can be 30% of a batch. The apply path must stay balanced: the
# insert-as-update rewrite is shuffle-free, and the argmax merge fold
# combines map-side so a hot key never concentrates in one task. A
# window replay, by contrast, funnels every version of the hot key into
# ONE task — and AQE cannot split a window partition.


@pytest.fixture(scope="module")
def skewed_changelog(spark):
    """20k-row batch: key 7 carries 30% of it; ops mix I/U/D with a
    globally unique seq (binlog-position semantics)."""
    n, hot = 20_000, 6_000
    rows = []
    for i in range(n):
        key = 7 if i < hot else (i % 997) + 100
        op = "D" if i % 31 == 0 else ("U" if i % 3 == 0 else "I")
        rows.append((op, key, i, f"payload-{i}"))
    return spark.createDataFrame(rows, "op string, key bigint, seq bigint, v string")


def _task_ratio(per_task_rows: list[int]) -> float:
    return max(per_task_rows) / (sum(per_task_rows) / len(per_task_rows))


def test_apply_insert_as_update_is_shuffle_free(spark, skewed_changelog):
    from mysql2clickhouse_spark.operators.apply import apply_insert_as_update

    df = apply_insert_as_update(skewed_changelog, ["key"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # skew cannot exist without a shuffle


def test_argmax_fold_bounds_hot_key_shuffle_volume(spark, skewed_changelog):
    """Map-side-combine contract: under the argmax fold the hot key
    ships at most ONE partial struct per input partition through the
    exchange — not its 6,000 raw versions."""
    from mysql2clickhouse_spark.operators.apply import apply_insert_as_update

    versions = apply_insert_as_update(skewed_changelog, ["key"])
    n_input_parts = (
        versions.select(F.spark_partition_id().alias("p")).distinct().count()
    )
    # one row per (mapper, key) = exactly what the partial aggregate
    # emits into the shuffle
    hot_partials = (
        versions.groupBy(F.spark_partition_id().alias("p"), "key")
        .count()
        .filter(F.col("key") == 7)
        .count()
    )
    assert hot_partials <= n_input_parts          # ≤ 1 per mapper
    assert hot_partials < 100                     # vs 6000 raw versions


def test_argmax_reduce_tasks_stay_balanced_window_tasks_do_not(spark, skewed_changelog):
    """Task-size-ratio assertion. Keys route to reduce tasks by
    pmod(murmur3(key), numPartitions) — the same function
    HashPartitioning applies — so the per-task input row counts of both
    plans are computable exactly: the argmax plan's reduce input is the
    per-(mapper, key) partials, the window plan's is every raw row of
    each key. With 30% of the batch on one key, the window plan's
    hottest task must be ≥5× the mean while the argmax plan stays
    within 3×."""
    from mysql2clickhouse_spark.operators.apply import apply_insert_as_update

    n_tasks = 32
    versions = apply_insert_as_update(skewed_changelog, ["key"])
    bucket = F.pmod(F.hash("key"), F.lit(n_tasks)).alias("task")

    argmax_in = (
        versions.groupBy(F.spark_partition_id().alias("p"), "key").count()
        .groupBy(bucket).agg(F.count(F.lit(1)).alias("rows"))
    )
    window_in = versions.groupBy(bucket).agg(F.count(F.lit(1)).alias("rows"))
    argmax_ratio = _task_ratio([r.rows for r in argmax_in.collect()])
    window_ratio = _task_ratio([r.rows for r in window_in.collect()])
    assert argmax_ratio < 3.0, argmax_ratio
    assert window_ratio > 5.0, window_ratio   # the hazard being avoided
    assert window_ratio > 2 * argmax_ratio


def test_argmax_merge_fold_equals_window_replay(spark, skewed_changelog):
    """The runner's skew-immune form is a drop-in: identical rows to
    the faithful window replay whenever seq is unique per key (binlog
    positions are globally unique), for both the merge fold and the
    latest-per-key view."""
    from mysql2clickhouse_spark.operators.apply import (
        apply_insert_as_update,
        apply_mutate,
        latest_by_key,
    )

    win = apply_mutate(skewed_changelog, ["key"], form="window")
    arg = apply_mutate(skewed_changelog, ["key"], form="argmax")
    assert win.columns == arg.columns
    assert win.exceptAll(arg).count() == 0
    assert arg.exceptAll(win).count() == 0

    versions = apply_insert_as_update(skewed_changelog, ["key"])
    lw = latest_by_key(versions, ["key"], form="window")
    la = latest_by_key(versions, ["key"], form="argmax").select(*lw.columns)
    assert lw.exceptAll(la).count() == 0
    assert la.exceptAll(lw).count() == 0
