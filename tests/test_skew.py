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
