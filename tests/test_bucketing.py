"""Bucketed co-located joins (O11): the big-big join strategy at scale.

`lineitem ⋈ orders` on the order key is the one join in the corpus that
cannot broadcast at 100 TB. Bucketing both sides on the join key removes
the shuffle entirely — these tests pin that: the bucketed join plan must
contain NO Exchange, while the plain-parquet join of the same data must
contain shuffles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mysql2clickhouse_spark.sources.tables import load_table, write_bucketed


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    # warehouse dir is pinned to a tmp location by conftest (static conf)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    write_bucketed(li, "li_b", ["l_orderkey"], num_buckets=8)
    write_bucketed(o, "o_b", ["o_orderkey"], num_buckets=8)
    return spark.table("li_b"), spark.table("o_b")


def _plan(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    li_b, o_b = bucketed
    # disable broadcast so the join strategy itself is under test
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = li_b.join(o_b, li_b.l_orderkey == o_b.o_orderkey)
        plan = _plan(spark, j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: bucket layout reused
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")


def test_unbucketed_join_shuffles_both_sides(spark, sf_dir):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
        o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
        plan = _plan(spark, li.join(o, li.l_orderkey == o.o_orderkey))
        assert plan.count("Exchange") >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")


def test_bucketed_join_results_match_plain(spark, sf_dir, bucketed):
    li_b, o_b = bucketed
    got = (
        li_b.join(o_b, li_b.l_orderkey == o_b.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    want = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert {(r.o_orderstatus, r.n) for r in got} == {(r.o_orderstatus, r.n) for r in want}
