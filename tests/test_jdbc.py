"""JDBC source/sink (S3/S4) — EXECUTED against embedded Derby (the
JDBC engine Spark bundles for its Hive metastore), plus wiring checks
for the MySQL/ClickHouse URLs used at deploy time.

Derby-embedded runs inside the test JVM, so the round-trips exercise
the real JDBC write path (batched INSERTs) and read path (including
range-partitioned parallel scans) end-to-end."""

from __future__ import annotations

import pytest

from mysql2clickhouse_spark.sources.jdbc import jdbc_read, jdbc_write

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture()
def derby_url(tmp_path):
    return f"jdbc:derby:{tmp_path}/derbydb;create=true"


def test_jdbc_write_read_roundtrip(spark, derby_url):
    """S4 batched write → S3 read: values and schema survive."""
    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    jdbc_write(df, derby_url, "t1", mode="overwrite", driver=DERBY_DRIVER).save()
    back = jdbc_read(spark, derby_url, "t1", driver=DERBY_DRIVER).load()
    assert back.count() == 100
    assert back.agg({"v": "sum"}).collect()[0][0] == 9900


def test_jdbc_partitioned_read_splits_scan(spark, derby_url):
    """S3 parallel read: a numeric partition column + bounds splits the
    scan into range queries — the reference is single-threaded, the
    engine needn't be."""
    df = spark.range(100).selectExpr("id", "id % 7 AS m")
    jdbc_write(df, derby_url, "t2", mode="overwrite", driver=DERBY_DRIVER).save()
    p = jdbc_read(
        spark, derby_url, "t2",
        partition_column="id", lower_bound=0, upper_bound=100, num_partitions=4,
        driver=DERBY_DRIVER,
    ).load()
    assert p.rdd.getNumPartitions() == 4
    assert p.count() == 100


def test_jdbc_append_accumulates(spark, derby_url):
    """S4 append mode — the CDC sink semantics (each micro-batch
    appends; at-least-once duplicates are the dedup-at-read contract's
    concern, not the sink's)."""
    df = spark.range(10).withColumnRenamed("id", "k")
    jdbc_write(df, derby_url, "t3", mode="overwrite", driver=DERBY_DRIVER).save()
    jdbc_write(df, derby_url, "t3", mode="append", driver=DERBY_DRIVER).save()
    back = jdbc_read(spark, derby_url, "t3", driver=DERBY_DRIVER).load()
    assert back.count() == 20


def test_jdbc_pushdown_reaches_remote_query(spark, derby_url):
    """Catalyst pushes filters through the JDBC source: the remote scan
    carries the predicate (PushedFilters), it is not a post-scan
    Spark-side filter over a full-table read."""
    df = spark.range(1000).selectExpr("id", "id % 10 AS bucket")
    jdbc_write(df, derby_url, "t4", mode="overwrite", driver=DERBY_DRIVER).save()
    q = (
        jdbc_read(spark, derby_url, "t4", driver=DERBY_DRIVER)
        .load()
        .filter("bucket = 3")
        .select("id")
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "BUCKET" in plan.upper()
    assert q.count() == 100


def test_jdbc_read_reaches_driver_resolution(spark):
    """Deploy-time wiring: a MySQL URL with no driver jar must fail at
    driver resolution (options validated, plan built), not earlier."""
    reader = jdbc_read(
        spark,
        "jdbc:mysql://example.invalid:3306/db",
        "(SELECT 1) q",
        partition_column="id",
        lower_bound=0,
        upper_bound=100,
        num_partitions=4,
    )
    with pytest.raises(Exception, match="(?i)driver|connect"):
        reader.load()


def test_jdbc_write_reaches_driver_resolution(spark):
    df = spark.range(10).withColumnRenamed("id", "k")
    writer = jdbc_write(df, "jdbc:mysql://example.invalid:3306/db", "t", batch_size=2000)
    with pytest.raises(Exception, match="(?i)driver|connect"):
        writer.save()
