"""JDBC wrapper wiring (S3/S4): no driver jars ship here, so assert the
wrappers build real JDBC plans — resolution must reach the JDBC layer
and fail with the driver-missing error, not an option/validation one."""

from __future__ import annotations

import pytest

from mysql2clickhouse_spark.sources.jdbc import jdbc_read, jdbc_write


def test_jdbc_read_reaches_driver_resolution(spark):
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
