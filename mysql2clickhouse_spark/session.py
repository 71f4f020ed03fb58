"""SparkSession factory tuned for the engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default ``local[*]``),
but every setting below is chosen for cluster scale:

- AQE on (runtime re-plan: coalesced shuffle partitions, skew-join split)
- broadcast threshold generous enough that the star-schema dims
  (region/nation/customer-like tables) broadcast instead of shuffling
- Arrow enabled for the few pandas-interop paths (similarity extensions)
- shuffle partitions sized for the test box; on a real cluster this is
  overridden per-job or left to AQE's coalescing
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "mysql2clickhouse-spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # the driver's events.parquet stores TIMESTAMP(NANOS); Spark reads
        # them as long (we convert to micros in sources.tables)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # local mode: executors share the driver JVM, so the driver heap
        # IS the cluster memory — size it for 32 concurrent task threads
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
    )
    warehouse = os.environ.get("SPARK_GRAFT_WAREHOUSE")
    if warehouse:  # static conf: only honored at session creation
        builder = builder.config("spark.sql.warehouse.dir", warehouse)
    return builder.getOrCreate()
