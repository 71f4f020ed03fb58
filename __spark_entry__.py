"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (Q10 regional revenue: the fact
stream joined through the dimension chain, broadcast dims, decimal-exact
aggregation) on sf0.001.

``queries()`` / ``oracle_sql()`` — every implemented operator from
SURVEY.md §2 plus the LLM-pipeline extensions, each as a
(spark, sf_dir) -> DataFrame callable with a DuckDB-runnable ANSI-SQL
oracle where the semantics are SQL-expressible. Hash-family ops
(minhash/simhash/LSH-ANN) are rows-only by design — their hash functions
are Spark-native (murmur3/xxhash64); their semantics are
invariant-tested in tests/.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mysql2clickhouse_spark.plans import all_oracles, all_queries
from mysql2clickhouse_spark.plans.corpus import q10_regional_revenue


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q10_regional_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
