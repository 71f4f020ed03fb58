"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (Q10 regional revenue: the fact
stream joined through the dimension chain, broadcast dims, decimal-exact
aggregation) on sf0.001.

``queries()`` / ``oracle_sql()`` — the CURATED registry: exactly 50
entries (the driver records at most ~50 rows per round — r02 held the
first 50 of 97), one per SURVEY §2 family member / extension family,
and EVERY entry has a DuckDB oracle (zero rows-only rows). Same-family
certification twins and plan variants are folded into tagged suite rows
(``plans/suites.py`` documents the member → suite map); everything
un-folded stays registered in ``queries_extended()`` and is run by
``scripts/check_parity.py`` and ``tests/test_oracle_parity.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mysql2clickhouse_spark.plans import (
    all_oracles,
    all_oracles_extended,
    all_queries,
    all_queries_extended,
)
from mysql2clickhouse_spark.plans.corpus import q10_regional_revenue


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q10_regional_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()


def queries_extended() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Every registered query including un-folded suite members and
    plan variants — the full mirror surface (not part of the driver
    contract; run by scripts/check_parity.py)."""
    return all_queries_extended()


def oracle_sql_extended() -> dict[str, str]:
    return all_oracles_extended()
