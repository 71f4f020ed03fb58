"""The §2.5 corpus as literal Spark SQL (SURVEY §7.1 step 7).

Every statement in ``SQL_CORPUS`` must (a) parse and run through
``spark.sql`` over the registered temp views and (b) produce a result
bag-identical to the DataFrame plan of the same name. The statement
texts double as the DuckDB oracles, so this also pins the corpus to the
dual-dialect ANSI subset.
"""

from __future__ import annotations

import pytest

from mysql2clickhouse_spark.plans import corpus
from mysql2clickhouse_spark.plans.sql_corpus import (
    SQL_CORPUS,
    SQL_CORPUS_SPARK,
    run_sql,
    sql_corpus_parity,
)

SF = "/root/testdata/sf0.001"


def test_sql_corpus_covers_every_qstar_and_events_plan():
    qstar = {n for n in corpus.QUERIES if n.startswith("q")}
    assert qstar <= set(SQL_CORPUS), (
        "every q* DataFrame plan needs a literal-SQL twin"
    )
    events = {n for n in corpus.QUERIES if n.startswith("events_")}
    # every events plan has a twin in ONE of the two surfaces; those
    # whose oracle text is already dual-dialect (runs unmodified on
    # both engines) sit in SQL_CORPUS instead of SQL_CORPUS_SPARK.
    # Spark-dialect statements backed by cdc-family DataFrame plans
    # (round 6: the consistency check) are allowed alongside.
    spark_dialect_events = {n for n in SQL_CORPUS_SPARK if n.startswith("events_")}
    assert events == spark_dialect_events | (set(SQL_CORPUS) & events), (
        "every events_* plan needs an SQL twin (and vice versa)"
    )
    # no statement not backed by a DataFrame plan sneaks in
    from mysql2clickhouse_spark.plans import cdc

    backed = set(corpus.QUERIES) | set(cdc.QUERIES)
    assert set(SQL_CORPUS) | set(SQL_CORPUS_SPARK) <= backed
    assert not set(SQL_CORPUS) & set(SQL_CORPUS_SPARK)


def test_sql_corpus_parity_all_identical(spark):
    out = sql_corpus_parity(spark, SF).collect()
    assert len(out) == len(SQL_CORPUS) + len(SQL_CORPUS_SPARK)
    bad = [r["query"] for r in out if not r["row_identical"]]
    assert not bad, f"SQL form diverges from DataFrame form: {bad}"
    # non-degenerate: the statements actually return data
    assert sum(r["n_rows"] for r in out) > 0


@pytest.mark.parametrize("name", ["q10_regional_revenue", "q1_latest_window"])
def test_run_sql_single_statement(spark, name):
    df = run_sql(spark, SF, name)
    assert df.count() > 0
