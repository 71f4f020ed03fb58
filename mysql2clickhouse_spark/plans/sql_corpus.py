"""The §2.5 corpus as LITERAL Spark SQL — the second query surface.

SURVEY §7.1 step 7 promises the shipped SQL corpus "runs as literal
Spark SQL too": a user of the reference writes SQL against ClickHouse
views (script_create_clickhouse_table.sql:484-563, _settings.py:143-287),
so the engine must answer the same statements through ``spark.sql``,
not only through the DataFrame builders in ``plans/corpus.py``.

The statement texts are deliberately the SAME ANSI strings the DuckDB
oracles use (``corpus.ORACLE``): every one of them parses and runs
unmodified on BOTH engines, which is itself the portability contract —
no Spark-only or DuckDB-only construct appears in the corpus. The
DataFrame builders remain the primary plans (they carry the broadcast
hints and decimal-exactness notes); this module proves the declarative
text lowers to the same results.

``sql_corpus_parity`` turns that equivalence into a driver-checkable
row per statement: the SQL form must be ROW-IDENTICAL (bag equality,
both directions) to the DataFrame form. Its oracle recomputes each
statement's row count in DuckDB from the same text, so a drifting
result set fails the value hash, not just an assertion in pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import register_views
from . import corpus

#: §2.5 statements that are pure SQL on both engines (every ``q*``
#: corpus entry; the cdc_* / streaming families go through the runner
#: and are exercised by their own driver queries).
SQL_CORPUS: dict[str, str] = {
    name: corpus.ORACLE[name]
    for name in (
        "q1_latest_join",
        "q1_latest_window",
        "q1_latest_argmax",
        "q1_latest_coarse_key",
        "q2_duplicate_audit",
        "q3_dedup_window",
        "q4_retention_probe",
        "q5_retention_count",
        "q7_argmax_checkpoint",
        "q8_daily_volume",
        "q9_union_minima",
        "q10_regional_revenue",
        "q11_force_resync",
        "q12_ledger_prune",
        "q13_supplier_part_margin",
    )
}


def register_corpus_views(spark: SparkSession, sf_dir: str) -> None:
    """Base tables + the ``versioned`` fact adapter as temp views, so
    corpus statements (and ad-hoc user SQL) resolve by name."""
    register_views(spark, sf_dir)
    spark.sql(
        f"CREATE OR REPLACE TEMP VIEW versioned AS {corpus.VERSIONED_SQL}"
    )


def run_sql(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Execute one corpus statement as literal ``spark.sql`` text."""
    register_corpus_views(spark, sf_dir)
    return spark.sql(SQL_CORPUS[name])


def sql_corpus_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per corpus statement: the literal-SQL result must be
    BAG-EQUAL to the DataFrame plan's. ``n_rows`` comes from the SQL
    form; the oracle recomputes it in DuckDB from the same statement
    text, so a drifting result set fails the value hash.

    Shape: one job for ALL statements — each statement's two forms
    project to ``(query, row_hash, ±1)``, everything unions, and a
    two-level aggregation nets the weights per (query, hash). A
    per-statement ``exceptAll`` pair would be 3 jobs × statements
    (measured 28 s at sf0.001); this is a single bounded-fan-in plan
    regardless of corpus size. Row hashes are md5-of-JSON — both forms
    run in THIS engine, so float formatting is bit-identical by
    construction. Schema (column-name) parity folds into the hash via
    a leading header row per side."""
    from pyspark.sql import functions as F

    register_corpus_views(spark, sf_dir)
    tagged = []
    for name, sql in SQL_CORPUS.items():
        for frame, w in ((spark.sql(sql), 1), (corpus.QUERIES[name](spark, sf_dir), -1)):
            row_h = F.md5(F.to_json(F.struct(*frame.columns)))
            header = F.md5(F.lit(",".join(c.lower() for c in frame.columns)))
            tagged.append(
                frame.select(
                    F.lit(name).alias("query"),
                    row_h.alias("h"),
                    F.lit(w).alias("w"),
                ).unionByName(
                    # one header row per side: a column-name mismatch
                    # nets like a data mismatch
                    spark.range(1).select(
                        F.lit(name).alias("query"), header.alias("h"), F.lit(w).alias("w")
                    )
                )
            )
    allrows = tagged[0]
    for t in tagged[1:]:
        allrows = allrows.unionByName(t)
    per_hash = allrows.groupBy("query", "h").agg(
        F.sum("w").alias("net"),
        F.sum(F.when(F.col("w") == 1, 1).otherwise(0)).alias("n_sql"),
    )
    return (
        per_hash.groupBy("query")
        .agg(
            # minus the header row each side contributed
            (F.sum("n_sql") - F.lit(1)).cast("bigint").alias("n_rows"),
            (F.max(F.abs(F.col("net"))) == 0).alias("row_identical"),
        )
    )


QUERIES = {
    "sql_corpus_parity": sql_corpus_parity,
}

# the oracle re-derives each statement's cardinality from the SAME text
# (DuckDB side), so n_rows is data-dependent, not a pinned constant —
# and row_identical must be TRUE for every statement.
ORACLE = {
    "sql_corpus_parity": "\nUNION ALL\n".join(
        f"SELECT '{name}' AS query,"
        f" CAST((SELECT count(*) FROM ({sql}) __t) AS BIGINT) AS n_rows,"
        f" TRUE AS row_identical"
        for name, sql in SQL_CORPUS.items()
    ),
}
