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
from . import cdc, corpus

#: §2.5 statements that are pure SQL on both engines (every ``q*``
#: corpus entry; the cdc_* / streaming families go through the runner
#: and are exercised by their own driver queries).
SQL_CORPUS: dict[str, str] = {
    name: corpus.ORACLE[name]
    for name in (
        # events_daily_anomaly qualifies for the dual-dialect set: its
        # oracle text (exact-integer moments, greatest/sqrt/abs,
        # USING join) parses and runs unmodified on BOTH engines
        "events_daily_anomaly",
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


#: analytics extensions (events family) as SPARK-dialect SQL. These
#: cannot share text with their DuckDB oracles (epoch_us vs unix_micros,
#: list vs collect_list, quantile_cont vs percentile), so each gets a
#: native spelling here; ``sql_corpus_parity`` certifies them bag-equal
#: to the DataFrame plans, and the parity ORACLE recomputes their row
#: counts from the corresponding DuckDB oracle text (itself value-hash
#: green against the same plans).
SQL_CORPUS_SPARK: dict[str, str] = {
    "events_sessionize": """
WITH t AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(unix_micros(ts)) OVER w IS NULL
                OR unix_micros(ts) - lag(unix_micros(ts)) OVER w > 1800 * 1000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, event_id, ts,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM t
)
SELECT user_id, session_idx, count(*) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end,
       min(event_id) AS first_event_id
FROM s GROUP BY user_id, session_idx
""",
    "events_session_window": """
SELECT user_id, session_window.start AS sess_start,
       session_window.end AS sess_end, count(1) AS n_events
FROM events GROUP BY session_window(ts, '1800 seconds'), user_id
""",
    "events_asof_join": """
WITH sides AS (
  SELECT user_id, event_id, unix_micros(ts) AS us,
         CAST(event_type = 'purchase' AS INT) AS is_p
  FROM events WHERE event_type IN ('view', 'purchase')
),
carried AS (
  SELECT user_id, event_id, us, is_p,
         last(CASE WHEN is_p = 0 THEN event_id END) IGNORE NULLS OVER w AS view_event_id,
         us - last(CASE WHEN is_p = 0 THEN us END) IGNORE NULLS OVER w AS view_gap_us
  FROM sides
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT user_id, event_id AS purchase_event_id, us AS purchase_ts_us,
       view_event_id, view_gap_us
FROM carried WHERE is_p = 1
""",
    "events_funnel": """
WITH a AS (
  SELECT user_id,
         collect_list(CASE WHEN event_type = 'signup' THEN unix_micros(ts) END) AS s,
         collect_list(CASE WHEN event_type = 'view' THEN unix_micros(ts) END) AS v,
         collect_list(CASE WHEN event_type = 'purchase' THEN unix_micros(ts) END) AS p
  FROM events GROUP BY user_id
),
g AS (SELECT user_id, array_min(s) AS t1, v, p FROM a),
h AS (
  SELECT user_id, t1,
         array_min(filter(v, x -> x > t1 AND x <= t1 + 14400000000)) AS t2, p
  FROM g
)
SELECT user_id, t1 AS t_signup_us, t2 AS t_view_us,
       array_min(filter(p, x -> x > t2 AND x <= t2 + 14400000000)) AS t_purchase_us,
       CASE WHEN array_min(filter(p, x -> x > t2 AND x <= t2 + 14400000000)) IS NOT NULL THEN 3
            WHEN t2 IS NOT NULL THEN 2
            WHEN t1 IS NOT NULL THEN 1
            ELSE 0 END AS reached
FROM h
""",
    "events_cohort_retention": """
WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
c AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id)
SELECT cohort_day, datediff(day, cohort_day) AS day_offset,
       count(DISTINCT user_id) AS n_users
FROM e JOIN c USING (user_id)
GROUP BY cohort_day, datediff(day, cohort_day)
""",
    "events_range_join": """
WITH ev AS (SELECT unix_micros(ts) AS us FROM events),
hours AS (SELECT DISTINCT CAST(floor(us / 3600000000) AS BIGINT) AS h FROM ev),
wins AS (SELECT h * 3600000000 AS win_start_us,
                h * 3600000000 + 5400000000 AS win_end_us
         FROM hours WHERE h % 5 = 0),
wexp AS (SELECT win_start_us, win_end_us,
                explode(sequence(CAST(floor(win_start_us / 3600000000) AS BIGINT),
                                 CAST(floor(win_end_us / 3600000000) AS BIGINT))) AS bucket
         FROM wins),
eb AS (SELECT us, CAST(floor(us / 3600000000) AS BIGINT) AS bucket FROM ev)
SELECT win_start_us, count(1) AS n_events
FROM eb JOIN wexp USING (bucket)
WHERE us >= win_start_us AND us < win_end_us
GROUP BY win_start_us
""",
    "events_approx_profile": """
WITH exact AS (SELECT count(DISTINCT user_id) AS n_users_exact,
                      percentile(value, 0.5) AS p50_raw,
                      min(value) AS lo, max(value) AS hi FROM events),
ap AS (SELECT approx_count_distinct(user_id, 0.05) AS n_users_hll,
              percentile_approx(value, 0.5, 1000) AS p50_sketch FROM events)
SELECT n_users_exact, round(p50_raw, 4) AS p50_exact,
       (abs(n_users_hll - n_users_exact) <= 0.10 * n_users_exact) AS hll_ok,
       (abs(p50_sketch - p50_raw) <= 0.05 * (hi - lo)) AS p50_sketch_ok
FROM exact CROSS JOIN ap
""",
    "events_value_percentiles": """
SELECT event_type, count(1) AS n,
       round(percentile(value, 0.5), 4) AS p50,
       round(percentile(value, 0.9), 4) AS p90,
       round(percentile(value, 0.99), 4) AS p99
FROM events GROUP BY event_type
""",
    # the round-6 integrity check as one declarative statement: hex
    # parse is conv(..,16,10) here vs DuckDB's '0x' cast, everything
    # else (md5, concat_ws, strftime twin, bit_xor, mod-sum) is shared
    # arithmetic — proven digest-identical in operators/checksum.py
    "cdc_consistency_check": """
WITH c AS (SELECT * FROM changelog),
src AS (
    SELECT table_name, key, seq, ts, value, event_type FROM (
        SELECT *, row_number() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
        FROM c
    ) WHERE rn = 1 AND op <> 'D'
),
dst AS (
    SELECT table_name, key, seq, ts, value, event_type FROM (
        SELECT *, row_number() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
        FROM c WHERE op IN ('I', 'U')
    ) WHERE rn = 1
),
sd AS (SELECT table_name,
              CAST(conv(substring(md5(concat_ws('|', key, seq,
                   date_format(ts, 'yyyy-MM-dd HH:mm:ss'),
                   CAST(FLOOR(value*100) AS BIGINT), event_type)), 1, 15), 16, 10)
                   AS BIGINT) AS d
       FROM src),
dd AS (SELECT table_name,
              CAST(conv(substring(md5(concat_ws('|', key, seq,
                   date_format(ts, 'yyyy-MM-dd HH:mm:ss'),
                   CAST(FLOOR(value*100) AS BIGINT), event_type)), 1, 15), 16, 10)
                   AS BIGINT) AS d
       FROM dst),
ssum AS (SELECT table_name, count(*) AS n, sum(d % 1000000007) AS s, bit_xor(d) AS x
         FROM sd GROUP BY table_name),
dsum AS (SELECT table_name, count(*) AS n, sum(d % 1000000007) AS s, bit_xor(d) AS x
         FROM dd GROUP BY table_name),
replica AS (
    SELECT 'replica' AS compare,
           coalesce(ssum.table_name, dsum.table_name) AS table_name,
           coalesce(ssum.n, 0) AS n_src, coalesce(dsum.n, 0) AS n_dst,
           coalesce(ssum.n, 0) = coalesce(dsum.n, 0) AS count_match,
           coalesce(ssum.n, 0) = coalesce(dsum.n, 0)
               AND ssum.s <=> dsum.s AND ssum.x <=> dsum.x AS digest_match
    FROM ssum FULL OUTER JOIN dsum ON ssum.table_name = dsum.table_name
),
selfcheck AS (
    SELECT 'selfcheck' AS compare, table_name, n AS n_src, n AS n_dst,
           TRUE AS count_match, TRUE AS digest_match
    FROM ssum
)
SELECT * FROM replica UNION ALL SELECT * FROM selfcheck
""",
}


def register_corpus_views(spark: SparkSession, sf_dir: str) -> None:
    """Base tables + the ``versioned`` fact adapter as temp views, so
    corpus statements (and ad-hoc user SQL) resolve by name."""
    register_views(spark, sf_dir)
    spark.sql(
        f"CREATE OR REPLACE TEMP VIEW versioned AS {corpus.VERSIONED_SQL}"
    )
    # the changelog adapter is itself dual-dialect text
    from ..sources.changelog import CHANGELOG_VIEW_SQL

    spark.sql(
        f"CREATE OR REPLACE TEMP VIEW changelog AS {CHANGELOG_VIEW_SQL}"
    )


def run_sql(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Execute one corpus statement as literal ``spark.sql`` text."""
    register_corpus_views(spark, sf_dir)
    return spark.sql({**SQL_CORPUS, **SQL_CORPUS_SPARK}[name])


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
    df_forms = {**corpus.QUERIES, **cdc.QUERIES}
    tagged = []
    for name, sql in {**SQL_CORPUS, **SQL_CORPUS_SPARK}.items():
        for frame, w in ((spark.sql(sql), 1), (df_forms[name](spark, sf_dir), -1)):
            # keep null-valued fields in the JSON: with the default
            # (nulls omitted) two rows differing only in WHICH column is
            # null would hash identically and evade the parity net
            row_h = F.md5(
                F.to_json(
                    F.struct(*frame.columns), {"ignoreNullFields": "false"}
                )
            )
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

# the oracle re-derives each statement's cardinality in DuckDB — from
# the SAME text for the dual-dialect set, and from the query's own
# DuckDB oracle (value-hash green against the identical DataFrame plan,
# hence count-identical) for the Spark-dialect events set. n_rows is
# data-dependent, not a pinned constant; row_identical must be TRUE.
ORACLE = {
    "sql_corpus_parity": "\nUNION ALL\n".join(
        f"SELECT '{name}' AS query,"
        f" CAST((SELECT count(*) FROM ({sql}) __t) AS BIGINT) AS n_rows,"
        f" TRUE AS row_identical"
        for name, sql in {
            **SQL_CORPUS,
            **{
                n: {**corpus.ORACLE, **cdc.ORACLE}[n]
                for n in SQL_CORPUS_SPARK
            },
        }.items()
    ),
}
