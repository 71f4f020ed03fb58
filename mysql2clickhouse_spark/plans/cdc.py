"""Changelog-apply plans (SURVEY §2.1-§2.4) over the driver's ``events``
stream, adapted via ``sources.changelog``.

These are the engine's core semantics — the reference's event pipeline
(matomo2clickhouse.py:475-779) re-expressed as declarative plans:

- filters F1-F5 push into the scan,
- the INS-UPD append model (P5/P6) + latest-state read (Q1),
- merge-mode replay (P7/P9) as one window instead of N mutations,
- the 31-day old-DELETE guard (F6),
- transaction attribution (G1),
- the per-batch ledger summary (S5) and the binlog catalog clamp (S2).

Every query has a DuckDB oracle built on the *same* adapter SQL
(``CHANGELOG_VIEW_SQL``) so the Spark and oracle sides can't drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.apply import apply_append, apply_insert_as_update, apply_mutate, latest_by_key
from ..operators.filters import (
    filter_dml,
    filter_pos_range,
    filter_schemas,
    filter_tables,
    filter_time_range,
    split_old_deletes,
    with_txn_start,
)
from ..operators.project import normalize_values
from ..sources.changelog import CHANGELOG_VIEW_SQL, changelog_from_events
from ..sources.tables import load_table

OLD_DELETE_DAYS = 20   # fixture horizon; the reference constant is 31
                       # (matomo2clickhouse.py:593) but the events table
                       # spans one month, so 20 exercises both branches
T_START = "2024-01-05 00:00:00"
T_STOP = "2024-01-25 00:00:00"
SEQ_START, SEQ_END = 100, 9000
MAX_FILES = 5          # S2 clamp; reference default 20 (_settings.py:79-80)


def _cl(spark: SparkSession, sf_dir: str) -> DataFrame:
    return changelog_from_events(load_table(spark, sf_dir, "events"))


def cdc_apply_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 — insert-only apply."""
    return apply_append(_cl(spark, sf_dir)).select(
        "key", "seq", "file_seq", "ts", "value", "event_type"
    )


def cdc_apply_ins_upd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5+P6 — the INS-UPD version store: inserts AND updates append
    version rows with dateid := changelog position."""
    return apply_insert_as_update(_cl(spark, sf_dir), ["key"]).select(
        "key", "dateid", "ts", "value", "event_type"
    )


def cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 over the INS-UPD store — current row per key."""
    versions = apply_insert_as_update(_cl(spark, sf_dir), ["key"])
    return latest_by_key(versions, ["key"], "dateid", form="window").select(
        "key", "dateid", "ts", "value", "event_type"
    )


def cdc_apply_mutate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7+P9 — merge-mode replay: last event per key wins, DELETE
    terminal state removes the row."""
    return apply_mutate(_cl(spark, sf_dir), ["key"]).select(
        "key", "seq", "file_seq", "ts", "value", "event_type"
    )


def cdc_old_delete_rejection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 — rejected old DELETEs (would erase history the target keeps).
    ``now`` is the stream's own max(ts) for determinism."""
    cl = _cl(spark, sf_dir)
    now = cl.agg(F.max("ts").alias("now_ts"))
    with_now = cl.crossJoin(F.broadcast(now))
    _, rejected = split_old_deletes(
        with_now, date_col="ts", now_col=F.col("now_ts"), days=OLD_DELETE_DAYS
    )
    return rejected.select("key", "seq", "ts")


def cdc_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1+F2+F3+F4+F5 composed — the event-gate of the pipeline
    (matomo2clickhouse.py:511-550). All five predicates collapse into one
    scan-adjacent filter; the source-column bounds (F5) land in
    PushedFilters (check `.explain`)."""
    cl = _cl(spark, sf_dir)
    cl = filter_schemas(cl, ["matomo"])          # F2: only_schemas
    cl = filter_tables(cl, ["visits", "actions"])
    cl = filter_dml(cl, ["I", "U"])
    cl = filter_time_range(cl, T_START, T_STOP)
    cl = filter_pos_range(cl, SEQ_START, SEQ_END)
    return cl.groupBy("table_name", "op", "event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min("seq").alias("min_seq"),
        F.max("seq").alias("max_seq"),
    )


def cdc_value_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 — value normalization (``fix_object``,
    binlog2sql_util.py:180-193): MySQL ``set`` columns (arrays) become
    CSV strings, binary columns become hex strings, in the ingest
    projection.

    The events fixture has no native set/binary columns, so the raw
    shapes are derived deterministically first (a set-ish tag array and
    a binary payload — the binary(8) ``idvisitor`` analog), then
    normalized by the operator under test. Everything stays a pure
    projection over one scan: zero shuffle at any scale.
    """
    ev = load_table(spark, sf_dir, "events")
    raw = ev.select(
        F.col("user_id").alias("key"),
        F.col("event_id").alias("seq"),
        # MySQL `set` analog: members in definition order
        F.array(
            F.col("event_type"),
            F.concat(F.lit("u"), (F.col("user_id") % 5).cast("string")),
        ).alias("tags"),
        # binary column analog (idvisitor is binary(8) in the reference)
        F.encode(
            F.concat(F.col("event_type"), F.lit("-"), F.col("event_id").cast("string")),
            "UTF-8",
        ).alias("payload"),
    )
    out = normalize_values(raw, set_cols=["tags"], bin_cols=["payload"])
    return out.select(
        "key",
        "seq",
        F.col("tags").alias("tags_csv"),
        F.col("payload").alias("payload_hex"),
    )


def cdc_txn_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1 — each event attributed to the position of the last
    transaction-begin marker in its file ('signup' plays BEGIN)."""
    cl = _cl(spark, sf_dir)
    out = with_txn_start(cl, marker=F.col("event_type") == "signup")
    return out.select("seq", "file_seq", "txn_start_pos")


def cdc_ledger_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 — per-(file, sql_type) ledger rows: row count and position
    range, the queryable offset ledger the reference keeps in
    ``log_replication`` (script_create_clickhouse_table.sql:5-14)."""
    return (
        _cl(spark, sf_dir)
        .groupBy("file_seq", F.col("op").alias("sql_type"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("seq").alias("log_pos_start"),
            F.max("seq").alias("log_pos_end"),
            F.max("ts").alias("log_time"),
        )
    )


PURGE_KEEP_DAYS = 10   # reference: LEAVE_BINARY_LOGS_IN_DAYS = 180
                       # (_settings.py:87-90); 10 fits the one-month fixture


def cdc_binlog_purge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 — binlog purge guarded by replication progress
    (matomo2clickhouse.py:382-398): a changelog file may be dropped only
    when (a) it is older than the retention horizon AND (b) the ledger
    has consumed past it (file_seq strictly below the max applied file).
    The per-file agg and the 1-row progress agg both broadcast — no big
    shuffle; at scale this is partition-metadata work, not a data scan."""
    cl = _cl(spark, sf_dir)
    files = cl.groupBy("file_seq").agg(F.max("ts").alias("file_max_ts"))
    progress = cl.agg(
        F.max("ts").alias("applied_max_ts"), F.max("file_seq").alias("applied_max_file")
    )
    return (
        files.crossJoin(F.broadcast(progress))
        .filter(
            (F.col("file_max_ts") < F.date_sub(F.col("applied_max_ts"), PURGE_KEEP_DAYS))
            & (F.col("file_seq") < F.col("applied_max_file"))
        )
        .select("file_seq", "file_max_ts")
        .orderBy("file_seq")
    )


def cdc_binlog_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 — binlog file catalog scan with the per-session clamp
    (matomo2clickhouse.py:352-361): first N distinct files."""
    return (
        _cl(spark, sf_dir)
        .select("file_seq")
        .distinct()
        .orderBy("file_seq")
        .limit(MAX_FILES)
    )


def cdc_replication_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE RUNNER ITSELF under the correctness gate: a full
    ``run_session`` (budget loop → file clamp → per-table routing →
    policy apply → partitioned writes → ledger → argmax resume → EOF
    detection) into a fresh target, then the final latest-state of
    every routed table read back FROM STORAGE.

    visits/actions take the insert_as_update path (versions appended,
    dateid := seq, monthly partitions; latest = dedup-at-read);
    conversions takes the mutate path (partition-scoped fold, deletes
    terminal). The multi-batch fold equals the whole-stream fold — the
    property ``test_batched_fold_equals_one_fold`` pins — so the oracle
    is plain per-key argmax SQL regardless of how the budget loop cut
    the batches. F6 is neutralized (horizon 10^6 days) — it has its own
    oracle query (``cdc_old_delete_rejection``)."""
    from ..session import scratch_dir
    from ..streaming.runner import ReplicationRunner, RunConfig

    runner = ReplicationRunner(
        spark,
        RunConfig(
            target_dir=scratch_dir("m2c_e2e_"),
            max_files_per_run=5,
            old_delete_days=10**6,
        ),
    )
    # max_minutes < 10 skips end-of-run maintenance (entry point C gate)
    runner.run_session(_cl(spark, sf_dir), max_minutes=5.0, grace_minutes=0.0)

    outs = []
    for tbl in ("visits", "actions"):
        stored = spark.read.parquet(runner.table_path(tbl))
        latest = latest_by_key(stored, ["key"], "dateid", form="window")
        outs.append(
            latest.select(
                F.lit(tbl).alias("table_name"), "key",
                F.col("dateid").alias("seq"), "value",
            )
        )
    conv = spark.read.parquet(runner.table_path("conversions"))
    outs.append(
        conv.select(F.lit("conversions").alias("table_name"), "key", "seq", "value")
    )
    return outs[0].unionByName(outs[1]).unionByName(outs[2])


def cdc_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 source-format variant — Debezium-style JSON envelope build +
    parse (``sources/json_changelog.py``), both pure column
    expressions. The round-trip must reproduce the changelog exactly
    (lossless ``ts_us`` timestamps, image precedence after/before), so
    the oracle is the changelog view itself: any envelope or parse bug
    breaks the value hash."""
    from ..sources.json_changelog import changelog_from_json, changelog_to_json

    env = changelog_to_json(_cl(spark, sf_dir)).select("envelope")
    return changelog_from_json(env)


def cdc_consistency_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-DB integrity check — the reference mounts MySQL INTO
    ClickHouse (``CREATE DATABASE ... ENGINE = MySQL``) explicitly for
    source-vs-target data verification (README.md:259-278).  Engine
    re-expression: pt-table-checksum-style per-table digest compare
    (``operators/checksum.py``) — each side folds map-side to one row
    per table and only those tiny aggregates are joined, so neither
    table crosses the network at 100 TB.

    Two tagged comparisons:

    - ``compare='replica'``: the merge-fold SOURCE state (what the
      MySQL table holds after the changelog) vs the INS-UPD append
      store's latest-state READ MODEL (what a ClickHouse consumer
      sees).  These genuinely diverge on every key whose terminal op
      is DELETE — the version store keeps the last pre-delete image by
      design (_settings.py:124-138) — so the checker is certified to
      FIRE on a real divergence, per table, with count and digest
      mismatches surfaced.
    - ``compare='selfcheck'``: the same source state computed through
      two independent plan forms (window replay vs skew-immune
      max_by argmax).  Must MATCH — certifying the checker is quiet on
      equal states and the two mutate forms agree against SQL ground
      truth.
    """
    from ..operators.checksum import checksum_compare, row_digest, table_checksums

    cl = _cl(spark, sf_dir)

    def digest(seq_col: str):
        return row_digest([
            F.col("key"),
            F.col(seq_col),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss"),
            F.floor(F.col("value") * 100).cast("bigint"),
            F.col("event_type"),
        ])

    src = apply_mutate(cl, ["key"], form="window")
    # argmax latest: the replica read model must survive Zipf-hot keys
    # (window forms funnel a hot key's versions into one task); dateid
    # is strictly increasing per key so the fold is tie-free
    dst = latest_by_key(
        apply_insert_as_update(cl, ["key"]), ["key"], "dateid", form="argmax"
    )
    replica = checksum_compare(
        table_checksums(src, digest("seq")),
        table_checksums(dst, digest("dateid")),
    ).select(F.lit("replica").alias("compare"), "*")

    src_argmax = apply_mutate(cl, ["key"], form="argmax")
    self_check = checksum_compare(
        table_checksums(src, digest("seq")),
        table_checksums(src_argmax, digest("seq")),
    ).select(F.lit("selfcheck").alias("compare"), "*")

    return replica.unionByName(self_check)


QUERIES = {
    "cdc_apply_append": cdc_apply_append,
    "cdc_apply_ins_upd": cdc_apply_ins_upd,
    "cdc_latest_state": cdc_latest_state,
    "cdc_apply_mutate": cdc_apply_mutate,
    "cdc_old_delete_rejection": cdc_old_delete_rejection,
    "cdc_filters": cdc_filters,
    "cdc_value_norm": cdc_value_norm,
    "cdc_txn_attribution": cdc_txn_attribution,
    "cdc_ledger_summary": cdc_ledger_summary,
    "cdc_binlog_catalog": cdc_binlog_catalog,
    "cdc_binlog_purge": cdc_binlog_purge,
    "cdc_json_roundtrip": cdc_json_roundtrip,
    "cdc_replication_e2e": cdc_replication_e2e,
    "cdc_consistency_check": cdc_consistency_check,
}

#: DuckDB twin of ``operators.checksum.row_digest`` over the canonical
#: changelog columns — same md5/substr/hex-parse arithmetic, verified
#: bit-identical cross-engine.
_DIGEST_SQL = (
    "CAST(('0x' || substr(md5(concat_ws('|', key, {seq}, "
    "strftime(ts, '%Y-%m-%d %H:%M:%S'), CAST(FLOOR(value*100) AS BIGINT), "
    "event_type)), 1, 15)) AS BIGINT)"
)

_CONSISTENCY_SQL = f"""
WITH c AS ({CHANGELOG_VIEW_SQL}),
src AS (
    SELECT table_name, {_DIGEST_SQL.format(seq='seq')} AS d
    FROM (
        SELECT *, row_number() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
        FROM c
    ) WHERE rn = 1 AND op <> 'D'
),
dst AS (
    SELECT table_name, {_DIGEST_SQL.format(seq='seq')} AS d
    FROM (
        SELECT *, row_number() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
        FROM c WHERE op IN ('I', 'U')
    ) WHERE rn = 1
),
ssum AS (
    SELECT table_name, count(*) AS n, CAST(SUM(d % 1000000007) AS BIGINT) AS s,
           bit_xor(d) AS x
    FROM src GROUP BY table_name
),
dsum AS (
    SELECT table_name, count(*) AS n, CAST(SUM(d % 1000000007) AS BIGINT) AS s,
           bit_xor(d) AS x
    FROM dst GROUP BY table_name
),
replica AS (
    SELECT 'replica' AS compare,
           COALESCE(ssum.table_name, dsum.table_name) AS table_name,
           COALESCE(ssum.n, 0) AS n_src, COALESCE(dsum.n, 0) AS n_dst,
           COALESCE(ssum.n, 0) = COALESCE(dsum.n, 0) AS count_match,
           COALESCE(ssum.n, 0) = COALESCE(dsum.n, 0)
               AND ssum.s IS NOT DISTINCT FROM dsum.s
               AND ssum.x IS NOT DISTINCT FROM dsum.x AS digest_match
    FROM ssum FULL OUTER JOIN dsum ON ssum.table_name = dsum.table_name
),
selfcheck AS (
    -- window vs argmax mutate forms are the same state in SQL: the
    -- oracle asserts Spark's two plans both equal this ground truth
    SELECT 'selfcheck' AS compare, table_name, n AS n_src, n AS n_dst,
           TRUE AS count_match, TRUE AS digest_match
    FROM ssum
)
SELECT * FROM replica UNION ALL SELECT * FROM selfcheck
"""

ORACLE = {
    # envelope build+parse is lossless, so the round-trip equals the
    # changelog view itself
    "cdc_json_roundtrip": CHANGELOG_VIEW_SQL,
    "cdc_consistency_check": _CONSISTENCY_SQL,
    # final stored state per policy: ins_upd tables = argmax over I/U
    # versions; mutate table = argmax over all events, deletes terminal
    "cdc_replication_e2e": f"""
WITH c AS ({CHANGELOG_VIEW_SQL}),
ins AS (
    SELECT table_name, key, seq, value,
           row_number() OVER (PARTITION BY table_name, key ORDER BY seq DESC) AS rn
    FROM c WHERE table_name IN ('visits', 'actions') AND op IN ('I', 'U')
),
conv AS (
    SELECT table_name, key, seq, value, op,
           row_number() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
    FROM c WHERE table_name = 'conversions'
)
SELECT table_name, key, seq, value FROM ins WHERE rn = 1
UNION ALL
SELECT table_name, key, seq, value FROM conv WHERE rn = 1 AND op <> 'D'
""",
    "cdc_apply_append": f"""
WITH c AS ({CHANGELOG_VIEW_SQL})
SELECT key, seq, file_seq, ts, value, event_type FROM c WHERE op = 'I'
""",
    "cdc_apply_ins_upd": f"""
WITH c AS ({CHANGELOG_VIEW_SQL})
SELECT key, seq AS dateid, ts, value, event_type FROM c WHERE op IN ('I', 'U')
""",
    "cdc_latest_state": f"""
WITH c AS ({CHANGELOG_VIEW_SQL}),
v AS (SELECT key, seq AS dateid, ts, value, event_type FROM c WHERE op IN ('I', 'U')),
w AS (SELECT *, row_number() OVER (PARTITION BY key ORDER BY dateid DESC) AS rn FROM v)
SELECT key, dateid, ts, value, event_type FROM w WHERE rn = 1
""",
    "cdc_apply_mutate": f"""
WITH c AS ({CHANGELOG_VIEW_SQL}),
w AS (SELECT *, row_number() OVER (PARTITION BY key ORDER BY seq DESC) AS rn FROM c)
SELECT key, seq, file_seq, ts, value, event_type FROM w WHERE rn = 1 AND op <> 'D'
""",
    "cdc_old_delete_rejection": f"""
WITH c AS ({CHANGELOG_VIEW_SQL}),
n AS (SELECT max(ts) AS now_ts FROM c)
SELECT key, seq, ts FROM c, n
WHERE op = 'D'
  AND date_diff('day', CAST(ts AS DATE), CAST(now_ts AS DATE)) > {OLD_DELETE_DAYS}
""",
    "cdc_filters": f"""
WITH c AS ({CHANGELOG_VIEW_SQL})
SELECT table_name, op, event_type, count(*) AS cnt,
       min(seq) AS min_seq, max(seq) AS max_seq
FROM c
WHERE schema_name IN ('matomo')
  AND table_name IN ('visits', 'actions')
  AND op IN ('I', 'U')
  AND ts >= TIMESTAMP '{T_START}' AND ts < TIMESTAMP '{T_STOP}'
  AND seq > {SEQ_START} AND seq <= {SEQ_END}
GROUP BY table_name, op, event_type
""",
    # the raw set-ish / binary-ish shapes are built the same way on both
    # sides, then the normalization itself (CSV-join, hex) is mirrored
    "cdc_value_norm": """
SELECT user_id AS key, event_id AS seq,
       array_to_string([event_type, 'u' || CAST(user_id % 5 AS VARCHAR)], ',')
           AS tags_csv,
       upper(hex(encode(event_type || '-' || CAST(event_id AS VARCHAR))))
           AS payload_hex
FROM events
""",
    "cdc_txn_attribution": f"""
WITH c AS ({CHANGELOG_VIEW_SQL})
SELECT seq, file_seq,
       last_value(CASE WHEN event_type = 'signup' THEN seq END IGNORE NULLS)
           OVER (PARTITION BY file_seq ORDER BY seq
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS txn_start_pos
FROM c
""",
    "cdc_ledger_summary": f"""
WITH c AS ({CHANGELOG_VIEW_SQL})
SELECT file_seq, op AS sql_type, count(*) AS n_rows,
       min(seq) AS log_pos_start, max(seq) AS log_pos_end, max(ts) AS log_time
FROM c GROUP BY file_seq, op
""",
    "cdc_binlog_catalog": f"""
WITH c AS ({CHANGELOG_VIEW_SQL})
SELECT DISTINCT file_seq FROM c ORDER BY file_seq LIMIT {MAX_FILES}
""",
    # Spark's date_sub(ts, n) truncates to DATE; the oracle mirrors that
    # cast chain exactly so midnight-boundary files can't diverge.
    "cdc_binlog_purge": f"""
WITH c AS ({CHANGELOG_VIEW_SQL}),
f AS (SELECT file_seq, max(ts) AS file_max_ts FROM c GROUP BY file_seq),
p AS (SELECT max(ts) AS applied_max_ts, max(file_seq) AS applied_max_file FROM c)
SELECT file_seq, file_max_ts FROM f, p
WHERE file_max_ts < CAST(CAST(applied_max_ts AS DATE) - {PURGE_KEEP_DAYS} AS TIMESTAMP)
  AND file_seq < applied_max_file
ORDER BY file_seq
""",
}
