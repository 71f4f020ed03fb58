"""JDBC source/sink wrappers (SURVEY §2.1 S3/S4).

The reference talks to MySQL over pymysql for utility SELECTs
(matomo2clickhouse.py:405-433) and to ClickHouse over the native client
for batched INSERTs (matomo2clickhouse.py:446-472). In the Spark
engine both ends are plain JDBC datasources; these wrappers only pin
the options that encode the reference's operational tuning:

- reads partition on a numeric column so a big source table scans in
  parallel (the reference is single-threaded; Spark needn't be);
- writes batch at ``replication_batch_sql`` ≈ 2000 rows/INSERT — the
  setting the reference found optimal (_settings.py:75-77) — and cap
  write parallelism so the target isn't overwhelmed ("too many parts",
  README.md:189-194).

No MySQL/ClickHouse driver jars ship in this environment, but Spark
bundles Derby (its metastore engine), so the wrappers are EXECUTED
end-to-end against embedded Derby in ``tests/test_jdbc.py`` — batched
writes, range-partitioned parallel reads, append accumulation, and
filter pushdown into the remote query. Deploy time only swaps the URL
and driver class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_WRITE_BATCH = 2000   # replication_batch_sql (_settings.py:75-77)
DEFAULT_WRITE_PARTITIONS = 8  # pacing analog of ~1 INSERT/sec guidance

#: Per-URL-scheme option presets — the operational knowledge a migrating
#: operator otherwise rediscovers the hard way. Explicit call options
#: always override the preset. Sources: MySQL Connector/J and
#: clickhouse-jdbc public docs; the reference's tuning constants.
#:
#: ClickHouse notes: ``isolationLevel NONE`` because ClickHouse has no
#: transactions (Spark's default READ_UNCOMMITTED fails the connection
#: handshake); first-write table creation needs an engine clause, hence
#: ``createTableOptions``; nullable Spark columns require Nullable(T)
#: target columns — the driver surfaces the mismatch as a write error,
#: it cannot be papered over client-side.
#:
#: MySQL notes: ``useCursorFetch`` + ``fetchsize`` stream large result
#: sets instead of buffering them driver-side (the S3 snapshot read);
#: ``zeroDateTimeBehavior`` maps the infamous 0000-00-00 to NULL;
#: ``tinyInt1isBit=false`` keeps tinyint(1) an integer, matching how
#: the reference's binlog decoder reads it.
DIALECTS: dict[str, dict] = {
    "mysql": {
        "driver": "com.mysql.cj.jdbc.Driver",
        "read": {
            "useCursorFetch": "true",
            "fetchsize": "10000",
            "zeroDateTimeBehavior": "convertToNull",
            "tinyInt1isBit": "false",
        },
        "write": {},
    },
    "clickhouse": {
        "driver": "com.clickhouse.jdbc.ClickHouseDriver",
        "read": {"fetchsize": "10000"},
        "write": {
            "isolationLevel": "NONE",
            "createTableOptions": "ENGINE = MergeTree() ORDER BY tuple()",
        },
    },
    "derby": {  # the in-sandbox stand-in (Spark bundles Derby)
        "driver": "org.apache.derby.jdbc.EmbeddedDriver",
        "read": {},
        "write": {},
    },
}


def dialect_for(url: str) -> dict:
    """Resolve the option preset from a ``jdbc:<scheme>:`` URL; unknown
    schemes get an empty preset (plain JDBC, caller supplies driver)."""
    scheme = ""
    if url.startswith("jdbc:"):
        scheme = url.split(":", 2)[1].lower()
    return DIALECTS.get(scheme, {"driver": None, "read": {}, "write": {}})


def _merged(url: str, side: str, options: dict) -> dict:
    """Preset options for ``side`` ('read'|'write') with the caller's
    explicit options layered on top (explicit wins), plus the driver
    class when the preset knows it and the caller didn't set one."""
    d = dialect_for(url)
    out = dict(d.get(side, {}))
    if d.get("driver") and "driver" not in options:
        out["driver"] = d["driver"]
    out.update(options)
    return out


def jdbc_read(
    spark: SparkSession,
    url: str,
    table_or_query: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 16,
    **options: str,
):
    """S3 — parallel JDBC read. Pass a table name or ``(SELECT ...) q``
    subquery; with a numeric ``partition_column`` + bounds the scan
    splits into ``num_partitions`` range-partitioned queries. Catalyst
    pushes filters/projections through to the remote SQL."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table_or_query)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in _merged(url, "read", options).items():
        reader = reader.option(k, v)
    return reader


def jdbc_write(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int = DEFAULT_WRITE_BATCH,
    max_partitions: int = DEFAULT_WRITE_PARTITIONS,
    **options: str,
):
    """S4 — batched JDBC append. ``batchsize`` is the engine twin of the
    reference's 2000-rows-per-INSERT batching (its measured ~12× win
    over row-at-a-time, matomo2clickhouse.py:43-44); ``coalesce`` bounds
    concurrent connections against the target.

    ClickHouse preset caveat: the dialect default supplies
    ``createTableOptions = 'ENGINE = MergeTree() ORDER BY tuple()'`` so
    a FIRST write against a missing table succeeds at all — but
    ``ORDER BY tuple()`` means NO ordering key, a poor layout for query
    performance on a real table. It is a first-write fallback, not a
    recommendation: production tables should pre-exist with an explicit
    ORDER BY, or the caller should pass its own ``createTableOptions``.
    A log line fires whenever the fallback is in effect so the default
    can't apply silently."""
    merged = _merged(url, "write", options)
    if merged.get("createTableOptions", "").endswith("ORDER BY tuple()"):
        import logging

        logging.getLogger("mysql2clickhouse_spark.jdbc").info(
            "jdbc_write %s: dialect-preset createTableOptions %r applies "
            "if the table is auto-created — supply an explicit ORDER BY "
            "for real tables",
            table,
            merged["createTableOptions"],
        )
    writer = (
        df.coalesce(max_partitions)
        .write.format("jdbc")
        .mode(mode)
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
    )
    for k, v in merged.items():
        writer = writer.option(k, v)
    return writer
