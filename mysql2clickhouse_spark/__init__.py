"""PySpark-native analytics engine with the capabilities of
dneupokoev/mysql2clickhouse (a MySQL-binlog -> ClickHouse CDC replication
engine), rebuilt Spark-first.

The reference (see /root/reference, SURVEY.md) is a single-process CDC
replicator: it tails the MySQL row-based binlog, rewrites row events into
SQL, and applies them to ClickHouse with an append-only + dedup-at-read
model for hot tables, merge/mutate semantics for the rest, a queryable
offset ledger, retention jobs, and an analytical SQL corpus.

This package re-expresses all of that as DataFrame/Catalyst plans:

- ``sources``    : changelog + table readers (parquet now, JDBC-shaped API)
- ``operators``  : changelog filters/projections, apply modes (append /
                   insert-as-update / mutate), dedup, retention
- ``plans``      : the reference's shipped SQL corpus (Q1..Q12) as plans
- ``functions``  : column-expression library (version keys, text analysis,
                   minhash/simhash dedup, vector similarity)
- ``streaming``  : micro-batch runner (two-phase apply + ledger + budgets)

Design stance (SURVEY.md §7.0): no SQL-text IR, no RDDs, no Python UDFs on
the hot path — native column expressions end-to-end so Catalyst/Tungsten
handle pushdown, pruning, codegen and AQE at 100 TB scale.
"""

__version__ = "0.1.0"
