"""Table registry with per-table apply policy.

The reference hard-codes this policy across three settings blocks:

- ``replication_tables``   (/root/reference/_settings.py:105-122) — which
  tables replicate at all (filter F1);
- ``tables_not_updated``   (/root/reference/_settings.py:124-130) — tables
  whose UPDATEs are rewritten to INSERT-of-after-image with a fresh
  ``dateid`` version key ("INS-UPD", binlog2sql_util.py:305-327);
- ``CONST_TBL_NOT_DELETE_OLD`` (/root/reference/_settings.py:132-138) —
  tables where DELETEs of rows older than 31 days are rejected so the
  target keeps history the source drops (matomo2clickhouse.py:583-606).

Plus the target DDL (script_create_clickhouse_table.sql) which gives each
table its ORDER BY clustering key and monthly ``toYYYYMM`` partition.

Here the same knowledge is one declarative registry. ``apply_mode``:

- ``append``            : insert-only fact (no updates expected)
- ``insert_as_update``  : hot fact — updates append a new version row
                          keyed by ``dateid``; readers dedup (Q1)
- ``mutate``            : dim / cold fact — updates merge in place,
                          deletes remove rows (anti-join rewrite)
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class TablePolicy:
    name: str
    key_cols: tuple[str, ...]           # business key (dedup / merge key)
    order_cols: tuple[str, ...]         # clustering key (ORDER BY analog)
    apply_mode: str = "append"          # append | insert_as_update | mutate
    partition_col: str | None = None    # monthly yyyymm partition driver
    not_delete_old_col: str | None = None  # date col for the 31-day delete guard
    has_dateid: bool = False            # carries the version column
    # P11 schema rename: the reference rewrites the source db name to
    # ``CH_matomo_dbname`` in every emitted statement
    # (binlog2sql_util.py:44-49, applied at 9 call sites). Here the
    # rename is a target namespace the runner places the table under —
    # None keeps the table directly in ``tables/``.
    target_namespace: str | None = None


# Fixture-shaped registry (FIXTURES.md F2-F6), mirroring the reference's
# matomo tables onto the driver's star schema.
REGISTRY: dict[str, TablePolicy] = {
    # ≈ matomo_log_visit (sql:16-97): insert_as_update + dateid + yyyymm
    "visits": TablePolicy(
        name="visits",
        key_cols=("idvisit",),
        order_cols=("idvisit", "dateid"),
        apply_mode="insert_as_update",
        partition_col="visit_first_action_time",
        has_dateid=True,
    ),
    # ≈ matomo_log_link_visit_action (sql:99-154)
    "actions": TablePolicy(
        name="actions",
        key_cols=("idlink_va",),
        order_cols=("idvisit", "dateid"),
        apply_mode="insert_as_update",
        partition_col="server_time",
        has_dateid=True,
    ),
    # ≈ matomo_log_conversion (sql:175-233): mutate + old-delete guard
    "conversions": TablePolicy(
        name="conversions",
        key_cols=("idvisit", "idsite", "idgoal", "buster"),
        order_cols=("idvisit", "idsite", "idgoal", "buster"),
        apply_mode="mutate",
        partition_col="server_time",
        not_delete_old_col="server_time",
    ),
    # ≈ matomo_site / matomo_site_url / matomo_goal / matomo_log_action —
    # small mutate-mode dims (always broadcast-join these).
    "site": TablePolicy("site", ("idsite",), ("idsite",), "mutate"),
    "site_url": TablePolicy("site_url", ("idsite", "url"), ("idsite", "url"), "mutate"),
    "goal": TablePolicy("goal", ("idsite", "idgoal"), ("idsite", "idgoal"), "mutate"),
    "action": TablePolicy("action", ("idaction",), ("idaction",), "mutate"),
    # canonical changelog-apply state table used by the driver fixtures
    # (events stream keyed by user_id)
    "events_state": TablePolicy(
        name="events_state",
        key_cols=("key",),
        order_cols=("key", "seq"),
        apply_mode="mutate",
        not_delete_old_col="ts",
    ),
}


# Fallback policy for tables that reach the runner without a registry
# entry. Append-mode on purpose: an unregistered fact-sized table must
# never take the mutate path's read-modify-rewrite (the reference simply
# doesn't replicate unconfigured tables at all — only_tables,
# matomo2clickhouse.py:493 — so any apply here is already best-effort;
# append is the mode that cannot lose or rewrite existing data).
DEFAULT_POLICY = TablePolicy(
    name="__default__",
    key_cols=("key",),
    order_cols=("key", "seq"),
    apply_mode="append",
)


def replicated_tables() -> tuple[str, ...]:
    """F1 filter set — analog of settings.replication_tables."""
    return tuple(REGISTRY)


def policy(name: str) -> TablePolicy:
    return REGISTRY[name]
