"""Changelog apply modes (SURVEY §2.3) — the heart of the engine.

The reference turns each binlog row event into SQL text per table policy
(binlog2sql_util.py:261-351). Here each policy is a DataFrame rewrite of a
changelog slice into table state:

- ``apply_append``           : P4 — inserts append (WriteRowsEvent)
- ``apply_insert_as_update`` : P5+P6 — "INS-UPD": updates become inserts
                               of the after-image with a fresh monotonic
                               ``dateid`` version; dedup happens at read
                               (latest_by_key / Q1)
- ``apply_mutate``           : P7+P9 — merge semantics: last writer wins,
                               delete removes the row (ClickHouse
                               ``ALTER ... UPDATE/DELETE`` analog)

All of it is joins/windows/filters over native columns — no UDFs — so the
plans whole-stage-codegen and AQE can pick shuffle-vs-broadcast at run
time.
"""

from __future__ import annotations

from collections.abc import Iterable
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


# ---------------------------------------------------------------------------
# version key (dateid)
# ---------------------------------------------------------------------------

def with_dateid(df: DataFrame, keys: Iterable[str], seq_col: str = "seq") -> DataFrame:
    """P5 — inject the ``dateid`` version key.

    The reference derives dateid from wall-clock
    (``get_dateid`` = epoch-seconds*1e7 + sub-second digits,
    binlog2sql_util.py:52-62) and had to fix a tie bug when an insert and
    its immediate update landed in the same tick
    (changelog matomo2clickhouse.py:34-36). We make monotonicity
    *structural* instead of temporal: dateid := the changelog position
    ``seq``, which is unique and strictly increasing in binlog order —
    deterministic under replay, no clock skew across 1000 executors.
    """
    return df.withColumn("dateid", F.col(seq_col).cast("bigint"))


# ---------------------------------------------------------------------------
# apply modes
# ---------------------------------------------------------------------------

def apply_append(changelog: DataFrame, op_col: str = "op") -> DataFrame:
    """P4 — insert-only apply: WriteRowsEvents become appended rows
    (binlog2sql_util.py:267-292). Column pruning drops before-images at
    the scan."""
    return changelog.filter(F.col(op_col) == "I").drop(op_col)


def apply_insert_as_update(
    changelog: DataFrame, keys: Iterable[str], op_col: str = "op", seq_col: str = "seq"
) -> DataFrame:
    """P6 — the INS-UPD rewrite (binlog2sql_util.py:305-327).

    Inserts AND updates both append version rows (the update contributes
    its after-image) with a fresh ``dateid``; deletes do not touch the
    versioned store (history tables never shrink —
    _settings.py:124-138). This avoids slow in-place mutation on the hot
    path, exactly the reference's rationale (binlog2sql_util.py:308-310):
    at scale it turns random-update I/O into a pure columnar append.
    """
    versions = changelog.filter(F.col(op_col).isin("I", "U"))
    return with_dateid(versions, keys, seq_col).drop(op_col)


def latest_by_key(
    df: DataFrame,
    keys: Iterable[str],
    version_col: str = "dateid",
    form: str = "window",
) -> DataFrame:
    """Q1 — the latest-record dedup view
    (script_create_clickhouse_table.sql:484-494, 553-563).

    ``form='join'`` is the faithful port: ``GROUP BY key -> max(dateid)``
    then join back — keeps ALL rows tied on max(dateid), like the
    reference's LEFT JOIN form.

    ``form='window'`` is the idiomatic Spark plan: a single shuffle on the
    key + ``row_number`` — keeps exactly one row per key. At scale this
    is one exchange instead of the join form's two (agg + join), and AQE
    handles skewed keys; prefer it unless bit-exact tie parity with the
    reference is required (SURVEY §2.6 note).

    ``form='argmax'`` is the SKEW-IMMUNE plan: ``max_by`` aggregation
    with the full row packed in a struct. Unlike every window form
    (which shuffles ALL versions of a key into one task — a hot key
    with 10^8 versions is one 10^8-row task no matter what AQE does),
    the aggregate combines map-side: the shuffle carries at most one
    row per key per input partition, so a hot key costs each mapper one
    struct and the reducer |partitions| structs. Requires a tie-free
    version column per key (INS-UPD's strictly-increasing dateid
    guarantees it; ties would be broken arbitrarily).

    ``form='semi'`` (round 11) computes the join form's EXACT result —
    all rows tied on max(version) survive — as a LEFT SEMI join of the
    full table against the (key, max) aggregate. Why it exists: the
    LeftOuter join form PRESERVES the aggregate side, and Spark can
    only broadcast the non-preserved side of an outer join — so the
    planner's sole broadcast option is the FULL TABLE (measured: the
    sf0.1 plan broadcast all of lineitem, 600k×7 cols, to probe a
    150k-row aggregate), and at real scale where nothing broadcasts it
    degrades to a sort-merge that shuffles the wide fact rows twice
    (once as join input, once inside the agg subtree). The semi form
    lets the small (key, max) aggregate be the build side, so the fact
    table streams once and is never broadcast. Equivalence requires
    non-null keys and a non-null version column (an all-NULL group or
    NULL key never matches its own max under ``=`` and would surface
    only in the outer form as an orphan aggregate row) — both hold by
    schema for every registered caller, and the q1 oracle rows pin
    value identity.
    """
    keys = list(keys)
    if form == "semi":
        agg = df.groupBy(*keys).agg(F.max(version_col).alias(version_col))
        return df.join(agg, on=keys + [version_col], how="left_semi")
    if form == "window":
        w = Window.partitionBy(*keys).orderBy(F.col(version_col).desc())
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    if form == "rank":
        # keeps ties like the join form, single shuffle
        w = Window.partitionBy(*keys).orderBy(F.col(version_col).desc())
        return df.withColumn("__rk", F.rank().over(w)).filter(F.col("__rk") == 1).drop("__rk")
    if form == "argmax":
        others = [c for c in df.columns if c not in keys]
        # total order: version first, then the remaining columns
        # lexicographically (struct comparison) — ties on max(version)
        # resolve deterministically, so the fold is replay-stable
        ord_cols = [version_col] + [c for c in others if c != version_col]
        packed = df.groupBy(*keys).agg(
            F.max_by(F.struct(*others), F.struct(*ord_cols)).alias("__row")
        )
        return packed.select(*keys, *[F.col(f"__row.{c}").alias(c) for c in others])
    # faithful groupBy + join port
    agg = df.groupBy(*keys).agg(F.max(version_col).alias(version_col))
    return agg.join(df, on=keys + [version_col], how="left")


def apply_mutate(
    changelog: DataFrame,
    keys: Iterable[str],
    op_col: str = "op",
    seq_col: str = "seq",
    form: str = "window",
) -> DataFrame:
    """P7 + P9 — merge-mode apply: replay I/U/D in changelog order per
    key; final state = the last event's after-image, or nothing if the
    last event is a DELETE.

    The reference executes these as per-row ClickHouse mutations
    (``ALTER TABLE ... UPDATE/DELETE ... SETTINGS mutations_sync=1``,
    binlog2sql_util.py:294-341). On immutable storage the entire replay
    collapses into one shuffle on the key instead of N serialized
    mutations; this is the plan that survives a 100× scale-up.

    ``form='window'`` is the faithful single-window replay.
    ``form='argmax'`` is the SKEW-IMMUNE plan the runner uses: a
    ``max_by(struct(row), struct(seq, ...))`` aggregate combines
    map-side, so a Zipf-hot key (the reference's production tables are
    visit/action logs where one site can be 30% of a batch) ships at
    most one partial struct per input partition through the exchange —
    a window partition, by contrast, funnels every version of the hot
    key into ONE task and AQE cannot split a window partition. Results
    are identical whenever ``seq`` is unique per key (binlog positions
    are globally unique; the runner's synthetic base rows use seq=-1
    exactly once per key) — pinned by the skew suite.
    """
    keys = list(keys)
    if form == "argmax":
        others = [c for c in changelog.columns if c not in keys]
        ord_cols = [seq_col] + [c for c in others if c != seq_col]
        packed = changelog.groupBy(*keys).agg(
            F.max_by(F.struct(*others), F.struct(*ord_cols)).alias("__row")
        )
        out_cols = [c for c in changelog.columns if c != op_col]
        return (
            packed.select(*keys, *[F.col(f"__row.{c}").alias(c) for c in others])
            .filter(F.col(op_col) != "D")
            .select(*out_cols)
        )
    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc())
    return (
        changelog.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col(op_col) != "D"))
        .drop("__rn", op_col)
    )


# ---------------------------------------------------------------------------
# merge primitives (used by the runner to fold a batch into stored state)
# ---------------------------------------------------------------------------

def null_safe_cond(left: DataFrame, right: DataFrame, cols: Iterable[str]) -> Column:
    """P3 — NULL-aware match predicate.

    The reference builds ``col = %s`` vs ``col IS NULL`` per column
    (``compare_items``, binlog2sql_util.py:171-177) for full-row-image
    WHERE clauses. Spark has this as first-class null-safe equality."""
    return reduce(
        lambda a, b: a & b, [left[c].eqNullSafe(right[c]) for c in cols]
    )


def merge_upsert(target: DataFrame, updates: DataFrame, keys: Iterable[str]) -> DataFrame:
    """P7 — upsert ``updates`` (already one row per key) into ``target``:
    rows matching on the business key are replaced, others kept.

    Implemented as anti-join + union — the immutable-storage rewrite of
    ``ALTER TABLE ... UPDATE`` (binlog2sql_util.py:328-341). The no-op
    column elision of the reference (P8, binlog2sql_util.py:330-335)
    is subsumed: replacing the full row with the after-image is
    value-identical when before==after on some columns, and the merge key
    (the PK the elision protects) is the join key itself.

    At scale: ``updates`` is a micro-batch (small) — broadcast it so the
    big ``target`` side never shuffles.
    """
    keys = list(keys)
    survivors = target.join(F.broadcast(updates.select(*keys)), on=keys, how="left_anti")
    return survivors.unionByName(updates.select(*target.columns))


def delete_full_row_antijoin(
    target: DataFrame, deletes: DataFrame, cols: Iterable[str] | None = None
) -> DataFrame:
    """P9 — DELETE by full-row-image, null-safe on every column
    (binlog2sql_util.py:294-304 builds the conjunctive WHERE via
    compare_items). Anti-join with ``eqNullSafe`` conjunction; the small
    delete-set side broadcasts."""
    cols = list(cols) if cols is not None else list(target.columns)
    d = F.broadcast(deletes.select(*cols).alias("d"))
    t = target.alias("t")
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"t.{c}").eqNullSafe(F.col(f"d.{c}")) for c in cols],
    )
    return t.join(d, on=cond, how="left_anti")
