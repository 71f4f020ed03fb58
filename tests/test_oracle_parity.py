"""Driver-mirror correctness gate: every declared query vs its DuckDB
oracle at sf0.001 (the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from oracle_utils import compare, duckdb_conn

from mysql2clickhouse_spark.plans import (
    CORE_QUERY_KEYS,
    all_oracles,
    all_oracles_extended,
    all_queries,
    all_queries_extended,
)
from mysql2clickhouse_spark.plans.plancheck import (
    EXACT_AGG_ALLOWLIST,
    lint,
    unpartitioned_windows,
)

# the EXTENDED set: the curated driver registry plus every un-folded
# variant/twin — demotion from the driver surface never loses coverage
QUERIES = all_queries_extended()
ORACLES = all_oracles_extended()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, con):
    df = QUERIES[name](spark, sf_dir)
    # blanket scale lint, same policy as scripts/check_parity.py: NO
    # unpartitioned Window, NO shuffled cartesian product, and NO
    # exact unbounded-buffer aggregate outside the named allowlist,
    # anywhere in the extended registry (plan walks — no execution
    # cost), so a lint-red query fails CI instead of hiding until the
    # next check_parity sweep
    findings = lint(
        df, allow_exact_aggregates=EXACT_AGG_ALLOWLIST.get(name, frozenset())
    )
    assert not findings, f"{name}: {findings[0][:160]}"
    if name in ORACLES:
        ok, msg = compare(df, con, ORACLES[name])
        assert ok, f"{name}: {msg}"
    else:
        assert df.count() >= 0  # rows-only contract


def test_blanket_lint_catches_a_global_window_query(spark):
    """Gate self-test: a registry entry that sneaks in an unpartitioned
    Window MUST be flagged by the exact lint call the parametrized
    oracle loop runs — proving a lint-red query fails CI, not just
    scripts/check_parity.py."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    def bad_query(spark, sf_dir):  # deliberately-global-window fixture
        return spark.range(10).withColumn(
            "rk", F.row_number().over(Window.orderBy("id"))
        )

    assert unpartitioned_windows(bad_query(spark, None)), (
        "the blanket lint failed to flag a deliberately global window"
    )
    assert any("UNPARTITIONED WINDOW" in f for f in lint(bad_query(spark, None)))


def test_blanket_lint_catches_a_shuffled_cartesian_product(spark):
    """Gate self-test for lint rule 2: a cross join that compiles to a
    shuffled CartesianProduct is flagged; the broadcast form (the only
    cross-join shape the registry's cert twins use) passes."""
    from pyspark.sql import functions as F

    a = spark.range(100).withColumnRenamed("id", "x")
    b = spark.range(100).withColumnRenamed("id", "y")
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        assert any("CARTESIAN PRODUCT" in f for f in lint(a.crossJoin(b)))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    assert not lint(a.crossJoin(F.broadcast(b)))


def test_blanket_lint_catches_exact_aggregates(spark):
    """Gate self-test for lint rule 3: exact ``percentile`` is flagged
    grouped AND global; a global ``collect_list`` is flagged; a GROUPED
    collect_list (the bounded per-entity array pattern) passes; and the
    allowlist waiver waives rule 3 only."""
    from pyspark.sql import functions as F

    from mysql2clickhouse_spark.plans.plancheck import exact_aggregates

    df = spark.range(100).select(
        (F.col("id") % 5).alias("k"), F.col("id").cast("double").alias("v")
    )
    # exact percentile: flagged global and grouped
    assert any(
        "Percentile" in f and "global" in f
        for f in exact_aggregates(df.agg(F.expr("percentile(v, 0.5)")))
    )
    assert any(
        "Percentile" in f and "grouped" in f
        for f in exact_aggregates(
            df.groupBy("k").agg(F.expr("percentile(v, 0.5)"))
        )
    )
    # approx form: clean (the production path)
    assert not exact_aggregates(
        df.groupBy("k").agg(F.percentile_approx("v", 0.5, 1000))
    )
    # collect_list: flagged only in a GLOBAL aggregate
    assert any(
        "CollectList" in f
        for f in exact_aggregates(df.agg(F.collect_list("v")))
    )
    assert not exact_aggregates(df.groupBy("k").agg(F.collect_list("v")))
    # exact percentile as a WINDOW function: the same one-task buffer
    # wearing a Window node (the blind spot a review flagged) — caught
    from pyspark.sql.window import Window

    assert any(
        "Percentile" in f and "window" in f
        for f in exact_aggregates(
            df.withColumn(
                "p", F.expr("percentile(v, 0.5)").over(Window.partitionBy("k"))
            )
        )
    )
    # lint() surfaces rule 3 by default; the allowlist waiver drops it
    bad = df.agg(F.expr("percentile(v, 0.5)").alias("p"))
    assert any("EXACT AGGREGATE" in f for f in lint(bad))
    assert not lint(bad, allow_exact_aggregates=True)
    # the waiver is CLASS-scoped: granting Percentile does not grant a
    # global collect_list (an allowlisted query growing a new exact
    # aggregate still fails), and vice versa
    assert not lint(bad, allow_exact_aggregates=frozenset({"Percentile"}))
    assert any(
        "EXACT AGGREGATE" in f
        for f in lint(bad, allow_exact_aggregates=frozenset({"CollectList"}))
    )
    mixed = df.agg(
        F.expr("percentile(v, 0.5)").alias("p"), F.collect_list("v").alias("l")
    )
    assert any(
        "CollectList" in f
        for f in lint(mixed, allow_exact_aggregates=frozenset({"Percentile"}))
    )
    # ... but the waiver does NOT waive rules 1-2
    still_bad = spark.range(10).withColumn(
        "rk", F.row_number().over(Window.orderBy("id"))
    )
    assert any(
        "UNPARTITIONED WINDOW" in f
        for f in lint(still_bad, allow_exact_aggregates=True)
    )


def test_exact_agg_allowlist_names_real_registry_entries():
    """Every allowlist entry must name a query in the extended
    registry — a stale allowlist row is a silent waiver waiting for a
    name collision."""
    for name in EXACT_AGG_ALLOWLIST:
        assert name in QUERIES, f"allowlisted {name} is not in the registry"


def test_shuffle_shard_count_scaling_rule():
    """Pin ``shuffle_shards_for``: ~n/SHUFFLE_SHARD_ROWS clamped to
    [min, max], so per-shard write volume stays bounded as the corpus
    grows (a fixed 16-way split at 100 TB meant ~6 TB per-shard write
    partitions)."""
    from mysql2clickhouse_spark.plans.curation import (
        SHUFFLE_MAX_SHARDS,
        SHUFFLE_MIN_SHARDS,
        SHUFFLE_SHARD_ROWS,
        shuffle_shards_for,
    )

    # test-scale corpora clamp to the floor (bench continuity with the
    # old constant 16)
    assert shuffle_shards_for(0) == SHUFFLE_MIN_SHARDS
    assert shuffle_shards_for(5_000) == SHUFFLE_MIN_SHARDS
    # past the floor the count tracks the corpus linearly: per-shard
    # volume is pinned near SHUFFLE_SHARD_ROWS regardless of n
    for n in (10_000_000, 1_000_000_000, 10_000_000_000):
        shards = shuffle_shards_for(n)
        if shards < SHUFFLE_MAX_SHARDS:
            assert n / shards <= SHUFFLE_SHARD_ROWS
            assert n / shards > SHUFFLE_SHARD_ROWS / 2
    # monotone, and capped at the ceiling
    assert shuffle_shards_for(10**15) == SHUFFLE_MAX_SHARDS
    counts = [shuffle_shards_for(n) for n in range(0, 3_000_000, 97_000)]
    assert counts == sorted(counts)


def test_shuffle_shards_col_matches_int_form(spark):
    """The in-plan column form (lazy, what corpus_shuffle_order uses)
    and the int form (scripts/tests) must be the same arithmetic — a
    drift would silently re-permute the training order."""
    from pyspark.sql import functions as F

    from mysql2clickhouse_spark.plans.curation import (
        shuffle_shards_col,
        shuffle_shards_for,
    )

    ns = [0, 1, 5_000, 250_000, 250_001, 10_000_000, 10**12, 10**15]
    got = (
        spark.createDataFrame([(n,) for n in ns], "n bigint")
        .select("n", shuffle_shards_col(F.col("n")).alias("s"))
        .collect()
    )
    for row in got:
        assert row["s"] == shuffle_shards_for(row["n"]), row


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"r_name", "revenue", "n_items"}


def test_every_query_has_callable_and_contract():
    assert len(QUERIES) >= 30
    for name in ORACLES:
        assert name in QUERIES, f"oracle {name} lacks a query"


def test_driver_registry_is_curated_and_fully_oracled():
    """The driver records ~50 registry rows per round: the curated
    surface must fit, keep its declared priority order, and leave NO
    rows-only entries (every driver row is value-hash-checkable)."""
    core_q, core_o = all_queries(), all_oracles()
    assert len(core_q) <= 50
    assert tuple(core_q) == CORE_QUERY_KEYS
    assert set(core_q) == set(core_o), (
        "driver registry entries without an oracle: "
        f"{sorted(set(core_q) - set(core_o))}"
    )
    # every curated entry also exists in the extended set
    assert set(core_q) <= set(QUERIES)
