"""Plan-shape lint: scale anti-patterns detectable on the plan before
execution, cheap enough to run against every registered query.

Rule 1: NO unpartitioned Window. A window with an empty partition spec
ships the entire input into ONE task — the single-partition sort Spark
itself warns about ("No Partition Defined for Window operation"), and
the one plan shape that cannot survive a 100 TB input no matter how
the cluster is sized. There is no blessed escape hatch: a constant
partition key is folded away by the optimizer (checked:
``partitionBy(lit(0))`` reaches WindowExec with an empty spec), so
even bounded frames must express total-order logic through
joins/aggregates (see ``corpus_export_shards``'s overlap self-join) or
partition by a real column.

Rule 2: NO shuffled cartesian product. ``CartesianProductExec``
materializes |left|×|right| with BOTH sides shuffled — the only
acceptable cross-join shape at scale is a broadcast nested-loop whose
build side is provably small (the 1-row stat frames and the
documented brute-force certification twins all compile to
BroadcastNestedLoopJoin). This one walks the PHYSICAL plan (still no
execution — ``sparkPlan`` is planned, not run).

``scripts/check_parity.py`` and the pytest oracle loop run both rules
on every extended-registry query right after building its frame;
``test_plan_shapes.py`` pins the detectors themselves plus the
headline window queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _walk(node, hit) -> None:
    hit(node)
    kids = node.children()
    for i in range(kids.size()):
        _walk(kids.apply(i), hit)


def unpartitioned_windows(df: DataFrame) -> list[str]:
    """Names of Window nodes with an EMPTY partition spec anywhere in
    the optimized logical plan (JVM tree walk — no execution, no job).
    Returns [] for a clean plan."""
    bad: list[str] = []

    def check(node) -> None:
        if (
            node.getClass().getSimpleName() == "Window"
            and node.partitionSpec().isEmpty()
        ):
            bad.append(node.simpleString(200))

    _walk(df._jdf.queryExecution().optimizedPlan(), check)
    return bad


def cartesian_products(df: DataFrame) -> list[str]:
    """Names of CartesianProduct nodes anywhere in the planned PHYSICAL
    tree (``sparkPlan`` — planned, never executed; AQE may later
    broadcast-demote a shuffled join but never rescues a cartesian
    product). Returns [] for a clean plan; broadcast nested-loop joins
    are allowed — their build side is bounded by the broadcast
    threshold."""
    bad: list[str] = []

    def check(node) -> None:
        if node.getClass().getSimpleName().startswith("CartesianProduct"):
            bad.append(node.simpleString(200))

    _walk(df._jdf.queryExecution().sparkPlan(), check)
    return bad


def lint(df: DataFrame) -> list[str]:
    """All plan-lint findings for a frame (empty = clean)."""
    return [
        f"UNPARTITIONED WINDOW: {s}" for s in unpartitioned_windows(df)
    ] + [f"CARTESIAN PRODUCT: {s}" for s in cartesian_products(df)]
