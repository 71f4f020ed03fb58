"""Plan-shape lint: scale anti-patterns detectable on the OPTIMIZED
logical plan, cheap enough to run against every registered query.

The first (and currently only) rule: NO unpartitioned Window. A window
with an empty partition spec ships the entire input into ONE task — the
single-partition sort Spark itself warns about ("No Partition Defined
for Window operation"), and the one plan shape that cannot survive a
100 TB input no matter how the cluster is sized. There is no blessed
escape hatch: a constant partition key is folded away by the optimizer
(checked: ``partitionBy(lit(0))`` reaches WindowExec with an empty
spec), so even bounded frames must express total-order logic through
joins/aggregates (see ``corpus_export_shards``'s overlap self-join) or
partition by a real column.

``scripts/check_parity.py`` runs the lint on every extended-registry
query right after building its frame; ``test_plan_shapes.py`` pins the
detector itself plus the headline window queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def unpartitioned_windows(df: DataFrame) -> list[str]:
    """Names of Window nodes with an EMPTY partition spec anywhere in
    the optimized logical plan (JVM tree walk — no execution, no job).
    Returns [] for a clean plan."""
    bad: list[str] = []

    def walk(node) -> None:
        if (
            node.getClass().getSimpleName() == "Window"
            and node.partitionSpec().isEmpty()
        ):
            bad.append(node.simpleString(200))
        kids = node.children()
        for i in range(kids.size()):
            walk(kids.apply(i))

    walk(df._jdf.queryExecution().optimizedPlan())
    return bad
