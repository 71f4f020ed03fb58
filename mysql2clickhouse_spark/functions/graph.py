"""Distributed graph primitives for corpus curation.

``connected_components`` turns a near-dup PAIR list (the output of
MinHash-LSH / SimHash / embedding-cosine dedup) into CLUSTERS — the
step a production dedup pipeline runs last, keeping one canonical
document per component. The reference has no graph surface (its dedup
is per-key latest-version, SURVEY §2.5 Q1-Q3); this is a north-star
extension on the same footing as the pair miners it consumes.

Algorithm: iterative min-label propagation with pointer jumping
(Hash-to-Min family, Rastogi et al., ICDE'13). Each round is two
narrow shuffles:

1. neighbor-min: every node takes the min label over itself and its
   neighbors (one edge join + groupBy-min — partial aggregation
   combines map-side, so the shuffle carries one row per node);
2. pointer jump: ``lbl := lbl(lbl)`` (one self-join on the label
   table), which doubles the propagation horizon and brings rounds to
   O(log d) on diameter-d components instead of O(d).

Convergence is checked with a single count of changed labels per
round; each round's result is ``localCheckpoint``-ed so the plan stays
O(1) deep instead of growing a join pyramid (the classic iterative-
algorithm lineage blow-up).

Scale: rounds = O(log d); real near-dup graphs have tiny diameters
(dup clusters are dense), so 3-5 rounds is typical at any corpus size.
State per round is one (node, lbl) table — linear in nodes — and the
edge table is re-read from its persisted form each round, never
recomputed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_rounds: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; the
    component id is the component's minimum node id. Isolated nodes
    (no edges) don't appear — union them back as singletons if needed.
    """
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = sym.union(
        sym.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).persist()
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_rounds):
        # 1. neighbor-min (self included via the left join + least)
        nbr = (
            sym.join(labels, sym["v"] == labels["node"])
            .groupBy(F.col("u").alias("node"))
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        stepped = labels.join(nbr, "node", "left").select(
            "node", F.least("lbl", F.coalesce("nbr_lbl", "lbl")).alias("lbl")
        )
        # 2. pointer jump: follow the label one hop (lbl := lbl(lbl))
        ptr = stepped.select(F.col("node").alias("p_node"), F.col("lbl").alias("p_lbl"))
        jumped = (
            stepped.join(ptr, stepped["lbl"] == ptr["p_node"], "left")
            .select("node", F.coalesce("p_lbl", "lbl").alias("lbl"))
            .localCheckpoint()  # truncate lineage; also the round's action
        )
        changed = (
            jumped.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .count()
        )
        labels = jumped
        if changed == 0:
            break
    sym.unpersist()
    return labels.select("node", F.col("lbl").alias("component"))


def cluster_summary(
    components: DataFrame,
    node_col: str = "node",
    component_col: str = "component",
) -> DataFrame:
    """Per-cluster rollup: (rep_id = component min, n_members). The
    canonical-doc selection of a dedup pipeline reads straight off this
    (keep ``rep_id``, drop the other ``n_members - 1``)."""
    return components.groupBy(F.col(component_col).alias("rep_id")).agg(
        F.count(F.lit(1)).alias("n_members")
    )
