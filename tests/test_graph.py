"""Property-based check of the distributed connected-components
operator against a sequential union-find oracle: on arbitrary edge
lists the min-label + pointer-jumping rounds must recover exactly the
same partition (same components, min-id representatives)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mysql2clickhouse_spark.functions.graph import cluster_summary, connected_components


def _union_find(edges):
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    comp: dict[int, int] = {}
    for n in parent:
        comp[n] = find(n)
    return comp


edge_lists = st.lists(
    st.tuples(st.integers(0, 40), st.integers(0, 40)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=60,
)


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(edges=edge_lists)
def test_cc_matches_union_find(spark, edges):
    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df, "id_a", "id_b").collect()
    }
    want = _union_find(edges)
    assert got == want


def test_cluster_summary_counts(spark):
    edges = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)]
    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    comp = connected_components(df, "id_a", "id_b")
    sizes = {
        r["rep_id"]: r["n_members"] for r in cluster_summary(comp).collect()
    }
    assert sizes == {1: 3, 10: 2, 20: 4}


def test_cc_long_chain_converges_in_log_rounds(spark):
    """Pointer jumping must close a 40-node path (diameter 39) inside
    the default round budget — linear label propagation would need 39
    rounds and time out the budget."""
    edges = [(i, i + 1) for i in range(40)]
    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    comp = connected_components(df, "id_a", "id_b", max_rounds=10)
    assert {r["component"] for r in comp.collect()} == {0}
