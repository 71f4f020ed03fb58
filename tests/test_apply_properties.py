"""Property-based invariants for the merge-mode apply (hypothesis).

The one-window ``apply_mutate`` replaces the reference's serialized
per-row mutations (binlog2sql_util.py:294-341); its correctness claim
is SERIAL EQUIVALENCE — for ANY interleaving of I/U/D events over any
key population, the window fold must land the same final state as a
row-at-a-time replay. The fixed-fixture test pins one interleaving;
these properties pin the claim itself.

Strategy notes: events carry (key, op, value); seq is the list index
(total order, unique — the changelog contract). The serial oracle is a
dict replay in Python. Examples are deliberately small (≤30 events,
≤6 keys) — the property space is about orderings, not volume, and each
example pays a Spark job.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mysql2clickhouse_spark.operators.apply import apply_mutate, merge_upsert

EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),           # key
        st.sampled_from(["I", "U", "D"]),                # op
        st.integers(min_value=-3, max_value=3),          # value
    ),
    min_size=1,
    max_size=30,
)


def _serial_replay(events):
    """Row-at-a-time oracle: dict state, last event wins, D removes."""
    state: dict[int, int] = {}
    for key, op, value in events:
        if op == "D":
            state.pop(key, None)
        else:
            state[key] = value
    return state


@given(EVENTS)
@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
def test_apply_mutate_serial_equivalence(spark, events):
    rows = [(k, op, i, v) for i, (k, op, v) in enumerate(events)]
    cl = spark.createDataFrame(rows, "key int, op string, seq long, value int")
    got = {r.key: r.value for r in apply_mutate(cl, ["key"]).collect()}
    assert got == _serial_replay(events)


@given(EVENTS, EVENTS)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_batched_fold_equals_one_fold(spark, first, second):
    """Micro-batch boundaries are invisible: folding batch1 then
    merge-upserting batch2's fold (with its deletes applied) equals
    folding the concatenation — the invariant that lets the runner cut
    batches anywhere (B4 budgets) without changing final state."""
    all_events = first + second
    rows = [(k, op, i, v) for i, (k, op, v) in enumerate(all_events)]
    cl = spark.createDataFrame(rows, "key int, op string, seq long, value int")
    whole = {r.key: r.value for r in apply_mutate(cl, ["key"]).collect()}

    b1 = cl.filter(f"seq < {len(first)}")
    b2 = cl.filter(f"seq >= {len(first)}")
    state1 = apply_mutate(b1, ["key"])
    # batch2 fold, keeping the terminal-DELETE marker to subtract keys
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("key").orderBy(F.col("seq").desc())
    last2 = cl.filter(f"seq >= {len(first)}").withColumn(
        "rn", F.row_number().over(w)
    ).filter("rn = 1")
    upserts = last2.filter("op <> 'D'").drop("rn", "op")
    deletes = last2.filter("op = 'D'").select("key")
    merged = merge_upsert(state1, upserts, ["key"]).join(deletes, "key", "left_anti")
    got = {r.key: r.value for r in merged.collect()}
    assert got == whole
