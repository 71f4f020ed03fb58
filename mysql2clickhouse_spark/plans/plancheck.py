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

Rule 3: NO exact unbounded-buffer aggregate outside the allowlisted
certification twins. Two shapes:

* exact ``percentile``/``median`` (JVM classes ``Percentile``,
  ``Median``) ANYWHERE — grouped, global, or as a WINDOW function
  (``.over(partitionBy(k))`` buffers every partition value in one task
  just like the grouped aggregate). The exact form buffers every
  value of its group in one task's OpenHashMap before sorting; grouping
  by a low-cardinality key (``event_type``: 5 groups) does not save it
  — at 100 TB that is ~20 TB of doubles in one aggregation buffer. The
  production path is always ``percentile_approx`` (Greenwald-Khanna /
  t-digest: mergeable, bounded memory); the exact form is only
  admissible as a certification twin that bounds the sketch's error at
  test scale.
* ``collect_list``/``collect_set`` in a GLOBAL (ungrouped) aggregate —
  one task buffers the whole input. Grouped collects are NOT flagged:
  per-entity arrays bounded by group payload (tokens per doc, events
  per user, docs per shard) are the standard Spark pattern and their
  bound is the operator author's documented responsibility.

Queries that legitimately carry these shapes must be named in
``EXACT_AGG_ALLOWLIST`` below with a justification AND the specific
aggregate classes being waived; the callers pass
``allow_exact_aggregates=EXACT_AGG_ALLOWLIST.get(name, frozenset())``
so an un-allowlisted exact aggregate — including a NEW class sneaking
into an already-allowlisted query — fails CI, not review.

Rule 4: NO row-at-a-time Python UDF (``BatchEvalPythonExec``). The
row form pickles one row per crossing — the 10-100× slow path; every
Python crossing in this engine is Arrow-batched (``pandas_udf`` /
``mapInPandas`` / ``applyInPandas[WithState]``, which plan as
``ArrowEvalPython``/``MapInPandas``/``FlatMapGroupsInPandas`` nodes,
all allowed). No allowlist: no registered query has ever needed the
row form, so one appearing is a regression by definition.

``scripts/check_parity.py`` and the pytest oracle loop run all four
rules on every extended-registry query right after building its frame;
``test_plan_shapes.py`` pins the detectors themselves plus the
headline window queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def row_python_udfs(df: DataFrame) -> list[str]:
    """Rule 4: NO row-at-a-time Python UDF anywhere in the planned
    physical tree. ``BatchEvalPythonExec`` ships rows to the Python
    worker one pickled row at a time — the 10-100× slow path the
    Arrow-vectorized forms exist to avoid. Every Python crossing in
    this engine is Arrow-batched (``ArrowEvalPythonExec``,
    ``MapInPandasExec``, ``FlatMapGroupsInPandasExec``,
    ``ApplyInPandasWithState``) — all allowed; there is no allowlist
    for the row form because no registered query has ever needed it,
    and one sneaking in should fail CI, not review."""
    bad: list[str] = []

    def check(node) -> None:
        if node.getClass().getSimpleName().startswith("BatchEvalPython"):
            bad.append(node.simpleString(200))

    _walk(df._jdf.queryExecution().sparkPlan(), check)
    return bad


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


#: Exact sort-buffer aggregate functions: buffer EVERY group value
#: before a sort — never mergeable, never bounded. Flagged wherever
#: they appear (rule 3 docstring has the why).
_EXACT_SORT_AGGS = frozenset({"Percentile", "Median"})

#: Exact array-buffer aggregates: flagged only in a GLOBAL aggregate
#: (empty grouping = whole input in one task's buffer).
_EXACT_BUFFER_AGGS = frozenset({"CollectList", "CollectSet"})

#: Registry entries allowed to carry rule-3 shapes, each with its
#: documented reason. Everything here is either a certification twin
#: (exists to bound a sketch's error at test scale, never the
#: production path) or a collect whose input is provably schema-bounded.
EXACT_AGG_ALLOWLIST: dict[str, frozenset[str]] = {
    # exact-interpolation percentile threshold: the documented
    # certification twin of the percentile_approx quality gate
    # (plans/curation.py corpus_quality_gate_exact docstring)
    "corpus_quality_gate_exact": frozenset({"Percentile"}),
    # sketch-family exact twins: each emits the exact value DuckDB
    # reproduces plus a bounded-error flag for the sketch estimate
    "events_approx_profile": frozenset({"Percentile"}),
    "events_quantile_sketch": frozenset({"Percentile"}),
    "events_value_percentiles": frozenset({"Percentile"}),
    # sketch_suite folds the three twins above into tagged rows
    "sketch_suite": frozenset({"Percentile"}),
    # the dual-dialect literal-SQL corpus embeds the SAME sketch
    # twins as Spark-dialect statements (sql_corpus.py
    # events_approx_profile / events_value_percentiles), so their
    # exact percentiles surface in its union plan — same twins,
    # same justification
    "sql_corpus_parity": frozenset({"Percentile"}),
    # ungrouped collect of the 64-row per-DIMENSION stats frame —
    # bounded by embedding dimensionality (schema), not corpus size
    # (plans/extensions.py embedding_standardize)
    "embedding_standardize": frozenset({"CollectList"}),
}


def exact_aggregates(df: DataFrame) -> list[str]:
    """Rule-3 findings: exact ``Percentile``/``Median`` anywhere, and
    ``CollectList``/``CollectSet`` inside a GLOBAL (ungrouped)
    Aggregate, in the optimized logical plan (JVM tree walk — no
    execution, no job). Returns [] for a clean plan. Each finding
    string LEADS with the JVM class name — the scoped allowlist keys
    off that first token.

    Sort-buffer aggregates are also flagged inside WINDOW expressions
    (``percentile(...).over(partitionBy(k))`` buffers every partition
    value in one task — the same failure mode wearing a Window node).
    Known boundary: plans nested inside scalar-subquery expressions are
    not traversed (``children()`` does not descend into them); none of
    the registry's builders emit subqueries — the DataFrame API has no
    spelling for them — so the boundary is theoretical until someone
    hand-writes one in ``spark.sql``."""
    bad: list[str] = []

    def check(node) -> None:
        kind = node.getClass().getSimpleName()
        if kind == "Aggregate":
            is_global = node.groupingExpressions().isEmpty()
            aggs = node.aggregateExpressions()
            for i in range(aggs.size()):
                _walk(
                    aggs.apply(i),
                    lambda e: _check_agg_expr(e, is_global, bad),
                )
        elif kind == "Window":
            wexprs = node.windowExpressions()
            for i in range(wexprs.size()):
                _walk(
                    wexprs.apply(i),
                    lambda e: _check_window_expr(e, bad),
                )

    _walk(df._jdf.queryExecution().optimizedPlan(), check)
    return bad


def _check_agg_expr(expr, is_global: bool, bad: list[str]) -> None:
    name = expr.getClass().getSimpleName()
    if name in _EXACT_SORT_AGGS:
        scope = "global" if is_global else "grouped"
        bad.append(f"{name} ({scope} exact sort-buffer): {expr.simpleString(200)}")
    elif is_global and name in _EXACT_BUFFER_AGGS:
        bad.append(f"{name} (global array-buffer): {expr.simpleString(200)}")


def _check_window_expr(expr, bad: list[str]) -> None:
    name = expr.getClass().getSimpleName()
    if name in _EXACT_SORT_AGGS:
        bad.append(f"{name} (window exact sort-buffer): {expr.simpleString(200)}")


def lint(
    df: DataFrame,
    allow_exact_aggregates: bool | frozenset[str] | set[str] = frozenset(),
) -> list[str]:
    """All plan-lint findings for a frame (empty = clean).

    ``allow_exact_aggregates`` waives rule 3 only, and only for the
    NAMED aggregate classes: callers pass
    ``EXACT_AGG_ALLOWLIST.get(name, frozenset())`` so the waiver is a
    per-query, per-class reviewed grant — an allowlisted query that
    grows a NEW kind of exact aggregate (e.g. a global collect_list in
    a percentile-twin suite) still fails CI. ``True`` waives every
    rule-3 class (gate self-tests only)."""
    findings = (
        [f"UNPARTITIONED WINDOW: {s}" for s in unpartitioned_windows(df)]
        + [f"CARTESIAN PRODUCT: {s}" for s in cartesian_products(df)]
        + [f"ROW PYTHON UDF: {s}" for s in row_python_udfs(df)]
    )
    if allow_exact_aggregates is True:
        return findings
    allowed = allow_exact_aggregates or frozenset()
    findings += [
        f"EXACT AGGREGATE: {s}"
        for s in exact_aggregates(df)
        if s.split(" ", 1)[0] not in allowed
    ]
    return findings
