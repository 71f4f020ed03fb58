"""Property tests for the rewritten expression kernels (hypothesis).

``token_ngrams_col`` (n-1 zip_with passes over shifted slices) and
``unit_vec_col`` (array_repeat-carried norm) were rewritten for the
once-per-row evaluation contract; these pin their VALUES against plain
Python references over adversarial inputs — empty docs, single tokens,
repeated tokens, short-of-n arrays, zero vectors — independent of the
DuckDB oracles (which only see fixture-shaped data)."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mysql2clickhouse_spark.functions.similarity import unit_vec_col
from mysql2clickhouse_spark.functions.text import token_ngrams_col

TOKENS = st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=4), min_size=0, max_size=12
)
VEC = st.lists(
    st.floats(
        min_value=-100, max_value=100, allow_nan=False, allow_infinity=False
    ),
    min_size=1,
    max_size=8,
)


def _py_ngrams(tokens: list[str], n: int) -> list[str]:
    if len(tokens) < n:
        return []
    return [" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]


@given(st.lists(TOKENS, min_size=1, max_size=6), st.integers(min_value=2, max_value=5))
@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
def test_token_ngrams_matches_python_reference(spark, docs, n):
    # tokens may contain spaces/empties from the strategy — that's the
    # point: the kernel must treat the ARRAY as given, not re-tokenize
    rows = [(i, toks) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id int, toks array<string>")
    got = {
        r["doc_id"]: r["g"]
        for r in df.select(
            "doc_id", token_ngrams_col(F.col("toks"), n).alias("g")
        ).collect()
    }
    for i, toks in rows:
        assert got[i] == _py_ngrams(toks, n), (toks, n, got[i])


@given(st.lists(VEC, min_size=1, max_size=6))
@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
def test_unit_vec_matches_python_reference(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id int, v array<double>")
    got = {
        r["vec_id"]: r["u"]
        for r in df.select("vec_id", unit_vec_col(F.col("v")).alias("u")).collect()
    }
    for i, v in rows:
        n = math.sqrt(sum(x * x for x in v))
        exp = [x / n for x in v] if n > 0 else list(v)  # zero-norm passthrough
        assert got[i] == exp, (v, got[i], exp)
