"""Planted-expectation tests for ``functions.text.substring_dedup``
(the exact-substring dedup core — Lee et al. 2021 ExactSubstr
semantics) on a handcrafted corpus where every removal is
hand-computable. The big-corpus value parity lives in the
``corpus_substring_dedup`` oracle row (plans/curation.py)."""

from __future__ import annotations

import hashlib

from mysql2clickhouse_spark.functions.text import substring_dedup

K = 4


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    return {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["kept_hash"])
        for r in substring_dedup(df, K).collect()
    }


def test_exact_copy_is_fully_removed_and_unique_doc_untouched(spark):
    a = "w1 w2 w3 w4 w5 w6"
    out = _run(spark, [(1, a), (2, a), (3, "x1 x2 x3 x4 x5")])
    # doc 1 is the first occurrence of every gram: untouched
    assert out[1] == (6, 0, _md5(a))
    # doc 2: every k-gram duplicated; the k-window covers every token
    assert out[2] == (6, 6, _md5(""))
    # doc 3 shares nothing: untouched
    assert out[3] == (5, 0, _md5("x1 x2 x3 x4 x5"))


def test_shared_prefix_span_removed_distinct_tail_kept(spark):
    out = _run(
        spark,
        [
            (1, "w1 w2 w3 w4 w5"),
            # first K tokens repeat doc 1's gram at s=1 (and s=2): the
            # covered tokens 1..5 go, the distinct tail survives
            (2, "w1 w2 w3 w4 w5 y1 y2 y3"),
        ],
    )
    assert out[1] == (5, 0, _md5("w1 w2 w3 w4 w5"))
    assert out[2] == (8, 5, _md5("y1 y2 y3"))


def test_interior_span_removed_both_flanks_kept(spark):
    out = _run(
        spark,
        [
            (1, "d1 d2 d3 d4"),
            # the duplicated gram sits strictly inside: only its k
            # tokens are cut, both flanks survive
            (2, "a1 a2 d1 d2 d3 d4 b1 b2"),
        ],
    )
    assert out[2] == (8, 4, _md5("a1 a2 b1 b2"))


def test_below_k_duplicates_are_kept_the_granularity_floor(spark):
    # K-1 shared tokens never form a k-gram: exact-substring dedup by
    # design keeps sub-threshold repeats (that's MinHash's job)
    out = _run(spark, [(1, "s1 s2 s3"), (2, "s1 s2 s3")])
    assert out[1] == (3, 0, _md5("s1 s2 s3"))
    assert out[2] == (3, 0, _md5("s1 s2 s3"))


def test_corpus_order_decides_the_survivor(spark):
    # same text, ids reversed in the input: the SMALLER doc_id is the
    # first occurrence regardless of arrival order
    a = "q1 q2 q3 q4"
    out = _run(spark, [(9, a), (4, a)])
    assert out[4] == (4, 0, _md5(a))
    assert out[9] == (4, 4, _md5(""))


def test_degenerate_docs_get_rows_not_nulls(spark):
    out = _run(spark, [(1, None), (2, ""), (3, "   "), (4, "ok doc here now")])
    for d in (1, 2, 3):
        assert out[d] == (0, 0, _md5(""))
    assert out[4] == (4, 0, _md5("ok doc here now"))


def test_intra_doc_repetition_is_also_cut(spark):
    # the duplicated occurrence can be in the SAME doc: the second
    # w1..w4 run starts at s=5, its first occurrence is s=1
    out = _run(spark, [(1, "w1 w2 w3 w4 w1 w2 w3 w4")])
    n_tokens, n_removed, kept = out[1]
    assert (n_tokens, n_removed) == (8, 4)
    assert kept == _md5("w1 w2 w3 w4")


def test_two_level_variant_is_row_identical(spark):
    """The hash-prefiltered exact pass must compute the IDENTICAL
    report — including the collision-shaped paths (unique grams that
    share a hash bucket can reach the exact pass but must never be
    marked duplicated; here every planted duplicate must still be)."""
    from mysql2clickhouse_spark.functions.text import (
        substring_dedup,
        substring_dedup_two_level,
    )

    rows = [
        (1, "a b c d e f g"),
        (2, "x a b c d y z"),          # interior span of doc 1
        (3, "a b c d e f g"),          # exact copy of doc 1
        (4, None),                      # degenerate
        (5, "p q r s t u v"),          # fully unique: pure n==1 path
        (6, "a b c d a b c d e"),      # within-doc repeat
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    base = sorted(tuple(r) for r in substring_dedup(df, 4).collect())
    two = sorted(tuple(r) for r in substring_dedup_two_level(df, 4).collect())
    assert two == base
