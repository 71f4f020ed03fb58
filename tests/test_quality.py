"""Invariant tests for the quality-gate function modules
(functions/quality.py, functions/pii.py) beyond the oracle parity the
driver already checks: idempotence, bounds, and internal consistency
that no value-hash can express."""

from __future__ import annotations

from pyspark.sql import functions as F

from mysql2clickhouse_spark.functions.pii import (
    PII_PATTERNS,
    pii_count_cols,
    redact_pii_col,
)
from mysql2clickhouse_spark.functions.quality import (
    GOPHER_MAX_DUP_2GRAM_FRAC,
    GOPHER_MAX_MEAN_TOKEN_LEN,
    GOPHER_MAX_SYMBOL_RATIO,
    GOPHER_MIN_MEAN_TOKEN_LEN,
    GOPHER_MIN_TOKENS,
    gopher_metrics,
)
from mysql2clickhouse_spark.plans.quality import _planted_pii


def test_redaction_is_idempotent_and_complete(spark, sf_dir):
    """redact(redact(x)) == redact(x), and no pattern matches survive in
    the redacted text — placeholders must not themselves re-match."""
    p = _planted_pii(spark, sf_dir)
    once = p.select("doc_id", redact_pii_col(F.col("text")).alias("text"))
    twice = once.select("doc_id", redact_pii_col(F.col("text")).alias("text"))
    assert once.exceptAll(twice).count() == 0
    assert twice.exceptAll(once).count() == 0
    leftover = once
    for name, pat, _ in PII_PATTERNS:
        leftover = leftover.filter(F.regexp_count("text", F.lit(pat)) > 0)
    assert leftover.count() == 0


def test_planted_pii_is_detected_per_slot(spark, sf_dir):
    """Every doc in an email/ip/phone slot counts >= 1 of its type, and
    slot-free docs count zero of everything."""
    p = _planted_pii(spark, sf_dir)
    counts = p.select(
        "doc_id", *[c.alias(k) for k, c in pii_count_cols(F.col("text")).items()]
    )
    mod = F.pmod(F.col("doc_id"), F.lit(7))
    assert counts.filter((mod == 3) & (F.col("n_email") == 0)).count() == 0
    assert counts.filter((mod == 5) & (F.col("n_ipv4") == 0)).count() == 0
    assert counts.filter((mod == 1) & (F.col("n_phone") == 0)).count() == 0
    clean = counts.filter(~mod.isin(1, 3, 5))
    assert (
        clean.filter(
            (F.col("n_email") + F.col("n_ipv4") + F.col("n_phone")) > 0
        ).count()
        == 0
    )


def test_gopher_metrics_bounds_and_gate_consistency(spark, sf_dir):
    """Fractions live in [0, 1]; the keep flag equals re-evaluating the
    gate from the emitted metrics (no hidden inputs)."""
    from mysql2clickhouse_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    m = gopher_metrics(F.col("text"))
    rows = d.select(
        "doc_id", *[c.alias(k) for k, c in m.items()]
    ).collect()
    assert rows
    for r in rows:
        for frac in ("dup_token_frac", "dup_2gram_frac", "symbol_ratio"):
            assert 0.0 <= r[frac] <= 1.0, (r["doc_id"], frac, r[frac])
        expected = (
            GOPHER_MIN_TOKENS <= r["n_tokens"] <= 100_000
            and GOPHER_MIN_MEAN_TOKEN_LEN
            <= r["mean_token_len"]
            <= GOPHER_MAX_MEAN_TOKEN_LEN
            and r["dup_2gram_frac"] <= GOPHER_MAX_DUP_2GRAM_FRAC
            and r["symbol_ratio"] <= GOPHER_MAX_SYMBOL_RATIO
        )
        assert r["gopher_keep"] == expected, r


def test_gopher_degenerate_docs(spark):
    """Empty / whitespace / single-token docs score 0 on every fraction
    and fail the keep gate (too few tokens) instead of erroring."""
    d = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "word"), (4, "a b")], "doc_id int, text string"
    )
    m = gopher_metrics(F.col("text"))
    rows = {r["doc_id"]: r for r in d.select("doc_id", *[c.alias(k) for k, c in m.items()]).collect()}
    for i in (1, 2, 3, 4):
        assert rows[i]["dup_2gram_frac"] == 0.0
        assert not rows[i]["gopher_keep"]
    assert rows[1]["n_tokens"] == 0 and rows[3]["n_tokens"] == 1
