"""PII detection / redaction as native regex column expressions.

A training-data pipeline screens documents for personally identifying
information before anything ships: emails, IPv4 addresses, phone
numbers. Here detection is ``regexp_count`` and redaction is chained
``regexp_replace`` with typed placeholder tokens — all JVM-side regex
inside the scan stage, no UDF, so the pass costs one projection at any
corpus size.

Pattern dialect: the patterns use only character classes, bounded
quantifiers and ``\\b`` word boundaries — the subset Java regex (Spark)
and RE2 (DuckDB) evaluate identically — so the whole redaction pass is
oracle-checkable (plans/quality.py ``text_pii_redact``). No lookarounds,
no backreferences (RE2 has neither).

Order matters: IPv4 must redact before PHONE (a dotted quad is a run of
digits a loose phone pattern would also hit); EMAIL before PHONE for
digit-heavy local parts. ``redact_pii_col`` applies EMAIL → IPV4 →
PHONE.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (name, pattern, replacement) in application order
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    (
        "ipv4",
        r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
        "<IP>",
    ),
    # 7+ digits with optional separators, anchored on digits both ends:
    # catches 202-555-0134 / +1 202 555 0134 without eating plain words
    ("phone", r"\+?[0-9][0-9() \-]{6,}[0-9]\b", "<PHONE>"),
)


def pii_count_cols(text: Column) -> dict[str, Column]:
    """Per-type match counts on the RAW text (before any redaction), as
    ``n_<type>`` columns. Counting before redacting keeps the three
    counters independent of application order."""
    return {
        f"n_{name}": F.regexp_count(text, F.lit(pat)).cast("bigint")
        for name, pat, _ in PII_PATTERNS
    }


def redact_pii_col(text: Column) -> Column:
    """Text with every PII match replaced by its typed placeholder,
    applied in PII_PATTERNS order (email → ipv4 → phone)."""
    out = text
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out
