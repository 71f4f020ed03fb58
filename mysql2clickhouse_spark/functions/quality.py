"""Repetition / composition quality filters (the Gopher rules family).

The pre-training filters from Rae et al. 2021 (Gopher, §A1.1) and the
C4 pipeline: documents dominated by repeated tokens/n-grams, extreme
token counts, or symbol noise are dropped before training. All metrics
here are pure native column expressions over one scan — per-row
arithmetic on token arrays, no shuffle, no UDF — so at 100 TB the whole
filter pass rides inside whole-stage codegen during the parquet scan.

Every formula is deliberately ANSI-SQL-expressible (DuckDB list
functions mirror the array ops one-to-one) so the driver value-hashes
the full metric set; see plans/quality.py.

The one repetition metric that genuinely needs an aggregation — the
most-frequent-2-gram character fraction — lives in plans/quality.py as
an explode + groupBy query (two narrow shuffles), not here: per-row
mode-of-array would be O(len²) inside the row, which is the wrong side
of the scan/shuffle trade at scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .text import token_ngrams_col, tokens_col

#: Gopher-style gates (adapted to the synthetic corpus' token range —
#: the REAL Gopher bounds are 50..100k words; the corpus p5 is ~25
#: tokens, so the low gate sits at 30 to keep the filter discriminative)
GOPHER_MIN_TOKENS = 30
GOPHER_MAX_TOKENS = 100_000
GOPHER_MIN_MEAN_TOKEN_LEN = 2.0
GOPHER_MAX_MEAN_TOKEN_LEN = 12.0
GOPHER_MAX_DUP_2GRAM_FRAC = 0.60
GOPHER_MAX_SYMBOL_RATIO = 0.10


def dup_token_frac_col(tokens: Column) -> Column:
    """Fraction of token occurrences that are repeats of an earlier
    token: ``1 - |distinct| / |tokens|``. 0 for the empty doc."""
    n = F.size(tokens)
    return F.when(
        n > 0, F.lit(1.0) - F.size(F.array_distinct(tokens)) / n.cast("double")
    ).otherwise(F.lit(0.0))


def dup_ngram_frac_col(tokens: Column, n: int) -> Column:
    """Fraction of n-gram occurrences that are duplicates — the Gopher
    "duplicate n-grams" family on the token stream. Docs with < n
    tokens have no n-grams and score 0."""
    grams = token_ngrams_col(tokens, n)
    total = F.size(grams)
    return F.when(
        total > 0,
        F.lit(1.0) - F.size(F.array_distinct(grams)) / total.cast("double"),
    ).otherwise(F.lit(0.0))


#: non-alphanumeric, non-space characters — Java regex and RE2 read
#: this class identically
SYMBOL_RE = r"[^a-z0-9\s]"


def symbol_ratio_col(text: Column) -> Column:
    """Symbol characters per character of text (C4's symbol screen —
    hash-heavy / markup-heavy docs spike here). 0 for the empty doc."""
    n = F.length(text)
    return F.when(
        n > 0,
        F.regexp_count(F.lower(text), F.lit(SYMBOL_RE)).cast("double") / n,
    ).otherwise(F.lit(0.0))


def mean_token_len_col(tokens: Column) -> Column:
    """Mean characters per token (Gopher keeps 3..10 on real text):
    total token chars / token count over the split array."""
    n = F.size(tokens)
    total = F.aggregate(
        tokens, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
    )
    return F.when(n > 0, total.cast("double") / n).otherwise(F.lit(0.0))


def gopher_metrics(text: Column) -> dict[str, Column]:
    """The full per-doc metric set + the composite ``gopher_keep`` gate.
    One tokens array feeds every metric — Catalyst collapses the shared
    subexpression, so the scan materializes the split exactly once."""
    toks = tokens_col(text)
    n_tokens = F.size(toks).cast("bigint")
    mean_len = mean_token_len_col(toks)
    dup_tok = dup_token_frac_col(toks)
    dup_2g = dup_ngram_frac_col(toks, 2)
    sym = symbol_ratio_col(text)
    keep = (
        (n_tokens >= GOPHER_MIN_TOKENS)
        & (n_tokens <= GOPHER_MAX_TOKENS)
        & (mean_len >= GOPHER_MIN_MEAN_TOKEN_LEN)
        & (mean_len <= GOPHER_MAX_MEAN_TOKEN_LEN)
        & (dup_2g <= GOPHER_MAX_DUP_2GRAM_FRAC)
        & (sym <= GOPHER_MAX_SYMBOL_RATIO)
    )
    return {
        "n_tokens": n_tokens,
        "mean_token_len": F.round(mean_len, 4),
        "dup_token_frac": F.round(dup_tok, 4),
        "dup_2gram_frac": F.round(dup_2g, 4),
        "symbol_ratio": F.round(sym, 4),
        "gopher_keep": keep,
    }
