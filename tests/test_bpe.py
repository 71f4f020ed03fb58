"""Distributed BPE training (functions/bpe.py) vs a pure-Python
reference implementation of Sennrich's algorithm — merge sequences must
match EXACTLY (same pair stats, same count-then-lexicographic
tie-break, same greedy left-to-right in-word merging)."""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F

from mysql2clickhouse_spark.functions.bpe import (
    END_WORD,
    tokenize_counts,
    train_bpe,
    word_counts,
)
from mysql2clickhouse_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _reference_bpe(word_freqs: dict[str, int], n_merges: int, min_count: int = 2):
    """Sennrich et al. 2016, verbatim semantics."""
    vocab = {" ".join(list(w) + [END_WORD]): n for w, n in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        stats: Counter = Counter()
        for spaced, n in vocab.items():
            syms = spaced.split(" ")
            for a, b in zip(syms, syms[1:]):
                stats[(a, b)] += n
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_count:
            break
        (a, b) = best[0]
        merges.append((a, b))
        pat = re.compile(r"(?<!\S)" + re.escape(a) + " " + re.escape(b) + r"(?!\S)")
        vocab = {pat.sub(a + b, s): n for s, n in vocab.items()}
    return merges, vocab


def test_bpe_merges_match_reference_exactly(spark):
    docs = load_table(spark, SF, "documents").limit(80)
    freqs = {
        r["word"]: r["n"] for r in word_counts(docs).collect()
    }
    ref_merges, ref_vocab = _reference_bpe(freqs, n_merges=40)
    merges, vocab = train_bpe(docs, n_merges=40)
    assert merges == ref_merges
    got = {r["spaced"]: r["n"] for r in vocab.collect()}
    assert got == ref_vocab
    vocab.unpersist()


def test_bpe_handles_regex_special_words(spark):
    docs = spark.createDataFrame(
        [(1, "a+b a+b a+b (x) (x) $$ $$"), (2, "a+b (x) $$"), (3, None)],
        "doc_id bigint, text string",
    )
    freqs = {r["word"]: r["n"] for r in word_counts(docs).collect()}
    ref_merges, _ = _reference_bpe(freqs, n_merges=10)
    merges, vocab = train_bpe(docs, n_merges=10)
    assert merges == ref_merges
    vocab.unpersist()


def test_tokenize_counts_bounds_and_compression(spark):
    docs = load_table(spark, SF, "documents").limit(80)
    merges, vocab = train_bpe(docs, n_merges=40)
    out = tokenize_counts(docs, vocab).collect()
    assert len(out) == docs.count()
    base = {
        r["word"]: r["n"] for r in word_counts(docs).collect()
    }
    total_chars_plus_marker = sum((len(w) + 1) * n for w, n in base.items())
    total_words = sum(base.values())
    n_sub = sum(r["n_subwords"] for r in out)
    n_words = sum(r["n_words"] for r in out)
    assert n_words == total_words
    # every word is >= 1 token; merges can only shrink the symbol count
    assert total_words <= n_sub < total_chars_plus_marker
    vocab.unpersist()


def test_encode_docs_roundtrip_and_token_stream(spark):
    """encode_docs: the emitted token stream is order-correct, the
    decode byte-equals the canonical text, and token counts agree with
    tokenize_counts."""
    from mysql2clickhouse_spark.functions.bpe import encode_docs

    rows = [
        (1, "low lower  Lowest low"),      # double space collapses
        (2, None),                          # null text -> empty roundtrip
        (3, "   "),                         # whitespace-only
        (4, "new newer low"),
    ]
    d = spark.createDataFrame(rows, "doc_id bigint, text string")
    merges, vocab = train_bpe(d, n_merges=10, min_count=2)
    enc = {r["doc_id"]: r for r in encode_docs(d, vocab).collect()}

    assert enc[1]["roundtrip_text"] == "low lower lowest low"
    assert enc[2]["roundtrip_text"] == "" and enc[2]["n_tokens"] == 0
    assert enc[3]["roundtrip_text"] == "" and enc[3]["n_words"] == 0
    assert enc[4]["roundtrip_text"] == "new newer low"

    # token stream concatenates back to word+</w> per word, in order
    toks = enc[1]["tokens"]
    joined = "".join(toks)
    assert joined == "low</w>lower</w>lowest</w>low</w>"
    # and counts line up with tokenize_counts
    tc = {r["doc_id"]: r for r in tokenize_counts(d, vocab).collect()}
    for i in (1, 4):
        assert enc[i]["n_tokens"] == tc[i]["n_subwords"]
        assert enc[i]["n_words"] == tc[i]["n_words"]
