"""Distributed BPE tokenizer training — byte-pair-encoding merges
learned from the corpus (Sennrich et al., ACL 2016), the tokenizer-
training stage of an LLM data pipeline.

Scale shape (the part that matters at 100 TB): the corpus is scanned
EXACTLY ONCE, to build the word-frequency table — a map-side-combined
``explode(split) → groupBy(word)`` whose result is VOCABULARY-sized
(bounded by language, not by corpus bytes). Every training iteration
then runs against that small cached table: one pair-count aggregation,
one driver argmax (a 1-row TakeOrdered — control plane), one
``regexp_replace`` projection. This mirrors how production trainers
work (word counts first, merges on the count table) rather than
re-tokenizing the corpus per merge.

Merge semantics are Sennrich's exactly, and pinned against a pure-
Python reference implementation in ``test_bpe.py``:

- words are character sequences with an ``</w>`` end-of-word symbol;
- each iteration merges the (count-max, then lexicographically-least)
  adjacent symbol pair;
- within a word, occurrences merge greedily left-to-right
  (``regexp_replace`` replaces non-overlapping matches left-to-right —
  probed: ``l l l`` → ``ll l``);
- training stops early when no pair occurs twice.

Tokenization-with-merges is a BROADCAST JOIN against the final
word→symbols table (closed vocabulary over the training corpus): the
per-doc pass never re-runs merges, it looks words up.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END_WORD = "</w>"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n): lower-cased whitespace words with corpus frequencies.
    The ONE corpus-wide pass of BPE training; partial aggregation makes
    the shuffle vocabulary-sized per input partition."""
    words = F.filter(
        F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), " +"),
        lambda w: F.length(w) > 0,
    )
    return (
        docs.select(F.explode(words).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _initial_spaced(word_col):
    """'hello' -> 'h e l l o </w>' — the starting symbol sequence."""
    return F.concat_ws(" ", F.concat(F.split(word_col, ""), F.array(F.lit(END_WORD))))


def _pair_counts(words: DataFrame) -> DataFrame:
    """(pair, cnt): adjacent-symbol pair frequencies, weighted by word
    count. Within one word a pair is counted once per occurrence slot
    (Sennrich counts the same way: the stats come from zip(sym, sym[1:]))."""
    syms = F.split("spaced", " ")
    pairs = F.zip_with(
        F.slice(syms, 1, F.greatest(F.size(syms) - 1, F.lit(0))),
        F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return (
        words.select("n", F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("n").alias("cnt"))
    )


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 50,
    min_count: int = 2,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn ``n_merges`` BPE merges. Returns ``(merges, vocab)`` where
    ``merges`` is the ordered [(left, right), ...] list and ``vocab`` is
    the final (word, n, spaced) table — the lookup table tokenization
    joins against.

    Each iteration LOCAL-CHECKPOINTS the rewritten word table: the next
    iteration's plan starts from the materialized rows, not from an
    i-deep regexp chain. Lineage truncation (not just persist) is
    load-bearing here — ``_pair_counts`` references the ``spaced``
    column several times (zip_with + two slices + size), and Catalyst's
    project-collapsing INLINES the nested regexp expression at every
    reference, so an uncheckpointed loop goes EXPONENTIAL in plan size
    (observed: a 2 GiB plan string at 40 merges)."""
    wc = word_counts(docs, text_col)
    words = wc.select(
        "word", "n", _initial_spaced(F.col("word")).alias("spaced")
    ).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = (
            _pair_counts(words)
            .orderBy(F.col("cnt").desc(), F.col("pair").asc())
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_count:
            break
        a, b = best[0]["pair"].split(" ")
        merges.append((a, b))
        pattern = r"(?<!\S)" + re.escape(a) + " " + re.escape(b) + r"(?!\S)"
        replacement = (a + b).replace("\\", r"\\").replace("$", r"\$")
        words = words.withColumn(
            "spaced", F.regexp_replace("spaced", pattern, replacement)
        ).localCheckpoint(eager=True)
    return merges, words


def encode_docs(
    docs: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-scale BPE ENCODE + certified DECODE round-trip.

    Applying a trained tokenizer is a broadcast lookup, not a re-run of
    the merges: explode the doc into position-tagged words, join the
    (vocabulary-sized, broadcast) word→symbols table, and rebuild the
    ordered token stream per doc with one aggregation — ``collect_list``
    order is not deterministic, so order is restored structurally by
    ``array_sort`` on the position tag.  One explode, one broadcast
    join, one shuffle on ``doc_id``; nothing corpus-sized is ever
    collected or re-merged.

    Output per doc: ``n_words``, ``n_tokens`` (emitted subword count,
    ``</w>`` markers riding on each word's last symbol), ``tokens``
    (the encoded sequence), and ``roundtrip_text`` — the DECODE of the
    encoded stream (symbols concatenated per word, markers stripped,
    words re-joined).  Because BPE merges only ever concatenate
    adjacent symbols of the SAME word, the decode must equal the
    canonicalized input (lower, trimmed, single-spaced) byte-for-byte;
    a digest compare of ``roundtrip_text`` against the raw table is a
    full losslessness certificate for the encode path."""
    words = F.filter(
        F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), " +"),
        lambda w: F.length(w) > 0,
    )
    ex = docs.select(id_col, F.posexplode_outer(words).alias("pos", "word"))
    j = ex.join(F.broadcast(vocab.select("word", "spaced")), "word", "left")
    per_doc = j.groupBy(id_col).agg(
        F.count("word").alias("n_words"),
        F.coalesce(F.sum(F.size(F.split("spaced", " "))), F.lit(0))
        .cast("bigint")
        .alias("n_tokens"),
        F.array_sort(F.collect_list(F.struct("pos", "spaced"))).alias("__ws"),
    )
    spaced_seq = F.filter(
        F.transform("__ws", lambda s: s["spaced"]), lambda x: x.isNotNull()
    )
    tokens = F.flatten(F.transform(spaced_seq, lambda sp: F.split(sp, " ")))
    rebuilt = F.concat_ws(
        " ",
        F.transform(
            spaced_seq,
            lambda sp: F.replace(
                F.replace(sp, F.lit(" "), F.lit("")), F.lit(END_WORD), F.lit("")
            ),
        ),
    )
    return per_doc.select(
        id_col,
        "n_words",
        "n_tokens",
        tokens.alias("tokens"),
        rebuilt.alias("roundtrip_text"),
    )


def tokenize_counts(
    docs: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc subword token count under the trained vocabulary:
    explode words, broadcast-join the word→symbols table, sum symbol
    counts. (doc_id, n_words, n_subwords); docs with no words get 0/0.
    The ``</w>`` marker is part of each word's last symbol run, so
    ``n_subwords`` counts real emitted tokens."""
    words = F.filter(
        F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), " +"),
        lambda w: F.length(w) > 0,
    )
    per_word = vocab.select(
        "word", F.size(F.split("spaced", " ")).alias("n_sym")
    )
    exploded = docs.select(id_col, F.explode_outer(words).alias("word"))
    return (
        exploded.join(F.broadcast(per_word), "word", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.col("word")).alias("n_words"),
            F.coalesce(F.sum("n_sym"), F.lit(0)).cast("bigint").alias("n_subwords"),
        )
    )
