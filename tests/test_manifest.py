"""Maintained corpus-statistics manifest (round 11, seventh store):
mergeable partial aggregates fold per batch; any batching merges to
the same exact sums; the fingerprint ledger absorbs redelivery.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mysql2clickhouse_spark.operators.manifest import CorpusManifest


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


_CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "der hund lief schnell durch den park"),
    (3, "el gato que duerme en la casa"),
    (4, None),
    (5, ""),
    (6, "word " * 40),
    (7, "a b c"),
    (8, "the cat sat on the mat"),
]


def _snap(m):
    return m.snapshot().first().asDict()


def test_incremental_fold_equals_one_shot(spark, tmp_path):
    """Sums/langs/histogram are associative: 3-batch fold == 1-batch
    fold on every exact field; the HLL estimate matches the exact
    distinct count at this cardinality."""
    inc = CorpusManifest(spark, str(tmp_path / "inc"))
    for r in range(3):
        inc.add_batch(_docs(spark, [d for d in _CORPUS if d[0] % 3 == r]))
    one = CorpusManifest(spark, str(tmp_path / "one"))
    one.add_batch(_docs(spark, _CORPUS))
    si, so = _snap(inc), _snap(one)
    for f_ in ("n_docs", "n_tokens", "n_chars", "lang_en", "lang_de",
               "lang_es", "lang_unk", "tok_hist"):
        assert si[f_] == so[f_], f_
    assert si["n_batches"] == 3 and so["n_batches"] == 1
    assert si["n_docs"] == 8
    assert si["distinct_docs_est"] == 8  # HLL exact at tiny cardinality
    # the histogram tiles n_docs exactly (null text counts as 0 tokens)
    assert sum(si["tok_hist"]) == si["n_docs"]
    assert si["lang_en"] == 2 and si["lang_de"] == 1 and si["lang_es"] == 1


def test_replay_short_circuits_via_fingerprint(spark, tmp_path):
    m = CorpusManifest(spark, str(tmp_path / "mf"))
    b = _docs(spark, _CORPUS[:4])
    rep = m.add_batch(b)
    assert rep["replayed"] is False and rep["n_docs"] == 4
    before = _snap(m)
    rep = m.add_batch(b)  # at-least-once redelivery
    assert rep["replayed"] is True
    assert _snap(m) == before
    # a DIFFERENT batch with the same size still folds
    rep = m.add_batch(_docs(spark, _CORPUS[4:8]))
    assert rep["replayed"] is False
    assert _snap(m)["n_docs"] == 8
    # the fingerprint is over CONTENT, not ids: the same ids with
    # changed texts (a re-crawl update) is a different batch
    recrawl = [(i, f"updated text {i}") for i, _ in _CORPUS[:4]]
    rep = m.add_batch(_docs(spark, recrawl))
    assert rep["replayed"] is False
    assert _snap(m)["n_docs"] == 12


def test_explicit_batch_id_takes_precedence(spark, tmp_path):
    m = CorpusManifest(spark, str(tmp_path / "mf"))
    m.add_batch(_docs(spark, _CORPUS[:2]), batch_id=7)
    # different content, same explicit id: treated as redelivery
    rep = m.add_batch(_docs(spark, _CORPUS[:2]), batch_id=7)
    assert rep["replayed"] is True
    assert _snap(m)["n_docs"] == 2


def test_compact_merges_partials_and_keeps_ledger(spark, tmp_path):
    m = CorpusManifest(spark, str(tmp_path / "mf"))
    batches = [_CORPUS[:3], _CORPUS[3:6], _CORPUS[6:]]
    for b in batches:
        m.add_batch(_docs(spark, b))
    before = _snap(m)
    rep = m.compact()
    assert rep["files_after"] == 1 and rep["files_before"] == 3
    assert _snap(m) == before  # merged row carries identical statistics
    # replay detection SURVIVES compaction (the ledger is kept whole)
    assert m.add_batch(_docs(spark, batches[1]))["replayed"] is True
    # and later folds keep appending on top of the merged base
    m.add_batch(_docs(spark, [(99, "fresh doc after compaction")]))
    assert _snap(m)["n_docs"] == before["n_docs"] + 1


def test_fold_crash_before_marker_leaves_manifest_intact(spark, tmp_path):
    from mysql2clickhouse_spark.fs import LocalFS

    class _FailMarker(LocalFS):
        def write_text_atomic(self, path: str, text: str) -> None:
            if path.endswith("_INGEST_COMMIT"):
                raise OSError("injected crash before marker")
            super().write_text_atomic(path, text)

    m = CorpusManifest(spark, str(tmp_path / "mf"))
    m.add_batch(_docs(spark, _CORPUS[:4]))
    before = _snap(m)
    m.fs = _FailMarker()
    with pytest.raises(OSError, match="injected crash"):
        m.add_batch(_docs(spark, _CORPUS[4:]))
    m2 = CorpusManifest(spark, str(tmp_path / "mf"))
    assert _snap(m2) == before  # debris cleared, store untouched
    rep = m2.add_batch(_docs(spark, _CORPUS[4:]))  # redelivery lands once
    assert rep["replayed"] is False
    assert _snap(m2)["n_docs"] == 8


def test_second_writer_refused_while_lock_fresh(spark, tmp_path):
    from mysql2clickhouse_spark.operators.store_common import (
        StoreLockedError,
        writer_lock,
    )

    m = CorpusManifest(spark, str(tmp_path / "mf"))
    with writer_lock(m.fs, m.path, "someone-else"):
        with pytest.raises(StoreLockedError):
            m.add_batch(_docs(spark, _CORPUS[:2]))
    # lock released: the same fold now lands
    assert m.add_batch(_docs(spark, _CORPUS[:2]))["n_docs"] == 2


def test_maintain_stores_covers_the_manifest(spark, tmp_path):
    from mysql2clickhouse_spark.streaming.runner import (
        ReplicationRunner,
        RunConfig,
    )

    m = CorpusManifest(spark, str(tmp_path / "mf"))
    for i in range(3):
        m.add_batch(_docs(spark, [(10 * i + 1, f"batch {i} doc")]))
    runner = ReplicationRunner(
        spark, RunConfig(target_dir=str(tmp_path / "wh"))
    )
    rep = runner.maintain_stores(
        [{"kind": "manifest", "path": str(tmp_path / "mf"), "max_files": 2}]
    )
    assert rep[0]["compacted"] is True
    assert rep[0]["census_after"] == 1
    assert _snap(m)["n_docs"] == 3


def test_cli_manifest_lifecycle(spark, tmp_path, capsys):
    import json

    from mysql2clickhouse_spark.cli import main

    _docs(spark, _CORPUS[:4]).write.parquet(str(tmp_path / "b1"))
    _docs(spark, _CORPUS[4:]).write.parquet(str(tmp_path / "b2"))
    store = str(tmp_path / "mf")
    assert main(["manifest", "--index-dir", store,
                 "--add-dir", str(tmp_path / "b1")]) == 0
    rep = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert rep["n_docs"] == 4 and rep["replayed"] is False
    assert main(["manifest", "--index-dir", store,
                 "--add-dir", str(tmp_path / "b2"),
                 "--snapshot", "--stats", "--compact"]) == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.splitlines()]
    snap = next(x for x in lines if x["job"] == "manifest-snapshot")
    assert snap["n_docs"] == 8 and snap["n_batches"] == 2
    assert lines[-1]["job"] == "manifest-stats"
    # read-only invocation against a mistyped dir refuses
    assert main(["manifest", "--index-dir", str(tmp_path / "typo"),
                 "--snapshot"]) == 2
    assert "no store at" in capsys.readouterr().out
