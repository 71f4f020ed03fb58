from . import (  # noqa: F401
    cdc,
    corpus,
    curation,
    extensions,
    quality,
    sql_corpus,
    streaming_queries,
)

_MODULES = (corpus, cdc, extensions, curation, quality, streaming_queries, sql_corpus)


def all_queries():
    q = {}
    for m in _MODULES:
        q.update(m.QUERIES)
    return q


def all_oracles():
    o = {}
    for m in _MODULES:
        o.update(m.ORACLE)
    return o
