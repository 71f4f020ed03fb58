from . import cdc, corpus, curation, extensions, quality, streaming_queries  # noqa: F401


def all_queries():
    q = {}
    q.update(corpus.QUERIES)
    q.update(cdc.QUERIES)
    q.update(extensions.QUERIES)
    q.update(curation.QUERIES)
    q.update(quality.QUERIES)
    q.update(streaming_queries.QUERIES)
    return q


def all_oracles():
    o = {}
    o.update(corpus.ORACLE)
    o.update(cdc.ORACLE)
    o.update(extensions.ORACLE)
    o.update(curation.ORACLE)
    o.update(quality.ORACLE)
    o.update(streaming_queries.ORACLE)
    return o
