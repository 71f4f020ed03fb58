"""Helpers shared by the maintained stores' lifecycle code.

The round-9 extraction of ``BucketedStore``/``StagedCommit`` stopped
the two bucketed stores of that round from drifting; round 10 added
two more stores whose lifecycle bodies repeat smaller fragments, and a
self-review caught the first drift-shaped defect landing in FOUR call
sites at once (tombstoned rows inflating hot-bucket occupancy). The
fragments live here now so the next fix lands once.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def has_files(fs, d: str) -> bool:
    """True iff ``d`` holds parquet FILES at the top level — a
    delete-all compact legitimately leaves an empty-but-present dir
    that must read as an empty store, never a schema-inference error."""
    return fs.is_dir(d) and any(n.endswith(".parquet") for n in fs.listdir(d))


def data_files(fs, store: str):
    """Parquet census through the ``fs`` seam (truthful on
    ``hdfs://``/``s3a://`` roots); recursion only ever descends legacy
    partition subdirs — the bucketed layouts are flat."""
    if not fs.is_dir(store):
        return
    stack = [store]
    while stack:
        d = stack.pop()
        for name in fs.listdir(d):
            full = os.path.join(d, name)
            if fs.is_dir(full):
                stack.append(full)
            elif name.endswith(".parquet"):
                yield full


def live_bucket_sizes(
    store_rows: DataFrame,
    tombs: DataFrame | None,
    keys: list[str],
    id_col: str,
) -> DataFrame:
    """Per-bucket LIVE occupancy of a banded store — the ``base_sizes``
    arm of the hot-bucket quarantine: rows owned by tombstoned docs are
    excluded (broadcast anti-join above the bucketed scan, partitioning
    preserved) BEFORE counting, so a bucket whose population was
    deleted does not keep quarantining fresh arrivals the one-shot over
    the live corpus would mine. Output: ``keys + __bn_base``.

    Cost note (a deliberate decision, not an oversight): this is one
    extra 2-column scan of the band/block store per ingest/probe, on
    top of the candidate join's own full scan — the accepted
    store-scan-per-batch contract. A maintained per-bucket counts table
    could shave part of that IO but adds another journaled table to
    two stores and still approaches O(distinct buckets) reads per
    batch; revisit only if the occupancy pass ever shows up in the
    flatness probe."""
    rows = store_rows
    if tombs is not None:
        rows = rows.join(F.broadcast(tombs), id_col, "left_anti")
    return rows.groupBy(*keys).agg(F.count(F.lit(1)).alias("__bn_base"))
