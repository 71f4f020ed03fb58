"""SparkSession factory tuned for the engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default ``local[*]``),
but every setting below is chosen for cluster scale:

- AQE on (runtime re-plan: coalesced shuffle partitions, skew-join split)
- broadcast threshold generous enough that the star-schema dims
  (region/nation/customer-like tables) broadcast instead of shuffling
- Arrow enabled for the few pandas-interop paths (similarity extensions)
- shuffle partitions sized for the test box; on a real cluster this is
  overridden per-job or left to AQE's coalescing
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import SparkSession

_SCRATCH_DIRS: list[str] = []


def scratch_dir(prefix: str) -> str:
    """A temp dir removed at process exit. Oracle/bench queries that
    stage data (replication targets, IVF indexes, stream sinks) MUST
    allocate through this: a bare ``mkdtemp`` per invocation leaks a
    full staged dataset every driver sweep / bench iteration —
    unbounded /tmp growth at larger sf."""
    d = tempfile.mkdtemp(prefix=prefix)
    if not _SCRATCH_DIRS:
        atexit.register(_cleanup_scratch)
    _SCRATCH_DIRS.append(d)
    return d


def _cleanup_scratch() -> None:
    for d in _SCRATCH_DIRS:
        shutil.rmtree(d, ignore_errors=True)
    _SCRATCH_DIRS.clear()


_CACHE_SLOTS: dict[str, list] = {}


def release_cache(tag: str) -> None:
    """Unpersist whatever ``tag`` holds. Helpers MUST call this at entry,
    BEFORE persisting the invocation's own frames: a repeat invocation
    with identical inputs produces the same analyzed plan, and Spark's
    CacheManager treats ``persist()`` on an already-cached plan as a
    no-op — so rotating AFTER the new persist would drop the one cache
    entry both invocations share, and the repeat run would execute its
    whole diamond DAG uncached (measured 2× on the minhash pipeline)."""
    for old in _CACHE_SLOTS.pop(tag, []):
        try:
            old.unpersist()
        except Exception:
            pass  # session already stopped — nothing to release


def rotate_cache(tag: str, *frames):
    """Register ``frames`` as ``tag``'s live persisted set, unpersisting
    whatever the tag held before (normally nothing — the helper released
    at entry). The eager-persist barriers in the near-dup helpers must
    stay cached until the CALLER materializes the returned (lazy) frame,
    so the helper can't unpersist them itself — but without any release,
    a 50-query driver sweep pins dozens of full-corpus signature caches
    and evicts useful memory at scale. Rotation bounds the pinned set to
    one invocation per helper."""
    release_cache(tag)
    _CACHE_SLOTS[tag] = list(frames)
    return frames[0] if len(frames) == 1 else frames


def get_spark(app_name: str = "mysql2clickhouse-spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    # scale-adaptive, not a local constant (guide §2.2/§9): the local
    # default (32) matches the test box; a cluster deploy sets
    # SPARK_GRAFT_SHUFFLE_PARTITIONS to ~2× total cores (or higher and
    # lets AQE coalesce down — coalescePartitions is on below). Kept as
    # an env knob so the driver's bench methodology is unchanged at
    # every SPARK_GRAFT_CPUS it probes.
    shuffle_parts = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", shuffle_parts)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # the driver's events.parquet stores TIMESTAMP(NANOS); Spark reads
        # them as long (we convert to micros in sources.tables)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # local mode: executors share the driver JVM, so the driver heap
        # IS the cluster memory — size it for 32 concurrent task threads
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
    )
    warehouse = os.environ.get("SPARK_GRAFT_WAREHOUSE")
    if warehouse:  # static conf: only honored at session creation
        builder = builder.config("spark.sql.warehouse.dir", warehouse)
    return builder.getOrCreate()
