"""Store-mutation filesystem interface.

Every DIRECT store mutation the engine performs outside Spark writers —
partition swaps, staged-file promotion, empty-store repair, purge — goes
through this interface instead of bare ``os``/``shutil`` calls, so the
commit layer is swappable per storage scheme:

- ``LocalFS``  — ``os``/``shutil``; ``rename`` is atomic (POSIX).
- ``HadoopFS`` — Hadoop ``FileSystem`` via the live ``SparkSession``'s
  JVM gateway: resolves ``hdfs://``, ``s3a://``, ``file://``, … with
  the cluster's own Hadoop configuration. ``rename`` is atomic on HDFS;
  on S3-like object stores it is a server-side copy+delete and NOT
  atomic — see the commit-contract note below.

Commit contract (matches the reference's replication contract,
doc_old_duplicates.md:6-10): every store mutation here is staged first
and promoted with rename last, so an interruption mid-promote leaves
(a) the live table with some partitions old and some new — re-running
the same maintenance/batch job converges it, and (b) the staged data
on disk for inspection/retry. The promotion is NOT a transaction on
object stores; engines needing atomic multi-partition commits should
layer a table format (Iceberg/Delta) on top — this interface is the
seam where that lands.
"""

from __future__ import annotations

import os
import shutil


class LocalFS:
    """POSIX implementation — single-node and NFS-style deployments."""

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def is_dir(self, path: str) -> bool:
        return os.path.isdir(path)

    def listdir(self, path: str) -> list[str]:
        return os.listdir(path)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def rename(self, src: str, dst: str) -> None:
        os.rename(src, dst)

    def du(self, path: str) -> int:
        """Total bytes under ``path`` (0 if absent) — the store-size
        signal gating probe pushdown (store_common.probe_pruned)."""
        if os.path.isfile(path):
            return os.path.getsize(path)
        total = 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass  # racing delete: a vanished file counts 0
        return total

    def rmtree(self, path: str) -> None:
        if os.path.isfile(path):
            os.remove(path)
        else:
            shutil.rmtree(path, ignore_errors=True)
            if os.path.exists(path):
                # a silently-surviving path corrupts every caller that
                # counts the delete as done (purge accounting) or renames
                # into the spot next (swap promotion) — surface it HERE
                raise OSError(f"rmtree failed to remove: {path}")

    def write_text(self, path: str, text: str) -> None:
        with open(path, "w", encoding="utf-8") as f:
            f.write(text)

    def write_text_atomic(self, path: str, text: str) -> None:
        """All-or-nothing text write: temp name + fsync + rename, so a
        reader can never observe a torn/empty file at ``path``. This is
        the required form for COMMIT MARKERS — the journaled swaps treat
        the marker's existence as the commit point, so a torn marker
        written in place would read as committed-but-unparsable. The
        parent directory is created if absent — a marker may be the
        FIRST artifact of a store (e.g. the IVF manifest is written
        before the centroids so a mid-build crash leaves an
        exists()==False store that retries cleanly)."""
        parent = os.path.dirname(path)
        if parent:
            os.makedirs(parent, exist_ok=True)
        tmp = path + ".__tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(text)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, path)

    def read_text(self, path: str) -> str:
        with open(path, encoding="utf-8") as f:
            return f.read()


class HadoopFS:
    """Hadoop ``FileSystem`` implementation, driven through the running
    SparkSession's JVM gateway (no extra dependency — the classes ship
    with Spark). One instance per URI scheme+authority; created via
    ``fs_for``."""

    def __init__(self, spark, base_uri: str):
        jvm = spark._jvm
        self._jvm = jvm
        self._conf = spark._jsc.hadoopConfiguration()
        self._fs = jvm.org.apache.hadoop.fs.Path(base_uri).getFileSystem(self._conf)

    def _p(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(path)

    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._p(path)))

    def is_dir(self, path: str) -> bool:
        p = self._p(path)
        return bool(self._fs.exists(p)) and bool(self._fs.getFileStatus(p).isDirectory())

    def listdir(self, path: str) -> list[str]:
        return [
            st.getPath().getName() for st in self._fs.listStatus(self._p(path))
        ]

    def makedirs(self, path: str) -> None:
        self._fs.mkdirs(self._p(path))

    def rename(self, src: str, dst: str) -> None:
        # Hadoop rename signals failure inconsistently per store —
        # false returns on some (missing parent, existing dst), JVM
        # exceptions on others; normalize both to OSError so callers
        # never silently lose a swap
        try:
            ok = self._fs.rename(self._p(src), self._p(dst))
        except Exception as e:  # noqa: BLE001 — py4j surface
            raise OSError(f"hadoop rename failed: {src} -> {dst}: {e}") from e
        if not ok:
            raise OSError(f"hadoop rename failed: {src} -> {dst}")

    def du(self, path: str) -> int:
        """Total bytes under ``path`` (0 if absent) — one
        getContentSummary RPC."""
        if not self.exists(path):
            return 0
        return int(self._fs.getContentSummary(self._p(path)).getLength())

    def rmtree(self, path: str) -> None:
        # Hadoop delete() signals failure by RETURN VALUE (false) on some
        # stores; swallowing it would let a failed purge count its files
        # as removed and a failed pre-swap delete resurface later as a
        # confusing rename error — normalize to OSError like rename does.
        # (false with the path already absent is the no-op case: fine.)
        ok = self._fs.delete(self._p(path), True)  # recursive
        if not ok and self.exists(path):
            raise OSError(f"hadoop delete failed: {path}")

    def write_text(self, path: str, text: str) -> None:
        out = self._fs.create(self._p(path), True)  # overwrite
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()

    def write_text_atomic(self, path: str, text: str) -> None:
        """Temp-name + rename commit. The final name only ever holds a
        COMPLETE file — atomic rename on HDFS; on S3-like stores rename
        is copy+delete but each object is all-or-nothing, so a reader
        can never observe a TORN marker.

        OVERWRITE of an existing path is delete-then-rename (HDFS
        rename refuses an existing dst), so a crash between the two
        leaves the path transiently ABSENT — never-torn holds, but
        always-present does not. All current callers write markers into
        fresh staging dirs where absence safely reads as "uncommitted";
        a caller that needs replace-in-place atomicity must use
        FileSystem.rename with Options.Rename.OVERWRITE instead."""
        tmp = path + ".__tmp"
        self.write_text(tmp, text)
        if self.exists(path):
            self.rmtree(path)  # HDFS rename refuses an existing dst
        self.rename(tmp, path)

    def read_text(self, path: str) -> str:
        stream = self._fs.open(self._p(path))
        try:
            # commons-io ships with hadoop-common in Spark's jars
            data = self._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        finally:
            stream.close()
        return bytes(data).decode("utf-8")


def fs_for(spark, path: str):
    """Pick the implementation by URI scheme: bare paths and ``file://``
    take the POSIX fast path; any other scheme (hdfs, s3a, gs, abfs, …)
    resolves through Hadoop with the session's configuration."""
    scheme = path.split("://", 1)[0] if "://" in path else ""
    if scheme in ("", "file"):
        return LocalFS()
    return HadoopFS(spark, path)
