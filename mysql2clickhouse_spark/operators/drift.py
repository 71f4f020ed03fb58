"""Schema-drift detection.

The reference treats source-schema evolution as a hard operational
error: replication halts with ClickHouse "No such column" / type
mismatch and the runbook walks the operator through ALTERing the target
(/root/reference/README.md:196-206); ``freeze_schema=True`` on the
stream reader (matomo2clickhouse.py:495) pins table schemas for the
session precisely so drift cannot slip in mid-run.

On a parquet target the failure mode is WORSE than a loud error: an
appended file with a new/retyped column silently forks the table schema
(readers see whichever footer they merge first). So the engine makes
drift a first-class, checkable signal:

- ``diff_schemas``      — pure metadata comparison (driver-side; schemas
  are footer-sized, never data);
- ``schema_drift_report`` — the same as a small DataFrame, queryable
  like any other run artifact;
- ``SchemaDriftError``  — raised by the runner in ``strict`` mode, the
  freeze_schema-faithful behavior.

Cost at 100 TB: one parquet footer read per (table, run) — control
plane, no data scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

DRIFT_SCHEMA = (
    "column string, status string, source_type string, target_type string"
)


class SchemaDriftError(RuntimeError):
    """Raised in strict mode when a batch's schema diverges from the
    stored table's — the engine analog of the reference's halt-and-
    runbook behavior (README.md:196-206)."""


def diff_schemas(
    source: StructType,
    target: StructType,
    ignore: set[str] | None = None,
) -> list[tuple[str, str, str | None, str | None]]:
    """Compare a batch's schema (source) against the stored table's
    (target). Returns one row per drifted column:

    - ``new_in_source``     — source grew a column the target lacks
      (the "No such column" case);
    - ``missing_in_source`` — a stored column the batch no longer
      carries (source dropped it; appends would null-fill silently);
    - ``type_changed``      — same name, different type (the README's
      ``revenue String -> Float64`` procedure).
    """
    ignore = ignore or set()
    src = {f.name: f.dataType.simpleString() for f in source.fields if f.name not in ignore}
    tgt = {f.name: f.dataType.simpleString() for f in target.fields if f.name not in ignore}
    out: list[tuple[str, str, str | None, str | None]] = []
    for name in sorted(set(src) | set(tgt)):
        if name not in tgt:
            out.append((name, "new_in_source", src[name], None))
        elif name not in src:
            out.append((name, "missing_in_source", None, tgt[name]))
        elif src[name] != tgt[name]:
            out.append((name, "type_changed", src[name], tgt[name]))
    return out


def schema_drift_report(
    spark: SparkSession,
    source: StructType,
    target: StructType,
    ignore: set[str] | None = None,
) -> DataFrame:
    """``diff_schemas`` as a DataFrame (empty = no drift)."""
    return spark.createDataFrame(diff_schemas(source, target, ignore), DRIFT_SCHEMA)
