"""Per-row value projections (SURVEY §2.3).

P2 — value normalization, the ``fix_object`` analog
(/root/reference/binlog2sql_util.py:180-193): the reference walks every
row dict and rewrites

- MySQL ``set`` values (arriving as Python sets) into a comma-joined
  string (``','.join(value)``, binlog2sql_util.py:182-183);
- ``bytes`` values (binary columns, e.g. the binary(8) ``idvisitor``
  that flows through on every visit event) into their hex string
  (binlog2sql_util.py:184-191).

Here both are single native column expressions applied in the ingest
projection — they fuse into the scan under whole-stage codegen, add no
shuffle and no Python, and therefore cost nothing extra at 100 TB.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalize_values(
    df: DataFrame,
    set_cols: Iterable[str] = (),
    bin_cols: Iterable[str] = (),
) -> DataFrame:
    """P2 — normalize raw source values in place:

    - ``set_cols``: ``array<string>`` columns (MySQL ``set``) become the
      CSV string the reference emits (element order is the array's —
      MySQL returns set members in definition order, so the adapter
      must already deliver them ordered);
    - ``bin_cols``: ``binary`` columns become UPPERCASE hex strings
      (both Spark's ``hex`` and the reference's ``.hex()``-equivalent
      target tables store hex text, script_create_clickhouse_table.sql
      keeps ``idvisitor`` as String).

    Stays a pure projection: no shuffle, no UDF.
    """
    out = df
    for c in set_cols:
        # concat_ws maps NULL -> '' but fix_object passes None through
        # untouched (binlog2sql_util.py:192-193) — preserve the NULL
        out = out.withColumn(
            c,
            F.when(F.col(c).isNull(), F.lit(None).cast("string")).otherwise(
                F.concat_ws(",", F.col(c))
            ),
        )
    for c in bin_cols:
        out = out.withColumn(c, F.upper(F.hex(F.col(c))))  # hex(NULL) is NULL
    return out
