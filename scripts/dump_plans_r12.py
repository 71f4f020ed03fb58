#!/usr/bin/env python
"""Dump .explain("formatted") for every headline query to plans/r12/.

Usage: python scripts/dump_plans_r12.py <suffix> [query ...]
  suffix   'before' or 'after' — file name suffix
  query    optional subset; default = the full bench HEADLINE list

The plans are the judge-checkable record of each optimization's plan
diff (Exchange count, join strategy, PushedFilters, BatchEval nodes).
Runs on sf0.1 (the bench scale) so AQE/threshold decisions match the
measured runs.
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mysql2clickhouse_spark.plans import all_queries_extended  # noqa: E402
from mysql2clickhouse_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r12",
    )
    os.makedirs(out_dir, exist_ok=True)

    from bench import HEADLINE  # noqa: E402

    names = sys.argv[2:] or HEADLINE
    spark = get_spark("m2c-plan-dump")
    queries = all_queries_extended()
    for name in names:
        df = queries[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
