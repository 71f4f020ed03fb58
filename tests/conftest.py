from __future__ import annotations

import os
import tempfile

import pytest

from mysql2clickhouse_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    # warehouse.dir is a STATIC conf — set before the session exists so
    # saveAsTable (bucketing tests) never writes into the repo checkout
    os.environ.setdefault(
        "SPARK_GRAFT_WAREHOUSE", tempfile.mkdtemp(prefix="m2c_warehouse_")
    )
    # r12: default the TEST session to local[8]/8 shuffle partitions —
    # at test-fixture sizes every stage is task-scheduling-bound, and
    # this box runs the whole bench FASTER at 8 cores than at 32
    # (BENCH_r11_c8 12.8 s vs BENCH_r11 18.0 s); the 51-minute full
    # suite was the same pathology suite-wide. setdefault only: an
    # explicit SPARK_GRAFT_CPUS (the driver's scaling probe, a perf
    # investigation) is honored unchanged.
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")
    s = get_spark("m2c-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
