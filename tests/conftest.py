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
    s = get_spark("m2c-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
