"""Shared fixtures: one session-scoped SparkSession for the whole run."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    import tempfile

    from zdb_spark.session import get_spark

    s = get_spark("zdb-spark-tests", master="local[4]",
                  extra_conf={
                      "spark.sql.shuffle.partitions": "4",
                      # saveAsTable (bucketed tables) must not litter the
                      # repo with ./spark-warehouse
                      "spark.sql.warehouse.dir":
                          tempfile.mkdtemp(prefix="zdb_warehouse_"),
                  })
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture()
def tmp_home(tmp_path):
    """Isolated ZDB_SPARK_HOME per test."""
    return str(tmp_path / "zdb_home")
