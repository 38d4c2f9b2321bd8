"""Shared pytest fixtures.

Mirrors the reference's assembly-level fixture (one stack for the whole
test run — /root/reference/tests/IntegrationTests/TrinoIcebergStackFixture.cs:1-32):
one session-scoped SparkSession with a temp warehouse, seeded once by the
convention scripts.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trino_iceberg_spark.session import get_spark  # noqa: E402
from trino_iceberg_spark.scripts import run_init_scripts  # noqa: E402

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS_DIR = os.path.join(REPO_ROOT, "scripts")
TESTDATA_SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def warehouse_dir():
    d = tempfile.mkdtemp(prefix="tis_warehouse_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="session")
def spark(warehouse_dir):
    spark = get_spark(
        app_name="tis_tests",
        master="local[4]",
        shuffle_partitions=4,
        warehouse_dir=warehouse_dir,
        extra_conf={"spark.driver.memory": "4g"},
    )
    run_init_scripts(spark, SCRIPTS_DIR)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return TESTDATA_SF


@pytest.fixture()
def tmp_bucket_root(tmp_path):
    return str(tmp_path / "buckets")
