from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "8")


@pytest.fixture(scope="session")
def spark():
    from sbs_suptech_etl_v2_spark.session import get_spark

    spark = get_spark(app_name="tests", master="local[4]")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    """Small SF for fast unit tests."""
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def oracle_sf_dir() -> str:
    """The driver's correctness SF — parity tests run here."""
    return os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
