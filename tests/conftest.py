from __future__ import annotations

import os

import pytest

from cloudvectordb_spark.session import get_session

# Overridable so the suite runs on any machine layout / scale factor
# (round-4 advisor item 5: no silent dependence on this host's paths).
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_session("cloudvectordb-tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
