from __future__ import annotations

import os

import pytest

from fluent_plugin_sql_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_001 = "/root/testdata/sf0.001"
SF_DIR_01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("fpss-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
