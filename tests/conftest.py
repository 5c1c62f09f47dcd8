from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from tableau_dashboard_performance_etl_automation_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tdpe-tests")
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
