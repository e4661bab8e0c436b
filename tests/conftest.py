from __future__ import annotations

import pytest

from deathmetal_datalake_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="deathmetal-tests", master="local[8]")
    s.sparkContext.setLogLevel("ERROR")
    yield s
