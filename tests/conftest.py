from __future__ import annotations

import pytest

from graphblast_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[4]", shuffle_partitions=8, app_name="graphblast_spark_tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
