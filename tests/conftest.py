from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from htrtf_spark.session import get_spark

    s = get_spark(app_name="htrtf_spark_tests", master="local[4]")
    yield s
    s.stop()
