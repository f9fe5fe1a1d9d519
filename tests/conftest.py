from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from skylinemapreducehadoop_spark.session import get_session

    s = get_session("skyline-tests", shuffle_partitions=8, extra_conf={"spark.default.parallelism": "8"})
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
