from __future__ import annotations

import pytest

from crawlspark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("crawlspark-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()
