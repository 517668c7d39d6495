from __future__ import annotations

import pytest

from rsyslog_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("rsyslog_spark_tests", shuffle_partitions=4)
    yield s
