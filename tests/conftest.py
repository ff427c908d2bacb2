from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from pmp_analytics_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pytest", shuffle_partitions=4)
    yield s
