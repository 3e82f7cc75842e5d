from __future__ import annotations

import os

import pytest

from tibame_project_spark.session import get_spark

SF_DIR = os.environ.get("TIBAME_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tibame-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def spark_global(spark):
    """Alias so hypothesis-driven tests reuse the session fixture without
    triggering function-scoped teardown per example."""
    return spark
