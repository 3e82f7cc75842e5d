from __future__ import annotations

import os

import pytest

from tibame_project_spark.session import get_spark

SF_DIR = os.environ.get("TIBAME_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    # isolated warehouse: saveAsTable/bucketing tests must not leave state
    # behind in the repo or collide with a previous run's directories
    wh = str(tmp_path_factory.mktemp("warehouse"))
    s = get_spark(
        "tibame-tests",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": wh},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def spark_global(spark):
    """Alias so hypothesis-driven tests reuse the session fixture without
    triggering function-scoped teardown per example."""
    return spark
