"""Shared SparkSession for the test suite (one JVM for the whole run)."""

from __future__ import annotations

import pytest

from open_semantic_etl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()
