from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from ocr_spark.session import get_spark

    session = get_spark(
        app_name="ocr-spark-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.default.parallelism": "4"},
    )
    yield session
    session.stop()
