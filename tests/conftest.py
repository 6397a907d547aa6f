from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    from ocr_spark.session import get_spark

    session = get_spark(
        app_name="ocr-spark-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.default.parallelism": "4"},
    )
    # Checkpoint dir set ONCE for the whole session so behavior that
    # auto-detects it (connected_components checkpoint_mode='auto') is
    # deterministic regardless of test execution order; tests wanting the
    # localCheckpoint path pass checkpoint_mode='local' explicitly.
    session.sparkContext.setCheckpointDir(
        str(tmp_path_factory.mktemp("spark-ckpt"))
    )
    yield session
    session.stop()
