from __future__ import annotations

import os

import pytest


@pytest.fixture(scope="session")
def backdate_tree():
    """Set every mtime under a tree to ``past`` — the shared helper for
    aging a fake crash-orphan past vacuum_orphans' tree-wide-newest-mtime
    guard (one definition so the aging semantics can't drift between
    test files)."""

    def _backdate(root, past: float) -> None:
        for sub, _dirs, files in os.walk(root):
            os.utime(sub, (past, past))
            for f in files:
                os.utime(os.path.join(sub, f), (past, past))

    return _backdate


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
