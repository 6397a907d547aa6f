"""Snapshot-append table emulation: atomic visibility, time travel, and
crash-orphan invisibility."""

from __future__ import annotations

import os

import pytest

from ocr_spark.tableio import ParquetManifestIO, get_table_io


def _df(spark, values):
    return spark.createDataFrame([(v,) for v in values], schema="v int")


def test_append_and_read_union(spark, tmp_path):
    io = ParquetManifestIO(str(tmp_path))
    s0 = io.append(_df(spark, [1, 2]), "t")
    s1 = io.append(_df(spark, [3]), "t")
    assert (s0, s1) == (0, 1)
    got = sorted(r.v for r in io.read(spark, "t").collect())
    assert got == [1, 2, 3]


def test_time_travel(spark, tmp_path):
    io = ParquetManifestIO(str(tmp_path))
    io.append(_df(spark, [1, 2]), "t")
    io.append(_df(spark, [3]), "t")
    got = sorted(r.v for r in io.read(spark, "t", asof=0).collect())
    assert got == [1, 2]


def test_orphan_data_is_invisible(spark, tmp_path):
    """Data written without a manifest commit (crash between the two
    steps) must never be read."""
    io = ParquetManifestIO(str(tmp_path))
    io.append(_df(spark, [1]), "t")
    orphan = tmp_path / "t" / "data" / "s000099"
    _df(spark, [999]).write.parquet(str(orphan))
    assert os.path.exists(orphan)
    got = [r.v for r in io.read(spark, "t").collect()]
    assert got == [1]
    assert io.snapshots("t") == [0]


def test_read_uncommitted_table_raises(spark, tmp_path):
    io = ParquetManifestIO(str(tmp_path))
    with pytest.raises(FileNotFoundError):
        io.read(spark, "missing")


def test_backend_selector():
    assert isinstance(get_table_io("parquet", root="/tmp/x"),
                      ParquetManifestIO)
    with pytest.raises(ValueError):
        get_table_io("csvpile")
