"""Table I/O seam: Iceberg-style snapshot semantics in the sandbox.

Production targets an Iceberg catalog (`spark.read.table` /
`df.writeTo(...).append()` — :class:`IcebergIO`, config-gated since no
Iceberg jar ships here).  The sandbox backend,
:class:`ParquetManifestIO`, emulates the properties the pipeline relies
on with plain parquet plus an atomically-replaced JSON manifest:

- **snapshot isolation**: readers list data directories through the
  manifest only — a crash mid-write leaves an orphan directory that no
  reader ever sees;
- **atomic append**: data lands in a fresh ``data/s<NNN>`` directory first,
  then the manifest is swapped via ``os.replace`` (atomic on POSIX);
- **time travel**: every append records a snapshot; ``read(asof=N)``
  reconstructs the table as of snapshot N.

This is the S4 sink seam (SURVEY.md §2.1): `lineage.run_resumable` writes
through plain partitioned parquet for bucket-overwrite semantics, while
this module provides the append/snapshot flavor for derived tables
(extraction outputs, dedup verdicts, lineage archives).
"""

from __future__ import annotations

import json
import os
import secrets
import tempfile

from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "manifest.json"


class ParquetManifestIO:
    """Snapshot-append table over a directory tree."""

    def __init__(self, root: str) -> None:
        self.root = root

    def _manifest_path(self, table: str) -> str:
        return os.path.join(self.root, table, _MANIFEST)

    def _load(self, table: str) -> dict:
        path = self._manifest_path(table)
        if not os.path.exists(path):
            return {"snapshots": []}
        with open(path) as f:
            return json.load(f)

    def append(self, df: DataFrame, table: str) -> int:
        """Write ``df`` as a new snapshot; returns the snapshot id.

        Data first, manifest second: the write is invisible until the
        atomic manifest swap commits it.
        """
        manifest = self._load(table)
        snap_id = len(manifest["snapshots"])
        # Unique suffix: an orphan from a crashed append must never collide
        # with the retry (a deterministic s<N> path would fail
        # errorifexists forever and brick the table).
        data_dir = os.path.join(
            self.root, table, f"data/s{snap_id:06d}-{secrets.token_hex(4)}"
        )
        df.write.mode("errorifexists").parquet(data_dir)

        manifest["snapshots"].append({"id": snap_id, "dir": data_dir})
        table_dir = os.path.join(self.root, table)
        fd, tmp = tempfile.mkstemp(dir=table_dir, suffix=".manifest")
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest_path(table))  # atomic commit
        return snap_id

    def read(self, spark: SparkSession, table: str,
             asof: int | None = None) -> DataFrame:
        """Union of all committed snapshots (≤ ``asof`` when given)."""
        snaps = self._load(table)["snapshots"]
        if asof is not None:
            snaps = [s for s in snaps if s["id"] <= asof]
        if not snaps:
            raise FileNotFoundError(
                f"table {table!r} has no committed snapshots"
            )
        return spark.read.parquet(*[s["dir"] for s in snaps])

    def snapshots(self, table: str) -> list[int]:
        return [s["id"] for s in self._load(table)["snapshots"]]


class IcebergIO:  # pragma: no cover - needs an Iceberg catalog
    """Production backend: the same three calls against a real catalog
    (configure ``spark.sql.catalog.<name>`` with the Iceberg jar)."""

    def __init__(self, catalog: str = "docs") -> None:
        self.catalog = catalog

    def append(self, df: DataFrame, table: str) -> int:
        df.writeTo(f"{self.catalog}.{table}").append()
        return -1  # snapshot id available via the catalog's metadata tables

    def read(self, spark: SparkSession, table: str,
             asof: int | None = None) -> DataFrame:
        if asof is not None:
            return spark.read.option("snapshot-id", asof).table(
                f"{self.catalog}.{table}"
            )
        return spark.read.table(f"{self.catalog}.{table}")


def get_table_io(backend: str = "parquet", **kwargs):
    if backend == "parquet":
        return ParquetManifestIO(**kwargs)
    if backend == "iceberg":
        return IcebergIO(**kwargs)
    raise ValueError(f"unknown table io backend: {backend}")
