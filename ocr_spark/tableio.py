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

    def _resolve(self, table: str, d: str) -> str:
        """Manifest data paths are RELATIVE to the table dir (round 5):
        a store copied or moved wholesale keeps working — with absolute
        paths a forked store silently read (and vacuumed!) the
        original's data directories.  Absolute entries from older
        manifests still resolve as written."""
        if os.path.isabs(d):
            return d
        return os.path.join(self.root, table, d)

    def append(self, df: DataFrame, table: str) -> int:
        """Write ``df`` as a new snapshot; returns the snapshot id.

        Data first, manifest second: the write is invisible until the
        atomic manifest swap commits it.  Ids are max+1, not
        len(snapshots): after a :meth:`compact` the manifest holds one
        snapshot carrying the pre-compaction max id, and the next append
        must keep ids monotone (a len-based id would collide with
        history and break ``read(asof=...)`` ordering)."""
        manifest = self._load(table)
        snap_id = (
            max((s["id"] for s in manifest["snapshots"]), default=-1) + 1
        )
        # Unique suffix: an orphan from a crashed append must never collide
        # with the retry (a deterministic s<N> path would fail
        # errorifexists forever and brick the table).
        rel_dir = f"data/s{snap_id:06d}-{secrets.token_hex(4)}"
        data_dir = os.path.join(self.root, table, rel_dir)
        df.write.mode("errorifexists").parquet(data_dir)

        manifest["snapshots"].append({"id": snap_id, "dir": rel_dir})
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
        return spark.read.parquet(
            *[self._resolve(table, s["dir"]) for s in snaps]
        )

    def snapshots(self, table: str) -> list[int]:
        return [s["id"] for s in self._load(table)["snapshots"]]

    def compact(self, spark: SparkSession, table: str,
                transform=None, vacuum: bool = False) -> int:
        """Fold every committed snapshot into ONE, optionally applying
        ``transform`` (a DataFrame → DataFrame fold, e.g. sum-by-key for
        an accretive frequency store) — the maintenance operation that
        keeps an incremental store's snapshot count (and its read-side
        union/re-aggregation cost) from growing one entry per ingest run
        forever.

        Same commit discipline as :meth:`append`: compacted data lands
        in a fresh directory first, then the manifest is atomically
        swapped to a SINGLE snapshot carrying the pre-compaction max id
        (so later appends stay monotone and a reader that raced the swap
        saw either the full old history or the compacted form — both
        reconstruct the same table).  Time travel BEFORE the compaction
        point is intentionally discarded — that is the storage being
        reclaimed; ``read(asof=<pre-compaction id>)`` keeps working and
        returns the compacted equivalent.  Old data directories become
        unreferenced orphans; ``vacuum=True`` deletes them after the
        swap (only safe when no concurrent reader can still hold the old
        manifest — the same contract as Iceberg's expire-snapshots).
        Returns the surviving snapshot id."""
        import shutil

        manifest = self._load(table)
        if not manifest["snapshots"]:
            raise FileNotFoundError(
                f"table {table!r} has no committed snapshots"
            )
        keep_id = max(s["id"] for s in manifest["snapshots"])
        old_dirs = [
            self._resolve(table, s["dir"]) for s in manifest["snapshots"]
        ]
        df = self.read(spark, table)
        if transform is not None:
            df = transform(df)
        rel_dir = f"data/c{keep_id:06d}-{secrets.token_hex(4)}"
        data_dir = os.path.join(self.root, table, rel_dir)
        df.write.mode("errorifexists").parquet(data_dir)

        table_dir = os.path.join(self.root, table)
        new_manifest = {"snapshots": [{"id": keep_id, "dir": rel_dir}]}
        fd, tmp = tempfile.mkstemp(dir=table_dir, suffix=".manifest")
        with os.fdopen(fd, "w") as f:
            json.dump(new_manifest, f)
        os.replace(tmp, self._manifest_path(table))  # atomic commit
        if vacuum:
            for d in old_dirs:
                shutil.rmtree(d, ignore_errors=True)
        return keep_id


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
