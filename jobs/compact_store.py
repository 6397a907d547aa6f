"""spark-submit entry point for incremental-store compaction.

    spark-submit --py-files ocr_spark.zip jobs/compact_store.py \
        --store /data/dedup_store --table signatures --mode signatures
    spark-submit --py-files ocr_spark.zip jobs/compact_store.py \
        --store /data/passage_store --table gram_freqs \
        --mode sum-by --key gram_h --value n_docs

Every incremental store in this engine accretes ONE tableio snapshot per
ingest run forever (that is what makes each run's commit atomic and
retry-safe), so read-side cost grows with run count: the gram-frequency
store re-sums ``n_docs`` by hash across all snapshots on every read, and
the signature store re-resolves its accumulated merge records.  This job
folds a store back to a single snapshot — the Iceberg
``rewrite_data_files`` / ``expire_snapshots`` maintenance analogue — with
the SAME atomic commit discipline as a run (data first, manifest swap
second), so a crash mid-compaction leaves the store untouched.

Modes (all produce byte-identical downstream results — pinned by
tests/test_compact_store.py):

- ``identity`` (default): union the snapshots, rewrite as one.  For
  sketch stores whose rows are already per-doc unique.
- ``sum-by``: ``groupBy(--key).agg(sum(--value))`` — for accretive
  frequency stores (gram_doc_freqs), where read-side summing is the
  thing being amortized; after compaction the store holds one row per
  key until the next run appends.
- ``signatures``: the run_dedup_incremental store — applies every
  accumulated ``role='merge'`` rename to the ``role='doc'`` labels
  (min-reachable over the rename graph, exactly the read path's
  ``ocr_spark.dedup.current_store_labels``) and keeps only resolved doc
  rows, so future reads
  skip merge resolution entirely until new merges accrue.
- ``bloom-or``: a Bloom membership registry
  (``ocr_spark.membership.bloom_store_*``) — OR-merges the per-run
  bitmaps per word index (``bloom_store_fold``, the read path's exact
  fold); refuses mixed (m_bits, k) geometries.

Time travel before the compaction point is discarded by design (that is
the storage being reclaimed).  Storage reclamation is three separate
opt-ins, each with a distinct safety contract: ``--vacuum`` deletes the
pre-compaction directories immediately (only safe when no concurrent
reader can hold the pre-compaction manifest); without it they are
recorded as *expired* in the manifest, and a LATER run's
``--vacuum-expired`` deletes them once readers have drained;
``--vacuum-orphans AGE_S`` reclaims directories no manifest ever
referenced — the leavings of crashed appends and conflict-aborted
compactions — sparing anything younger than AGE_S (a possible in-flight
append) and sparing expired-but-unvacuumed history (a late reader may
still scan it).  Expired reclamation runs BEFORE the compaction (only
earlier runs' history is ever touched); orphan reclamation runs after,
even when the compaction itself aborts on
:class:`ConcurrentWriteError` (an aborted compaction is precisely what
creates an orphan).

``--maintenance-only`` runs just the requested reclamation without the
fold: routine expired/orphan cleanup on an already-compacted store costs
metadata operations, not a full table rewrite (which would itself
re-expire the directory it replaces, never converging).  By default the
job reads the compacted table back and reports ``rows_after`` — the
cheap sanity check that the fold produced a readable store;
``--no-count-rows`` skips that second read on huge stores.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _signatures_fold(df):
    """Resolve accumulated merges into the doc labels; drop merge rows.

    Applies ocr_spark.dedup.current_store_labels (the store's canonical
    read path, same code the incremental job reads through), then
    re-attaches the per-doc sketch payload so the compacted store is a
    drop-in replacement for the accreted one."""
    from pyspark.sql import functions as F

    from ocr_spark.dedup import current_store_labels

    labels = current_store_labels(df)
    payload = df.filter("role = 'doc'").select("id", "digest", "sh", "sig")
    return (
        payload.join(labels, on="id")
        .select(
            "id", "digest", "sh", "sig", "cluster_id",
            F.lit("doc").alias("role"),
        )
    )


def main(argv: list[str] | None = None) -> dict:
    p = argparse.ArgumentParser()
    p.add_argument("--store", required=True, help="tableio store root")
    p.add_argument("--table", required=True, help="table name to compact")
    p.add_argument("--mode", default="identity",
                   choices=["identity", "sum-by", "signatures", "bloom-or"])
    p.add_argument("--key", help="sum-by: group key column")
    p.add_argument("--value", help="sum-by: summed value column")
    p.add_argument("--vacuum", action="store_true",
                   help="delete the pre-compaction data dirs (plus any "
                        "previously expired ones); without it they are "
                        "recorded as expired, awaiting --vacuum-expired")
    p.add_argument("--vacuum-expired", action="store_true",
                   help="delete dirs expired by EARLIER un-vacuumed "
                        "compactions (safe once no reader holds a "
                        "pre-compaction manifest)")
    p.add_argument("--vacuum-orphans", type=float, metavar="AGE_S",
                   help="also delete never-referenced data dirs (crashed "
                        "appends, aborted compactions) older than AGE_S "
                        "seconds; expired-but-unvacuumed history is "
                        "spared (that needs the --vacuum* opt-ins)")
    p.add_argument("--no-count-rows", dest="count_rows",
                   action="store_false",
                   help="skip the post-compaction read-back (rows_after "
                        "becomes null in the summary) — a second full "
                        "read of the compacted table, worth skipping "
                        "only on huge stores")
    p.add_argument("--maintenance-only", action="store_true",
                   help="run only the requested --vacuum-expired / "
                        "--vacuum-orphans reclamation, skipping the "
                        "compaction fold (and its full table rewrite); "
                        "snapshot_id/rows_after are null in the summary")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from ocr_spark.session import get_spark
    from ocr_spark.tableio import ParquetManifestIO

    if args.mode == "sum-by" and not (args.key and args.value):
        p.error("--mode sum-by requires --key and --value")
    if args.maintenance_only and args.vacuum:
        # --vacuum reclaims the FOLD's pre-compaction dirs, and
        # --maintenance-only skips the fold — accepting the combination
        # would emit a summary claiming "vacuumed": true while deleting
        # nothing (the audit row must never record reclamation that
        # never ran)
        p.error("--vacuum applies to the compaction fold, which "
                "--maintenance-only skips; use --vacuum-expired / "
                "--vacuum-orphans for maintenance reclamation")

    transform = None
    if args.mode == "sum-by":
        key, value = args.key, args.value

        def transform(df):  # noqa: F811 - mode-selected fold
            return df.groupBy(key).agg(F.sum(value).alias(value))
    elif args.mode == "signatures":
        transform = _signatures_fold
    elif args.mode == "bloom-or":
        from ocr_spark.membership import bloom_store_fold

        transform = bloom_store_fold

    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark("ocr-spark-compact-store", master="submit")
    io = ParquetManifestIO(args.store)
    before = io.snapshots(args.table)
    orphans: list[str] = []
    # BEFORE the compaction, so only EARLIER runs' expired dirs are
    # reclaimed — after it, this run's own just-expired dirs would be
    # deleted too, exactly the premature deletion expiry exists to avoid
    expired = io.vacuum_expired(args.table) if args.vacuum_expired else []
    snap = None
    try:
        if not args.maintenance_only:
            snap = io.compact(
                spark, args.table, transform, vacuum=args.vacuum
            )
    except BaseException:
        # orphan reclamation is independent of the compaction outcome (a
        # conflict-aborted compaction is precisely what CREATES an
        # orphan), but it must never REPLACE the in-flight error: a
        # lock-timeout raised here would bury the actionable
        # ConcurrentWriteError ("store untouched — re-run") diagnosis.
        if args.vacuum_orphans is not None:
            try:
                orphans = io.vacuum_orphans(
                    args.table, min_age_s=args.vacuum_orphans
                )
            except Exception as ve:
                print(f"warning: orphan vacuum failed after compaction "
                      f"error: {ve}", file=sys.stderr)
        raise
    if args.vacuum_orphans is not None:
        orphans = io.vacuum_orphans(
            args.table, min_age_s=args.vacuum_orphans
        )
    rows = (
        io.read(spark, args.table).count()
        if args.count_rows and not args.maintenance_only
        else None
    )
    summary = {
        "table": args.table,
        "mode": args.mode,
        "snapshots_before": len(before),
        "snapshot_id": snap,
        "rows_after": rows,
        "vacuumed": bool(args.vacuum),
        "orphans_deleted": orphans,
        "expired_deleted": expired,
    }
    json.dump(summary, sys.stdout)
    print()
    if owns_session:
        spark.stop()
    return summary


if __name__ == "__main__":
    main()
