"""spark-submit entry point for streaming document ingest with
cross-batch exact dedup through the committed digest store.

    spark-submit --py-files ocr_spark.zip jobs/run_stream_ingest.py \
        --input /data/incoming --store /data/ingest_store \
        --out /data/docs --checkpoint /data/ingest_ckpt \
        [--registry-bits 120000000] [--continuous]

Watches ``--input`` for ``(doc_id, text)`` parquet drops and drains them
micro-batch by micro-batch: each batch is deduplicated against the
committed store (first-run-wins), surviving canonicals land under
``--out`` partitioned by batch id, and the batch's digests commit as one
TAGGED store snapshot — the tag is what makes a crash/replay converge
instead of double-committing (see :mod:`ocr_spark.ingest`).  Default is
one availableNow drain (the scheduled-incremental mode, matching the
source checkpoint semantics); ``--continuous`` keeps the query running.

Re-running with the same ``--checkpoint`` resumes: files the checkpoint
already recorded are skipped at the source, and an in-flight batch that
committed its store snapshot but not its checkpoint entry is skipped by
its tag.

Sandbox mode: ``--synthetic-drops N --drop-docs M`` writes N parquet
drops of M docs each (consecutive id ranges of the deterministic
dup-structured corpus — every drop carries exact duplicates of earlier
drops by construction) into ``--input`` before draining.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> dict:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True,
                   help="dir watched for (doc_id, text) parquet drops")
    p.add_argument("--store", required=True,
                   help="digest-store root (tableio)")
    p.add_argument("--out", required=True,
                   help="output dir for kept docs (partitioned by batch)")
    p.add_argument("--checkpoint", required=True,
                   help="streaming checkpoint dir (reuse to resume)")
    p.add_argument("--stream-id", default="ingest",
                   help="tag namespace; one per logical stream")
    p.add_argument("--registry-bits", type=int, default=None,
                   help="enable the Bloom registry prune at this bitmap "
                        "size (~12 bits per expected total corpus doc); "
                        "exact mode only")
    p.add_argument("--near-dup", action="store_true",
                   help="run the FULL incremental family per batch "
                        "(exact + MinHash near-dup + cluster "
                        "maintenance) against a signature store instead "
                        "of exact-only against a digest store")
    p.add_argument("--threshold", type=float, default=0.3,
                   help="near-dup Jaccard verify threshold (--near-dup)")
    p.add_argument("--continuous", action="store_true",
                   help="keep running instead of one availableNow drain")
    p.add_argument("--max-files-per-trigger", type=int, default=8)
    p.add_argument("--synthetic-drops", type=int, default=0,
                   help="write N synthetic drops into --input first")
    p.add_argument("--drop-docs", type=int, default=200,
                   help="docs per synthetic drop")
    p.add_argument("--start", type=int, default=0,
                   help="first synthetic doc id")
    args = p.parse_args(argv)

    from ocr_spark.session import get_spark

    spark = get_spark("stream-ingest")

    if args.synthetic_drops:
        from ocr_spark.corpus import synthetic_documents

        for i in range(args.synthetic_drops):
            synthetic_documents(
                spark, args.drop_docs,
                start=args.start + i * args.drop_docs,
            ).coalesce(1).write.mode("append").parquet(args.input)

    from ocr_spark.ingest import (
        run_stream_dedup_ingest,
        run_stream_neardup_ingest,
    )

    stats: list[dict] = []
    if args.near_dup:
        if args.registry_bits is not None:
            p.error("--registry-bits applies to exact mode only")
        query = run_stream_neardup_ingest(
            spark, args.input, args.store, args.out, args.checkpoint,
            stream_id=args.stream_id,
            threshold=args.threshold,
            available_now=not args.continuous,
            max_files_per_trigger=args.max_files_per_trigger,
            collect_stats=stats,
        )
    else:
        query = run_stream_dedup_ingest(
            spark, args.input, args.store, args.out, args.checkpoint,
            stream_id=args.stream_id,
            registry_m_bits=args.registry_bits,
            available_now=not args.continuous,
            max_files_per_trigger=args.max_files_per_trigger,
            collect_stats=stats,
        )
    query.awaitTermination()

    summary = {
        "batches": len(stats),
        "replayed_batches": sum(1 for s in stats if s.get("replayed")),
        "docs_in": sum(s.get("docs_in", 0) for s in stats),
        "docs_kept": sum(s.get("docs_kept", 0) for s in stats),
        "docs_dropped": sum(s.get("docs_dropped", 0) for s in stats),
        "per_batch": stats,
    }
    if args.near_dup:
        summary["docs_dropped"] = (
            summary["docs_in"] - summary["docs_kept"]
        )
        summary["near_pairs"] = sum(s.get("near_pairs", 0) for s in stats)
        summary["merges"] = sum(s.get("merges", 0) for s in stats)
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
