"""spark-submit entry point for the extraction pipeline.

    spark-submit --py-files ocr_spark.zip jobs/run_extraction.py \
        --spans /data/docs_spans --media /data/media_store \
        --out /data/extracted --lineage /data/lineage \
        --run-id r1 --buckets 256

Sandbox mode (no external tables): ``--synthetic N`` generates the
deterministic interleaved corpus on executors instead of reading
``--spans``/``--media``.

On a real cluster the same pipeline targets Iceberg tables (swap the
parquet reads/writes for ``spark.read.table`` / ``writeTo(...).append()``)
— the lineage/resume protocol is identical because bucket assignment is a
pure function of doc_id.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# Local runs (`python jobs/run_extraction.py`) put jobs/ on sys.path, not the
# repo root; on a cluster --py-files ships the package instead.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--spans", help="parquet dir: documents_spans")
    p.add_argument("--media", help="parquet dir: media_store")
    p.add_argument("--synthetic", type=int, default=0,
                   help="generate N synthetic docs instead of reading tables")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--out", required=True)
    p.add_argument("--lineage", required=True)
    p.add_argument("--run-id", required=True)
    p.add_argument("--buckets", type=int, default=64)
    p.add_argument("--backend", default="fake",
                   help="recognizer backend: fake|paddle")
    args = p.parse_args(argv)

    from ocr_spark.config import PipelineConfig
    from ocr_spark.corpus import corpus_dataframes_distributed
    from ocr_spark.lineage import run_resumable
    from ocr_spark.session import get_spark

    # Tuned session defaults (AQE sizing, locality, Arrow, worker reuse)
    # apply here too; spark-submit owns the master.
    spark = get_spark("ocr-spark-extract", master="submit")
    if args.synthetic:
        spans_df, media_df = corpus_dataframes_distributed(
            spark, seed=args.seed, n_docs=args.synthetic
        )
    else:
        if not (args.spans and args.media):
            p.error("--spans/--media required unless --synthetic")
        spans_df = spark.read.parquet(args.spans)
        media_df = spark.read.parquet(args.media)

    summary = run_resumable(
        spark, spans_df, media_df,
        out_dir=args.out, lineage_dir=args.lineage,
        run_id=args.run_id, n_buckets=args.buckets,
        cfg=PipelineConfig(recognizer_backend=args.backend),
    )
    json.dump(summary, sys.stdout)
    print()
    spark.stop()


if __name__ == "__main__":
    main()
