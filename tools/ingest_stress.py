"""Streaming-ingest stress: throughput + exactly-once discipline at
corpus scale (the 100-doc test fixtures cannot measure either).

Drives :func:`ocr_spark.ingest.run_stream_dedup_ingest` over N
synthetic drops of M documents each (``ocr_spark.corpus.
synthetic_documents`` — every drop carries exact duplicates of earlier
drops by construction), then asserts the claims the unit tests pin at
toy size, at scale, with a HARD non-zero exit on any failure:

* **first-run-wins equality**: the union of all batch outputs must hold
  EXACTLY the one-shot batch dedup's survivor ids over the concatenated
  corpus (set equality via anti-joins, not just counts);
* **store discipline**: the digest store stays digest-unique; one
  tagged snapshot per batch;
* **maintenance invisibility**: compacting the digest store (and the
  Bloom registry, OR-fold) mid-run changes nothing about the batches
  that follow — and their replay tags keep refusing after compaction;
* **throughput**: wall per batch and docs/sec through the full
  dedup → partitioned sink → tagged commit path, with and without the
  Bloom-registry prune.

Usage: python tools/ingest_stress.py [n_docs] [--drops N] [--out MD]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("n_docs", type=int, nargs="?", default=1_000_000)
    p.add_argument("--drops", type=int, default=10)
    p.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    p.add_argument("--out", help="markdown file to append the addendum to")
    args = p.parse_args()

    from ocr_spark.session import get_spark

    spark = get_spark(
        "ocr-spark-ingest-stress", master=f"local[{args.cpus}]",
        shuffle_partitions=int(args.cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="ocrspark_ingest_stress_")
    try:
        result = _stress(spark, work, args)
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()

    line = json.dumps(result)
    print(line)
    if args.out:
        from tools.mdappend import append_addendum

        block = (
            f"\n## Streaming-ingest stress — {args.n_docs:,} docs / "
            f"{args.drops} drops (tools/ingest_stress.py)\n\n"
            f"```json\n{line}\n```\n"
        )
        append_addendum(args.out, block)


def _fail(msg: str) -> None:
    print(f"INGEST STRESS FAILURE: {msg}", file=sys.stderr)
    sys.exit(1)


def _stress(spark, work: str, args) -> dict:
    from pyspark.sql import functions as F

    from ocr_spark.corpus import synthetic_documents
    from ocr_spark.dedup import exact_digests, exact_duplicates
    from ocr_spark.ingest import run_stream_dedup_ingest
    from ocr_spark.membership import bloom_store_fold
    from ocr_spark.tableio import DuplicateTagError, ParquetManifestIO

    per_drop = args.n_docs // args.drops
    n_total = per_drop * args.drops
    result: dict = {
        "metric": "ingest_stress",
        "n_docs": n_total,
        "drops": args.drops,
        "per_drop": per_drop,
        "cpus": int(args.cpus),
    }

    # ---- one-shot ground truth: survivor ids of the full-corpus dedup
    full = synthetic_documents(spark, n_total, start=0)
    dups = exact_duplicates(full)
    expected_kept = (
        exact_digests(full)
        .join(dups, on="digest", how="left")
        .filter(
            F.col("canonical_id").isNull()
            | (F.col("id") == F.col("canonical_id"))
        )
        .select(F.col("id").alias("doc_id"))
        .persist()
    )
    result["expected_kept"] = expected_kept.count()

    t0 = time.monotonic()
    for i in range(args.drops):
        synthetic_documents(spark, per_drop, start=i * per_drop) \
            .coalesce(1).write.mode("append").parquet(f"{work}/in")
    result["synth_wall_s"] = round(time.monotonic() - t0, 1)

    def drain(tag: str, registry_m_bits=None, mid_compact: bool = False):
        stats: list[dict] = []
        store_root = f"{work}/store_{tag}"
        out = f"{work}/out_{tag}"
        io = ParquetManifestIO(store_root)
        t0 = time.monotonic()
        if mid_compact:
            # drain half, compact both stores, drain the rest — the
            # maintenance-invisibility claim at scale
            half = args.drops // 2
            q = run_stream_dedup_ingest(
                spark, f"{work}/in", store_root, out, f"{work}/ckpt_{tag}",
                registry_m_bits=registry_m_bits, max_files_per_trigger=1,
                collect_stats=stats,
            )
            while len(stats) < half and q.isActive:
                time.sleep(0.2)
            q.stop()
            q.awaitTermination()
            io.compact(spark, "digests", vacuum=True)
            if registry_m_bits is not None:
                io.compact(spark, "digests_bloom",
                           transform=bloom_store_fold, vacuum=True)
            # a replay of a pre-compaction batch must still be refused
            try:
                io.append(
                    spark.range(1).select(
                        F.col("id"), F.lit("x").alias("digest")
                    ),
                    "digests", tag="ingest/b000000",
                )
                _fail("pre-compaction tag accepted after compaction")
            except DuplicateTagError:
                pass
        q = run_stream_dedup_ingest(
            spark, f"{work}/in", store_root, out, f"{work}/ckpt_{tag}",
            registry_m_bits=registry_m_bits, max_files_per_trigger=1,
            collect_stats=stats,
        )
        q.awaitTermination()
        wall = round(time.monotonic() - t0, 1)

        live = [s for s in stats if not s.get("replayed")]
        if len(live) != args.drops:
            _fail(f"{tag}: {len(live)} live batches, want {args.drops}")
        got = spark.read.parquet(out).select("doc_id")
        missing = expected_kept.join(got, on="doc_id", how="left_anti") \
            .count()
        extra = got.join(expected_kept, on="doc_id", how="left_anti") \
            .count()
        if missing or extra:
            _fail(f"{tag}: kept-set mismatch vs one-shot "
                  f"(missing={missing}, extra={extra})")
        digs = io.read(spark, "digests")
        n_digs = digs.count()
        if n_digs != digs.select("digest").distinct().count():
            _fail(f"{tag}: digest store not digest-unique")
        return {
            "wall_s": wall,
            "docs_per_sec": round(n_total / wall, 1),
            "kept": result["expected_kept"],
            "batch_wall_s": [s["wall_s"] for s in live],
            "registry_survivors": [
                s["registry_survivors"] for s in live
            ],
        }

    plain = drain("plain")
    result["plain_wall_s"] = plain["wall_s"]
    result["plain_docs_per_sec"] = plain["docs_per_sec"]
    result["plain_batch_wall_s"] = plain["batch_wall_s"]

    m_bits = 12 * n_total  # ~12 bits per expected corpus doc
    reg = drain("registry", registry_m_bits=m_bits, mid_compact=True)
    result["registry_m_bits"] = m_bits
    result["registry_wall_s"] = reg["wall_s"]
    result["registry_docs_per_sec"] = reg["docs_per_sec"]
    result["registry_batch_wall_s"] = reg["batch_wall_s"]
    result["registry_survivors_per_batch"] = reg["registry_survivors"]
    result["kept"] = result["expected_kept"]
    result["exactly_once_verified"] = True
    return result


if __name__ == "__main__":
    main()
