"""BM25 retrieval stress: posting-join cost and self-retrieval accuracy
at corpus scale (the check the 7-doc unit fixtures cannot give).

Reuses the dedup-stress synthetic corpus (30k-word vocabulary, 40-token
docs, executor-side generation, parquet round-trip).  Queries are the
first ``QUERY_TOKENS`` tokens of every ``n_docs // n_queries``-th
document — so each query has a known "right answer" (its source doc
contains every query term) and self-retrieval rate is a real accuracy
signal, not vibes: at 1M docs each word's df ≈ 1,300, idf_q ≈ 9 bits,
and a 5-term conjunction is essentially unique to the source doc.

Measured: end-to-end wall for the full operator (two corpus groupBys +
broadcast query join + top-k window), matched-pair volume (the join's
actual output cardinality — the quadratic check), and top-1/top-k
self-retrieval.

Usage: python tools/retrieval_stress.py [n_docs] [--queries N] [--out MD]
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

QUERY_TOKENS = 5
TOP_K = 10


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("n_docs", type=int, nargs="?", default=1_000_000)
    p.add_argument("--queries", type=int, default=100)
    p.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    p.add_argument("--out", help="markdown file to append the addendum to")
    args = p.parse_args()

    from ocr_spark.session import get_spark

    spark = get_spark(
        "ocr-spark-retrieval-stress", master=f"local[{args.cpus}]",
        shuffle_partitions=int(args.cpus) * 4,
    )
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="ocrspark_retrieval_stress_")
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
            f"\n## BM25 retrieval stress — {args.n_docs:,} docs / "
            f"{args.queries} queries (tools/retrieval_stress.py)\n\n"
            f"```json\n{line}\n```\n"
        )
        append_addendum(args.out, block)


def _stress(spark, work: str, args) -> dict:
    from pyspark.sql import functions as F

    from ocr_spark.textstats import bm25_search
    from tools.dedup_stress import synth_corpus

    synth_corpus(spark, args.n_docs).repartition(
        int(args.cpus) * 2
    ).write.parquet(f"{work}/docs")
    docs = spark.read.parquet(f"{work}/docs")

    stride = max(args.n_docs // args.queries, 1)
    queries = docs.filter(
        (F.col("doc_id") % stride == 0)
        & (F.col("doc_id") < stride * args.queries)
    ).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(
            F.slice(F.split(F.col("text"), " "), 1, QUERY_TOKENS), " "
        ).alias("text"),
    )
    n_queries = queries.count()

    t0 = time.monotonic()
    out = bm25_search(docs, queries, k=TOP_K).persist()
    n_ranked = out.count()
    wall = round(time.monotonic() - t0, 1)
    top1_self = out.filter(
        (F.col("rank") == 1) & (F.col("query_id") == F.col("doc_id"))
    ).count()
    topk_self = out.filter(F.col("query_id") == F.col("doc_id")).count()
    return {
        "metric": "retrieval_stress",
        "n_docs": args.n_docs,
        "cpus": int(args.cpus),
        "n_queries": n_queries,
        "query_tokens": QUERY_TOKENS,
        "k": TOP_K,
        "bm25_wall_s": wall,
        "ranked_rows": n_ranked,
        "top1_self": top1_self,
        "topk_self": topk_self,
        "top1_self_frac": round(top1_self / max(n_queries, 1), 3),
    }


if __name__ == "__main__":
    main()
