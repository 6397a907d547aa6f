"""Bloom-membership stress: prune discipline + linear probe cost at
corpus scale (the check test_membership's 4-doc fixtures cannot give).

Reuses the dedup-stress synthetic corpus (executor-side Catalyst
generation, parquet round-trip).  The membership side is every 100th
document's gram set — standing in for a blocklist / eval registry —
and the measured questions are:

* **prune factor**: what fraction of the corpus's distinct (doc, gram)
  pairs survive the Bloom probe?  Predicted = true-match fraction +
  fpp ≈ matches + (1 - e^{-kn/m})^k; a broken mask/word computation
  shows up as ~100% (all bits read set) or as under-pruning far above
  the formula.
* **verify-mode exactness at scale**: contaminated-doc count through
  prune→verify must EQUAL the broadcast-exact operator's count (no
  false negatives is a theorem, but the equality here also catches
  join/aggregation mistakes that only misfire past one partition).
* **wall cost of the probe**, broadcast and shuffled (`broadcast_bloom=
  False` — the no-ceiling path a 10^10-bit bitmap would need).

Usage: python tools/membership_stress.py [n_docs] [--out MD]
Appends a harness-generated block below the manual-addenda marker with
--out — evidence numbers come from here, never hand-edits.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

EVAL_MOD = 100      # every 100th doc is a membership-set member
GRAM_N = 3          # trigram width (matches the contract fixture)
K = 4


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("n_docs", type=int, nargs="?", default=1_000_000)
    p.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    p.add_argument("--out", help="markdown file to append the addendum to")
    args = p.parse_args()

    from ocr_spark.session import get_spark

    spark = get_spark(
        "ocr-spark-membership-stress", master=f"local[{args.cpus}]",
        shuffle_partitions=int(args.cpus) * 4,
    )
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="ocrspark_membership_stress_")
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
            f"\n## Bloom-membership stress — {args.n_docs:,} docs "
            f"(tools/membership_stress.py)\n\n```json\n{line}\n```\n"
        )
        append_addendum(args.out, block)


def _stress(spark, work: str, args) -> dict:
    from pyspark.sql import functions as F

    from ocr_spark.decontam import (
        decontaminate,
        decontaminate_bloom,
        eval_gram_table,
    )
    from ocr_spark.dedup import shingle_hashes
    from ocr_spark.membership import bloom_build, bloom_probe
    from ocr_spark.textstats import explode_non_null, tokens
    from tools.dedup_stress import synth_corpus

    synth_corpus(spark, args.n_docs).repartition(
        int(args.cpus) * 2
    ).write.parquet(f"{work}/docs")
    docs = spark.read.parquet(f"{work}/docs")
    eval_set = docs.filter(F.col("doc_id") % EVAL_MOD == 0).select(
        F.col("doc_id").alias("eval_id"), "text"
    )

    # size the bitmap from the measured membership-gram count, the way a
    # production caller would (m ≈ 12n → fpp ≈ 0.6% at k=4)
    eg = eval_gram_table(eval_set, GRAM_N)
    n_eval_grams = eg.select("g").distinct().count()
    m_bits = 12 * n_eval_grams
    fpp_formula = (1 - math.exp(-K * n_eval_grams / m_bits)) ** K

    result: dict = {
        "metric": "membership_stress",
        "n_docs": args.n_docs,
        "cpus": int(args.cpus),
        "eval_mod": EVAL_MOD,
        "n_eval_grams": n_eval_grams,
        "m_bits": m_bits,
        "k": K,
        "fpp_formula": round(fpp_formula, 5),
    }

    # ---- prune telemetry: the probe the operator actually runs
    dg = explode_non_null(
        docs, shingle_hashes(tokens(F.col("text")), GRAM_N), "g",
        F.col("doc_id").alias("doc_id"),
    ).distinct().persist()
    total_grams = dg.count()
    t0 = time.monotonic()
    bloom = bloom_build(eg, "g", m_bits, K)
    probed = bloom_probe(dg, bloom, "g", m_bits, K)
    survivors = probed.filter("might_contain").count()
    result["probe_broadcast_wall_s"] = round(time.monotonic() - t0, 1)
    true_matches = dg.join(eg.select("g").distinct(), on="g").count()
    result["total_doc_grams"] = total_grams
    result["true_match_grams"] = true_matches
    result["survivor_grams"] = survivors
    result["prune_frac_kept"] = round(survivors / total_grams, 5)
    # false-positive rate among the NON-matching grams, vs the formula
    fp = survivors - true_matches
    result["fp_grams"] = fp
    result["fpp_measured"] = round(fp / max(total_grams - true_matches, 1), 5)

    # ---- shuffled-probe variant (the no-broadcast-ceiling path)
    t0 = time.monotonic()
    shuffled = bloom_probe(
        dg, bloom, "g", m_bits, K, broadcast_bloom=False
    ).filter("might_contain").count()
    result["probe_shuffled_wall_s"] = round(time.monotonic() - t0, 1)
    assert shuffled == survivors, (shuffled, survivors)
    dg.unpersist()

    # ---- end-to-end operators: exact broadcast vs prune->verify
    t0 = time.monotonic()
    n_exact = (
        decontaminate(docs, eval_set, n=GRAM_N, min_overlap=2)
        .filter("contaminated").count()
    )
    result["exact_wall_s"] = round(time.monotonic() - t0, 1)
    t0 = time.monotonic()
    n_verify = decontaminate_bloom(
        docs, eval_set, n=GRAM_N, min_overlap=2, m_bits=m_bits, k=K,
        mode="verify",
    ).filter("contaminated").count()
    result["bloom_verify_wall_s"] = round(time.monotonic() - t0, 1)
    t0 = time.monotonic()
    n_approx = decontaminate_bloom(
        docs, eval_set, n=GRAM_N, min_overlap=2, m_bits=m_bits, k=K,
        mode="approx",
    ).filter("contaminated").count()
    result["bloom_approx_wall_s"] = round(time.monotonic() - t0, 1)
    result["contaminated_exact"] = n_exact
    result["contaminated_bloom_verify"] = n_verify
    result["contaminated_bloom_approx"] = n_approx
    if n_verify != n_exact:
        raise SystemExit(
            f"verify-mode drift at scale: {n_verify} != {n_exact}"
        )
    if n_approx < n_exact:
        raise SystemExit(
            f"approx under-flagged: {n_approx} < {n_exact} (false negative!)"
        )
    return result


if __name__ == "__main__":
    main()
