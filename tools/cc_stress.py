"""1,000,000-node connected-components stress with exact ground truth.

The contract gate proves `dedup_clusters` (minlabel + star) on the sf0.01
corpus (~1k nodes); this script drives the SAME
``ocr_spark.dedup.connected_components`` at 1M nodes / ~3M edges on a
synthetic graph whose component structure is known by construction, so
every label is verified exactly — not sampled:

- **cliquish region** (the near-dup LSH shape minlabel is designed for):
  ``n_cliques`` complete graphs of ``clique_size`` nodes;
- **chain region** (the adversarial shape the star algorithm exists for):
  ``n_chains`` paths of ``chain_len`` nodes — diameter ``chain_len - 1``,
  far beyond any sane minlabel round budget.

Ground truth per node is the component minimum, computable from the id
alone (components are id-contiguous), so verification is one narrow join
+ filter — no driver-side graph work.  Three measurements:

1. ``algorithm='star'`` over the FULL mixed graph — must label all 1M
   nodes exactly (chains converge in O(log chain_len) rounds);
2. ``algorithm='minlabel'`` over the cliquish region — diameter ≤ 2, the
   production default on LSH pair graphs;
3. ``algorithm='minlabel'`` over ONE chain with the default 25-round
   budget — must raise (documented fail-fast: silently-wrong labels are
   worse than failing), recorded honestly as ``minlabel_chain_failfast``.

Everything is generated executor-side from ``spark.range`` — no driver
collections, no per-row Python.

Usage: python tools/cc_stress.py [--cliques N] [--clique-size K]
                                 [--chains C] [--chain-len L] [--out MD]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.mdappend import append_addendum  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cliques", type=int, default=100_000)
    p.add_argument("--clique-size", type=int, default=8)
    p.add_argument("--chains", type=int, default=200)
    p.add_argument("--chain-len", type=int, default=1000)
    p.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    p.add_argument("--out", help="markdown file to append the addendum to")
    args = p.parse_args()
    if args.clique_size < 2:
        # sequence(0, k-2) counts DOWN when k < 2 (sequence(0, -1) =
        # [0, -1] in Spark), fabricating self-loops and cross-clique
        # edges that the truth labeler would then call mismatches —
        # same descending-sequence trap dedup._gram_table_from_toks guards.
        p.error("--clique-size must be >= 2 (a 1-node clique has no edges)")
    cpus = str(args.cpus)
    if not cpus.isdigit():
        cpus = str(os.cpu_count() or 8)

    from pyspark.sql import functions as F

    from ocr_spark.dedup import connected_components
    from ocr_spark.session import get_spark

    spark = get_spark(
        "ocr-spark-cc-stress", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) * 4,
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        _run(spark, F, connected_components, args, cpus)
    finally:
        spark.stop()


def _run(spark, F, connected_components, args, cpus) -> None:
    k = args.clique_size
    clique_nodes = args.cliques * k
    chain_nodes = args.chains * args.chain_len
    base = clique_nodes  # chain ids start here
    total = clique_nodes + chain_nodes

    # --- graph construction (all executor-side) -------------------------
    # clique edges: every pair (i < j) inside each of the n_cliques
    # complete graphs — C(k,2) per clique.
    clique_edges = (
        spark.range(args.cliques)
        .select(F.col("id").alias("c"),
                F.explode(F.sequence(F.lit(0), F.lit(k - 2))).alias("i"))
        .select("c", "i",
                F.explode(F.sequence(F.col("i") + 1, F.lit(k - 1))).alias("j"))
        .select(
            (F.col("c") * k + F.col("i")).alias("id_a"),
            (F.col("c") * k + F.col("j")).alias("id_b"),
        )
    )
    # chain edges: (n, n+1) along each path of chain_len nodes.
    per_chain = args.chain_len - 1
    chain_edges = (
        spark.range(args.chains * per_chain)
        .select(
            (F.lit(base)
             + (F.col("id") / per_chain).cast("bigint") * args.chain_len
             + F.col("id") % per_chain).alias("id_a"),
        )
        .select("id_a", (F.col("id_a") + 1).alias("id_b"))
    )
    all_nodes = spark.range(total).select("id")
    all_edges = clique_edges.unionByName(chain_edges)
    n_edges = all_edges.count()

    # ground truth: component minimum from the id alone
    def truth(col):
        return (
            F.when(col < base, (col / k).cast("bigint") * k)
            .otherwise(
                F.lit(base)
                + ((col - base) / args.chain_len).cast("bigint")
                * args.chain_len
            )
        )

    def verify(labels):
        bad = labels.filter(F.col("cluster_id") != truth(F.col("id"))).count()
        n = labels.count()
        return n, bad

    # --- 1. star over the full mixed graph ------------------------------
    t0 = time.monotonic()
    star_labels = connected_components(
        all_nodes, all_edges, max_iter=20, algorithm="star"
    )
    star_n, star_bad = verify(star_labels)
    star_wall = time.monotonic() - t0

    # --- 2. minlabel over the cliquish region (the production shape) ----
    t0 = time.monotonic()
    ml_labels = connected_components(
        spark.range(clique_nodes).select("id"), clique_edges,
        max_iter=25, algorithm="minlabel",
    )
    ml_n, ml_bad = verify(ml_labels)
    ml_wall = time.monotonic() - t0

    # --- 3. minlabel fail-fast on one 1000-node chain --------------------
    one_chain = chain_edges.filter(F.col("id_b") < base + args.chain_len)
    one_chain_nodes = spark.range(base, base + args.chain_len).select("id")
    failfast = False
    try:
        connected_components(
            one_chain_nodes, one_chain, max_iter=25, algorithm="minlabel"
        ).count()
    except RuntimeError:
        failfast = True

    rec = {
        "metric": "cc_stress_1m",
        "n_nodes": total,
        "n_edges": n_edges,
        "n_components": args.cliques + args.chains,
        "chain_len": args.chain_len,
        "cpus": int(cpus),
        "star_full_wall_s": round(star_wall, 1),
        "star_nodes_labeled": star_n,
        "star_label_mismatches": star_bad,
        "minlabel_clique_wall_s": round(ml_wall, 1),
        "minlabel_nodes_labeled": ml_n,
        "minlabel_label_mismatches": ml_bad,
        "minlabel_chain_failfast": failfast,
    }
    line = json.dumps(rec)
    print(line)
    if args.out:
        stamp = time.strftime("%Y-%m-%d %H:%M", time.gmtime())
        block = (
            f"\n## Connected-components stress — {total:,} nodes, exact "
            f"ground truth (tools/cc_stress.py, {stamp})\n\n"
            "```json\n" + line + "\n```\n"
        )
        append_addendum(args.out, block)
    ok = star_bad == 0 and ml_bad == 0 and failfast \
        and star_n == total and ml_n == clique_nodes
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
