"""spark-submit entry point for end-to-end corpus curation.

    spark-submit --py-files ocr_spark.zip jobs/run_curation.py \
        --docs /data/raw_docs --eval /data/eval_texts \
        --out /data/curated/run1 \
        [--budget-tokens 2000000 --weights web=3,books=1]

One run composes the curation operators the way a training-data
pipeline uses them, over a ``(doc_id, text[, source])`` corpus:

1. verdicts — :func:`ocr_spark.assembly.curation_verdicts`: language-ID
   + quality score + Gopher repetition gate per document, optional
   eval-set decontamination, near-dup cluster assignment, and the
   keep/drop decision (canonical ∧ quality ∧ ¬repetitive ∧
   ¬contaminated);
1b. trained-probe distillation (optional, ``--clf-distill`` /
   ``--clf-min-ppm``) — :mod:`ocr_spark.classifier` trains the
   exact-integer linear probe on the label ``quality ≥ --quality-min``
   (CCNet's two-stage shape: distill the heuristic gate into a dense
   trained scorer), annotates every audit row with ``clf_prob_ppm``,
   reports the train-slice confusion vs the label, and — when
   ``--clf-min-ppm`` is given — adds the probe threshold to the final
   keep gate;
2. mixture (optional) — :func:`ocr_spark.assembly.mixture_sample`
   allocates ``--budget-tokens`` across the ``--weights`` domains and
   keeps each curation-kept doc at the deterministic hash-threshold
   rate that hits its domain's allocation in expectation;
3. write — ``<out>/verdicts`` (one audit row per INPUT doc: every
   gate's value plus the mixture columns when sampling ran) and
   ``<out>/kept`` (the surviving ``(doc_id, source, text)`` rows),
   plain parquet, ``overwrite``.

Retry semantics are idempotence, not a store commit: every decision is
a pure function of the document (hash sampling included), so re-running
with the same arguments overwrites byte-identical outputs — a crashed
run is re-run wholesale under the same ``--out``.  This differs from
``run_dedup_incremental`` deliberately: that job maintains CROSS-run
state (the committed signature store) and needs the atomic tableio
snapshot; a curation run is a self-contained transform of one corpus.

The JSON summary on stdout is the lineage row for this stage:
``docs_in``, per-gate drop counts (non-exclusive — a doc can fail
several gates), ``kept_curation``, and when mixing, the realized
per-domain token counts vs targets.

Sandbox mode: ``--synthetic N --start S`` generates the deterministic
dup-structured corpus (ocr_spark.corpus.synthetic_documents) with a
``source`` domain derived from the id, and — when ``--eval-mod K`` is
given — carves ids ``% K == 0`` out as the eval set.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# Local runs (`python jobs/run_curation.py`) put jobs/ on sys.path, not
# the repo root; on a cluster --py-files ships the package.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _parse_weights(spec: str) -> dict[str, int]:
    out: dict[str, int] = {}
    for part in spec.split(","):
        name, _, w = part.partition("=")
        if not name or not w or not w.isdigit():
            raise ValueError(
                f"--weights must be 'domain=int,...' (got {part!r})"
            )
        out[name.strip()] = int(w)
    return out


def main(argv: list[str] | None = None) -> dict:
    p = argparse.ArgumentParser()
    p.add_argument("--docs",
                   help="parquet dir: (doc_id, text[, source]) corpus")
    p.add_argument("--synthetic", type=int, default=0,
                   help="generate N synthetic docs instead of reading "
                        "--docs")
    p.add_argument("--start", type=int, default=0,
                   help="first synthetic doc id")
    p.add_argument("--eval",
                   help="parquet dir of eval texts to decontaminate "
                        "against (any id column + a text column)")
    p.add_argument("--eval-mod", type=int,
                   help="synthetic mode: carve doc_id %% K == 0 out as "
                        "the eval set")
    p.add_argument("--out", required=True,
                   help="output dir (verdicts/ and kept/ parquet)")
    p.add_argument("--quality-lang", default="en")
    p.add_argument("--quality-min", type=float, default=0.5)
    p.add_argument("--threshold", type=float, default=0.3,
                   help="near-dup Jaccard verify threshold")
    p.add_argument("--budget-tokens", type=int,
                   help="mixture-sample the kept docs to this token "
                        "budget (requires --weights)")
    p.add_argument("--weights",
                   help="mixture domain weights, e.g. web=3,books=1")
    p.add_argument("--source-col", default="source",
                   help="domain column for the mixture stage")
    p.add_argument("--clf-distill", action="store_true",
                   help="train the exact-integer linear probe "
                        "(ocr_spark.classifier) on label quality >= "
                        "--quality-min — CCNet's two-stage shape: distill "
                        "the heuristic into a dense trained scorer — and "
                        "add clf_prob_ppm to the verdicts audit")
    p.add_argument("--clf-min-ppm", type=int, default=None,
                   help="additionally gate kept docs on clf_prob_ppm >= "
                        "this threshold (implies --clf-distill; 500000 = "
                        "the link midpoint)")
    p.add_argument("--clf-iters", type=int, default=16)
    # 4.0, not the contract's 0.25: signed-hash count gradients are
    # near-zero-mean, so convergent rates run orders above intuition —
    # see train_linear_probe's measured rate guidance
    p.add_argument("--clf-lr-ppm", type=int, default=4_000_000)
    p.add_argument("--export-shards", type=int, default=None,
                   help="after curation (and mixture, if any), export the "
                        "final kept docs as N training shards with a "
                        "verifiable manifest under {out}/export "
                        "(assembly.write_training_shards); the job "
                        "re-verifies the written shards and fails loudly "
                        "on any discrepancy")
    args = p.parse_args(argv)

    if (args.budget_tokens is None) != (args.weights is None):
        p.error("--budget-tokens and --weights go together")
    if not args.synthetic and not args.docs:
        p.error("one of --docs / --synthetic is required")
    weights = _parse_weights(args.weights) if args.weights else None

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from ocr_spark.assembly import curation_verdicts, mixture_sample
    from ocr_spark.corpus import synthetic_documents
    from ocr_spark.session import get_spark

    # Re-entrant for in-process tests: the job owns the session only
    # when it created one (same discipline as the other jobs/ entries).
    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark("ocr-spark-curation", master="submit")
    src = args.source_col
    if args.synthetic:
        docs = synthetic_documents(
            spark, args.synthetic, start=args.start
        ).withColumn(
            # deterministic domain per id so the mixture stage is
            # exercisable without an external corpus
            src,
            F.element_at(
                F.array(F.lit("web"), F.lit("books"), F.lit("code")),
                (F.col("doc_id") % 3 + 1).cast("int"),
            ),
        )
    else:
        docs = spark.read.parquet(args.docs)
        if src not in docs.columns:
            docs = docs.withColumn(src, F.lit("default"))
        else:
            # Presentation choice, not a correctness guard:
            # mixture_sample's domain join is null-safe (a NULL-domain
            # doc would still get its rate-0 audit row), but this job's
            # audit reads better when a missing VALUE lands in the same
            # 'default' domain a missing COLUMN gets.
            docs = docs.withColumn(src, F.coalesce(F.col(src),
                                                   F.lit("default")))
    docs = docs.select("doc_id", src, "text")

    # the verdict joins are plain equi-joins on doc_id, so a NULL id
    # would silently vanish from the audit — refuse loudly instead (one
    # narrow single-column probe with pushdown, cheap next to the chain)
    if docs.filter(F.col("doc_id").isNull()).limit(1).count():
        raise ValueError(
            "corpus has rows with NULL doc_id; assign ids first — a "
            "NULL id cannot be audited (it matches no verdict join)"
        )

    eval_set = None
    if args.eval:
        raw = spark.read.parquet(args.eval)
        others = [c for c in raw.columns if c != "text"]
        if "eval_id" in others:
            id_expr = F.col("eval_id")
        elif len(others) == 1:
            id_expr = F.col(others[0])
        elif not others:
            # text-only eval set: any distinct id per row serves —
            # eval_id only feeds the distinct-eval-hit count
            id_expr = F.monotonically_increasing_id()
        else:
            p.error(
                f"--eval parquet has several candidate id columns "
                f"{others}; name one 'eval_id'"
            )
        eval_set = raw.select(id_expr.alias("eval_id"), "text")
    elif args.eval_mod:
        eval_set = docs.filter(
            F.col("doc_id") % args.eval_mod == 0
        ).select(F.col("doc_id").alias("eval_id"), "text")

    verdicts = curation_verdicts(
        docs.select("doc_id", "text"),
        eval_set,
        quality_lang=args.quality_lang,
        quality_min=args.quality_min,
        verify_threshold=args.threshold,
    )

    clf_eval = None
    if args.clf_distill or args.clf_min_ppm is not None:
        from ocr_spark.classifier import (
            evaluate_linear_probe,
            probe_features,
            score_linear_probe,
            train_linear_probe,
        )
        from ocr_spark.textstats import quality_score

        # the distillation label re-derives quality_score directly (a
        # pure per-doc projection, single-sourced with the verdict
        # chain's own gate) instead of joining the verdicts frame —
        # which would drag the LSH dedup chain into the label pass
        labeled = docs.select(
            "doc_id", "text",
            (quality_score(F.col("text"), args.quality_lang)
             >= args.quality_min).cast("bigint").alias("y"),
        )
        feats = probe_features(labeled, carry=("y",)).persist()
        model = train_linear_probe(
            feats, "y", iters=args.clf_iters, lr_ppm=args.clf_lr_ppm
        )
        clf_eval = evaluate_linear_probe(feats, model)
        verdicts = verdicts.join(
            score_linear_probe(feats, model)
            .select(F.col("id").alias("doc_id"), "clf_prob_ppm"),
            on="doc_id", how="left",
        )
        feats.unpersist()  # scoring re-derives from lineage at write time

    summary: dict = {"out": args.out}
    if weights is not None:
        # the mixture branch and the verdicts write share the whole
        # verdict chain (LSH dedup join, decontam broadcast) — persist
        # so the one write action evaluates it once, not per branch
        base_verdicts = verdicts.persist()
        # the clf gate runs BEFORE budget allocation: mixture_sample
        # sizes each domain's hash-threshold rate against the docs that
        # can actually ship — allocating over probe-dropped docs would
        # systematically undershoot --budget-tokens and make the
        # per-domain realized-token audit describe documents the final
        # filter later removes
        mix_gate = F.col("kept")
        if args.clf_min_ppm is not None:
            mix_gate = mix_gate & F.coalesce(
                F.col("clf_prob_ppm") >= args.clf_min_ppm, F.lit(False)
            )
        kept_docs = docs.join(
            base_verdicts.filter(mix_gate).select("doc_id"), on="doc_id"
        )
        mix = mixture_sample(
            kept_docs, weights, args.budget_tokens, domain_col=src
        ).withColumnRenamed("kept", "sampled")
        verdicts = base_verdicts.join(
            mix.select("doc_id", "domain", "n_tokens", "target_tokens",
                       "rate_ppm", "sampled"),
            on="doc_id", how="left",
        )
        final_filter = F.col("kept") & F.coalesce(
            F.col("sampled"), F.lit(False)
        )
    else:
        final_filter = F.col("kept")
    if args.clf_min_ppm is not None:
        # coalesce for the (impossible-by-construction, but cheap to
        # guard) left-join miss: an unscored doc must not pass the gate
        final_filter = final_filter & F.coalesce(
            F.col("clf_prob_ppm") >= args.clf_min_ppm, F.lit(False)
        )

    verdicts.write.mode("overwrite").parquet(
        os.path.join(args.out, "verdicts")
    )
    if weights is not None:
        base_verdicts.unpersist()
    # re-read the committed verdicts so the kept pass and the summary
    # aggregation don't recompute the cluster/decontam joins
    committed = spark.read.parquet(os.path.join(args.out, "verdicts"))
    docs.join(
        committed.filter(final_filter).select("doc_id"), on="doc_id"
    ).write.mode("overwrite").parquet(os.path.join(args.out, "kept"))

    agg = committed.agg(
        F.count(F.lit(1)).alias("docs_in"),
        F.sum(F.col("kept").cast("long")).alias("kept_curation"),
        F.sum((~F.col("is_canonical")).cast("long")).alias("drop_dup"),
        F.sum((F.col("quality") < args.quality_min).cast("long"))
        .alias("drop_quality"),
        F.sum(F.col("repetitive").cast("long")).alias("drop_repetitive"),
        F.sum(F.col("contaminated").cast("long"))
        .alias("drop_contaminated"),
    ).collect()[0]
    # sums are NULL (not 0) over an empty corpus — normalize
    summary.update({k: int(v or 0) for k, v in agg.asDict().items()})
    if weights is not None:
        # realized per-domain TOKENS vs targets — the audit the budget
        # allocation is judged by (doc counts alone can't show whether
        # --budget-tokens was hit); all columns come from the committed
        # verdicts, which carry the mixture frame's n_tokens/targets
        realized = (
            committed.filter("sampled")
            .groupBy("domain")
            .agg(
                F.count(F.lit(1)).alias("docs"),
                F.sum("n_tokens").alias("tokens"),
                F.max("target_tokens").alias("target_tokens"),
            )
            .collect()
        )
        summary["kept_final"] = sum(int(r.docs) for r in realized)
        summary["mixture"] = {
            r.domain: {
                "docs": int(r.docs),
                "tokens": int(r.tokens or 0),
                "target_tokens": int(r.target_tokens or 0),
            }
            for r in sorted(realized)
        }
        summary["budget_tokens"] = args.budget_tokens
    else:
        summary["kept_final"] = summary["kept_curation"]
    if clf_eval is not None:
        # train-slice confusion vs the heuristic label (the distillation
        # fidelity audit) + the gate's own non-exclusive drop count
        summary["clf"] = clf_eval
        if args.clf_min_ppm is not None:
            summary["drop_clf"] = int(
                committed.filter(
                    F.col("clf_prob_ppm") < args.clf_min_ppm
                ).count()
            )
            # kept_final above counted only the kept/sampled gates; the
            # clf gate is part of final_filter, so recount it exactly
            summary["kept_final"] = int(
                committed.filter(final_filter).count()
            )

    if args.export_shards:
        import shutil

        from ocr_spark.assembly import (
            verify_training_shards,
            write_training_shards,
        )

        export_dir = os.path.join(args.out, "export")
        # the library exporter is errorifexists (an export is a
        # publication); THIS job's contract is byte-identical reruns
        # under the same args, so a rerun replaces its own export
        shutil.rmtree(export_dir, ignore_errors=True)
        kept_out = spark.read.parquet(os.path.join(args.out, "kept")) \
            .select("doc_id", "text")
        if summary["kept_final"] == 0:
            # nothing survived curation: an empty export has no shard
            # files to read back or verify — report it plainly instead
            # of tripping schema inference on a fileless directory
            summary["export"] = {
                "n_shards": args.export_shards, "docs": 0, "tokens": 0,
                "verified": True,
            }
        else:
            manifest = write_training_shards(
                kept_out, export_dir, n_shards=args.export_shards,
            )
            bad = verify_training_shards(spark, export_dir).count()
            if bad:
                raise SystemExit(
                    f"training-shard export failed verification: {bad} "
                    "manifest discrepancies — export not usable"
                )
            mrows = manifest.collect()
            summary["export"] = {
                "n_shards": args.export_shards,
                "docs": sum(int(r.n_docs) for r in mrows),
                "tokens": sum(int(r.n_tokens) for r in mrows),
                "verified": True,
            }
    json.dump(summary, sys.stdout)
    print()
    if owns_session:
        spark.stop()
    return summary


if __name__ == "__main__":
    main()
