"""End-to-end curation job: the verdict chain, the mixture stage, the
audit summary's accounting, and idempotent reruns."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from jobs.run_curation import _parse_weights, main as curation_main


def _read(spark, out, sub):
    return spark.read.parquet(os.path.join(out, sub))


def test_synthetic_curation_accounting_and_verdict_parity(
    spark, tmp_path
):
    """One synthetic run: every input doc gets exactly one audit row,
    the summary's counts are the verdict table's own aggregates, exact
    duplicates (id % 10 == 6 redirects) are never canonical, and the
    kept output is precisely the kept verdict rows."""
    out = str(tmp_path / "run1")
    summary = curation_main([
        "--synthetic", "120", "--out", out, "--eval-mod", "17",
    ])
    verdicts = _read(spark, out, "verdicts")
    assert verdicts.count() == summary["docs_in"] == 120
    assert verdicts.select("doc_id").distinct().count() == 120

    got = verdicts.agg(
        F.sum(F.col("kept").cast("long")).alias("kept"),
        F.sum((~F.col("is_canonical")).cast("long")).alias("dup"),
        F.sum(F.col("contaminated").cast("long")).alias("cont"),
    ).collect()[0]
    assert summary["kept_curation"] == summary["kept_final"] == got.kept
    assert summary["drop_dup"] == got.dup
    assert summary["drop_contaminated"] == got.cont
    assert got.cont > 0  # non-vacuous: the eval carve-out hits itself

    # the synthetic corpus redirects id % 10 == 6 to an exact dup of
    # id % DUP_GAP, so within [0, 120) ids 56, 106 duplicate 6 — of the
    # exact group {6, 56, 106} only the min id may be canonical
    rows = {
        r.doc_id: r.is_canonical
        for r in verdicts.filter(F.col("doc_id").isin(6, 56, 106))
        .collect()
    }
    assert not rows[56] and not rows[106]

    kept = _read(spark, out, "kept")
    want = {
        r.doc_id for r in verdicts.filter("kept").collect()
    }
    assert {r.doc_id for r in kept.collect()} == want
    assert set(kept.columns) == {"doc_id", "source", "text"}


def test_mixture_stage_subsets_curation_and_is_deterministic(
    spark, tmp_path
):
    """With --budget-tokens/--weights the final keep is curation-kept ∧
    hash-sampled; a rerun under the same args overwrites byte-identical
    outputs (pure-function decisions, no RNG state)."""
    out = str(tmp_path / "runm")
    argv = [
        "--synthetic", "150", "--out", out,
        "--budget-tokens", "2000", "--weights", "web=2,books=1,code=1",
    ]
    summary = curation_main(argv)
    verdicts = _read(spark, out, "verdicts")
    assert "sampled" in verdicts.columns
    # mixture only ever shrinks the curation-kept set
    assert 0 < summary["kept_final"] <= summary["kept_curation"]
    assert sum(
        v["docs"] for v in summary["mixture"].values()
    ) == summary["kept_final"]
    # the audit carries realized TOKENS vs the domain's target
    assert all(
        v["tokens"] > 0 and v["target_tokens"] > 0
        for v in summary["mixture"].values()
    )
    # sampled is defined exactly on the curation-kept rows
    assert verdicts.filter(
        F.col("sampled").isNotNull() & ~F.col("kept")
    ).count() == 0

    before = sorted(
        map(tuple, _read(spark, out, "kept").collect())
    )
    summary2 = curation_main(argv)
    assert summary2 == summary
    assert sorted(
        map(tuple, _read(spark, out, "kept").collect())
    ) == before


def test_external_corpus_and_eval_dirs(spark, tmp_path):
    """--docs/--eval parquet mode: a missing source column defaults, a
    doc sharing the eval text is dropped as contaminated."""
    docs_dir = str(tmp_path / "docs")
    eval_dir = str(tmp_path / "eval")
    leak = "the quick brown fox jumps over the lazy dog " * 8
    clean = (
        "some perfectly ordinary prose about weather patterns and "
        "their seasonal variation across temperate regions " * 4
    )
    spark.createDataFrame(
        [(1, leak), (2, clean)], "doc_id bigint, text string"
    ).write.parquet(docs_dir)
    spark.createDataFrame(
        [(900, leak)], "eval_id bigint, text string"
    ).write.parquet(eval_dir)

    out = str(tmp_path / "runx")
    summary = curation_main([
        "--docs", docs_dir, "--eval", eval_dir, "--out", out,
    ])
    verdicts = {
        r.doc_id: r for r in _read(spark, out, "verdicts").collect()
    }
    assert verdicts[1].contaminated and not verdicts[1].kept
    assert not verdicts[2].contaminated
    assert summary["drop_contaminated"] == 1
    kept = _read(spark, out, "kept")
    assert {r.source for r in kept.collect()} <= {"default"}


def test_curation_verdicts_custom_id_col(spark):
    """The library chain threads a non-default id column through every
    helper (they emit a literal 'doc_id' that must be aliased back)."""
    from ocr_spark.assembly import curation_verdicts

    df = spark.createDataFrame(
        [(7, "plain ordinary words about nothing in particular"),
         (8, "different plain ordinary words about something else")],
        "page_id bigint, text string",
    )
    out = curation_verdicts(df, id_col="page_id")
    assert out.columns[0] == "page_id"
    assert {r.page_id for r in out.collect()} == {7, 8}


def test_curation_verdicts_id_col_id(spark):
    """id_col='id' — dedup_clusters' own output convention — must not
    trip AMBIGUOUS_REFERENCE on the cluster join (the clusters frame
    emits a hardcoded 'id' that has to be dropped by column reference,
    not by name)."""
    from ocr_spark.assembly import curation_verdicts

    df = spark.createDataFrame(
        [(1, "plain ordinary words about nothing in particular"),
         (2, "different plain ordinary words about something else")],
        "id bigint, text string",
    )
    out = curation_verdicts(df, id_col="id")
    assert out.columns.count("id") == 1
    assert {r.id for r in out.collect()} == {1, 2}


def test_null_source_docs_get_audited_default_domain(spark, tmp_path):
    """A NULL source value must not silently vanish from the mixture
    audit.  The operator's domain join is itself null-safe (see
    test_mixture_sample_audits_null_domain_rows); on top of that, the
    JOB coalesces NULL to the same 'default' domain a missing column
    gets, so its audit shows a named domain with an explicit rate-0 row
    and a recorded not-sampled outcome."""
    docs_dir = str(tmp_path / "docs")
    prose_a = (
        "some perfectly ordinary prose about weather patterns and "
        "their seasonal variation across temperate regions, where "
        "morning fog gives way to afternoon sunshine and the harvest "
        "calendar follows rainfall rather than any fixed civic date"
    )
    prose_b = (
        "a completely different passage concerning harbor logistics, "
        "where container cranes follow berthing assignments posted a "
        "week ahead and the evening shift reconciles manifests against "
        "customs declarations before any vessel is cleared to depart"
    )
    spark.createDataFrame(
        [(1, "web", prose_a), (2, None, prose_b)],
        "doc_id bigint, source string, text string",
    ).write.parquet(docs_dir)
    out = str(tmp_path / "runnull")
    summary = curation_main([
        "--docs", docs_dir, "--out", out,
        "--budget-tokens", "100000", "--weights", "web=1",
    ])
    verdicts = {
        r.doc_id: r for r in _read(spark, out, "verdicts").collect()
    }
    assert verdicts[2].domain == "default"
    assert verdicts[2].rate_ppm == 0  # unweighted: explicit zero rate
    assert verdicts[2].sampled is False  # recorded, not silently dropped
    assert verdicts[1].domain == "web" and verdicts[1].sampled
    assert summary["mixture"].get("default") is None  # nothing sampled


def test_weights_parsing_and_arg_validation(tmp_path):
    assert _parse_weights("web=3,books=1") == {"web": 3, "books": 1}
    with pytest.raises(ValueError, match="domain=int"):
        _parse_weights("web=0.5")
    with pytest.raises(SystemExit):
        curation_main(["--synthetic", "10", "--out", str(tmp_path),
                       "--budget-tokens", "100"])  # weights missing
    with pytest.raises(SystemExit):
        curation_main(["--out", str(tmp_path)])  # no corpus at all


def test_export_shards_stage(tmp_path):
    import jobs.run_curation as job

    out = str(tmp_path / "c")
    s = job.main([
        "--synthetic", "120", "--out", out, "--eval-mod", "17",
        "--export-shards", "8",
    ])
    assert s["export"]["verified"] is True
    assert s["export"]["n_shards"] == 8
    assert s["export"]["docs"] == s["kept_final"]
    assert s["export"]["tokens"] > 0
    # rerun under the same args replaces its own export identically
    s2 = job.main([
        "--synthetic", "120", "--out", out, "--eval-mod", "17",
        "--export-shards", "8",
    ])
    assert s2["export"] == s["export"]


def test_export_shards_with_nothing_kept(spark, tmp_path):
    """--export-shards over a corpus curation fully rejects must report
    an empty verified export, not crash reading a fileless directory."""
    import jobs.run_curation as job

    d = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, "zz"), (2, "zz")], "doc_id bigint, text string"
    ).write.parquet(d)  # too short/low-quality: nothing survives
    s = job.main([
        "--docs", d, "--out", str(tmp_path / "c"),
        "--export-shards", "4",
    ])
    assert s["kept_final"] == 0
    assert s["export"] == {
        "n_shards": 4, "docs": 0, "tokens": 0, "verified": True,
    }


def test_clf_distill_stage_audits_and_gates(spark, tmp_path):
    """--clf-distill trains the exact-integer probe on the heuristic
    quality label and annotates every audit row; --clf-min-ppm folds the
    probe into the final keep gate with exact drop accounting; reruns
    are byte-identical (deterministic training)."""
    out = str(tmp_path / "runclf")
    argv = [
        "--synthetic", "120", "--out", out,
        "--clf-min-ppm", "500000", "--clf-iters", "6",
    ]
    summary = curation_main(argv)
    verdicts = _read(spark, out, "verdicts")
    assert "clf_prob_ppm" in verdicts.columns
    assert verdicts.filter(F.col("clf_prob_ppm").isNull()).count() == 0

    # confusion audit: counts add up and accuracy is the exact ratio
    clf = summary["clf"]
    assert clf["tp"] + clf["fp"] + clf["tn"] + clf["fn"] == clf["n"] == 120
    assert clf["accuracy_ppm"] == (
        (clf["tp"] + clf["tn"]) * 1_000_000
    ) // clf["n"]

    # the gate: kept_final counts exactly kept ∧ clf_prob ≥ threshold
    want_final = verdicts.filter(
        F.col("kept") & (F.col("clf_prob_ppm") >= 500000)
    ).count()
    assert summary["kept_final"] == want_final
    assert summary["drop_clf"] == verdicts.filter(
        F.col("clf_prob_ppm") < 500000
    ).count()
    kept = _read(spark, out, "kept")
    assert kept.count() == want_final

    # deterministic end to end: training, scoring, and the gate are all
    # exact-integer — a rerun reproduces the identical summary + outputs
    before = sorted(map(tuple, kept.collect()))
    assert curation_main(argv) == summary
    assert sorted(map(tuple, _read(spark, out, "kept").collect())) == before


def test_clf_distill_without_gate_only_audits(spark, tmp_path):
    """--clf-distill alone annotates + reports but must NOT change the
    kept set."""
    out = str(tmp_path / "runclf2")
    summary = curation_main([
        "--synthetic", "80", "--out", out, "--clf-distill",
    ])
    assert "clf" in summary and "drop_clf" not in summary
    assert summary["kept_final"] == summary["kept_curation"]
    verdicts = _read(spark, out, "verdicts")
    assert "clf_prob_ppm" in verdicts.columns
    kept = _read(spark, out, "kept")
    assert kept.count() == summary["kept_curation"]
