"""End-to-end cross-run incremental dedup job: two consecutive runs over
disjoint id ranges through a REAL on-disk store must together produce
exactly what one full-corpus run produces — the run-union equivalence the
job's docstring promises — and the store must advance exactly one
unified-signatures snapshot per run."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from jobs.run_dedup_incremental import main as job_main
from ocr_spark.corpus import synthetic_documents
from ocr_spark.dedup import (
    exact_digests,
    exact_duplicates_incremental,
    minhash_lsh_pairs,
)

# Batch boundary chosen so (a) it falls inside a DUP_GAP window — run B is
# guaranteed cross-run EXACT dups — and (b) it splits the adjacent near
# pair (140, 141), which is verified to band under the frozen minhash
# constants (LSH recall at J≈0.5 is ~0.68 per pair, so an arbitrary
# boundary's pair may legitimately miss; the constants are already pinned
# by the dedup_minhash_lsh oracle, so this is stable, not flaky).
N_A, N_B = 141, 59


def test_two_runs_equal_one_run(spark, tmp_path):
    store = str(tmp_path / "store")
    out_a, out_b = str(tmp_path / "runA"), str(tmp_path / "runB")

    a = job_main(["--synthetic", str(N_A), "--start", "0",
                  "--store", store, "--out", out_a])
    b = job_main(["--synthetic", str(N_B), "--start", str(N_A),
                  "--store", store, "--out", out_b])

    # the synthetic corpus guarantees cross-batch exact dups (id%10==6
    # groups span batches) — run B must actually hit the committed store
    assert a["n_dup_of_committed"] == 0 and b["n_dup_of_committed"] > 0
    # ONE unified signatures table, one atomic snapshot per run (two
    # separate digest/sketch commits would open a crash window — see the
    # job's module docstring)
    assert (a["store_snapshot"], b["store_snapshot"]) == (0, 1)
    manifest = json.load(
        open(os.path.join(store, "signatures", "manifest.json"))
    )
    assert len(manifest["snapshots"]) == 2
    assert not os.path.exists(os.path.join(store, "digests"))
    assert not os.path.exists(os.path.join(store, "sketches"))

    # one-shot ground truth over the SAME full corpus (pure function of
    # the id, so batching cannot change any document)
    full = synthetic_documents(spark, N_A + N_B, start=0)
    one_shot = exact_duplicates_incremental(exact_digests(full), None)
    want_kept = {r.id for r in one_shot.collect() if r.kept}

    got_kept = set()
    for out in (out_a, out_b):
        got_kept |= {
            r.id
            for r in spark.read.parquet(f"{out}/exact").collect()
            if r.kept
        }
    # batches are in id order, so first-run-wins == global-min-id-wins
    assert got_kept == want_kept

    # near-dup pair union == one-shot pairs over the exact survivors
    survivors = full.join(
        spark.createDataFrame([(i,) for i in sorted(want_kept)], "id bigint"),
        full.doc_id == F.col("id"), "leftsemi",
    )
    want_pairs = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(survivors, verify_threshold=0.3).collect()
    }
    got_pairs = set()
    for out in (out_a, out_b):
        got_pairs |= {
            (r.id_a, r.id_b)
            for r in spark.read.parquet(f"{out}/pairs").collect()
        }
    assert got_pairs == want_pairs
    assert want_pairs  # non-vacuous: the corpus has near-dups by design
    # every pair is emitted by exactly the run that introduced its later
    # member: the two runs' pair sets are disjoint
    pa = {(r.id_a, r.id_b)
          for r in spark.read.parquet(f"{out_a}/pairs").collect()}
    pb = {(r.id_a, r.id_b)
          for r in spark.read.parquet(f"{out_b}/pairs").collect()}
    assert not (pa & pb)
    assert any(i < N_A <= j for i, j in pb)  # cross-run pairs exist
