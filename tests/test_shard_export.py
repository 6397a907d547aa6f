"""Terminal training-shard export: determinism + verifiable manifest."""

from __future__ import annotations

import glob

import pandas as pd
import pytest

from ocr_spark.assembly import (
    shard_manifest,
    write_training_shards,
    verify_training_shards,
)
from ocr_spark.corpus import synthetic_documents

N_DOCS, N_SHARDS = 500, 16


def _export(spark, path):
    return write_training_shards(
        synthetic_documents(spark, N_DOCS, start=0), str(path),
        n_shards=N_SHARDS,
    )


def test_export_layout_and_accounting(spark, tmp_path):
    manifest = _export(spark, tmp_path / "exp")
    rows = {r.shard: r for r in manifest.collect()}
    assert set(rows) == set(range(N_SHARDS))
    assert sum(r.n_docs for r in rows.values()) == N_DOCS
    assert all(r.n_tokens > 0 for r in rows.values())
    # one data file per shard: the training job's read unit
    for s in rows:
        files = glob.glob(str(tmp_path / "exp" / "shards" / f"shard={s}" /
                              "*.parquet"))
        assert len(files) == 1, (s, files)
    # read-back completeness
    got = spark.read.parquet(str(tmp_path / "exp" / "shards"))
    assert got.count() == N_DOCS
    assert got.select("doc_id").distinct().count() == N_DOCS


def test_export_is_deterministic_and_publication_final(spark, tmp_path):
    m1 = set(map(tuple, _export(spark, tmp_path / "a")
                 .select("shard", "n_docs", "n_tokens", "content_xor")
                 .collect()))
    m2 = set(map(tuple, _export(spark, tmp_path / "b")
                 .select("shard", "n_docs", "n_tokens", "content_xor")
                 .collect()))
    assert m1 == m2
    # an export is a publication: re-export into the same dir refuses
    with pytest.raises(Exception, match="already exists|errorifexists"):
        _export(spark, tmp_path / "a")


def test_verify_catches_lost_row(spark, tmp_path):
    _export(spark, tmp_path / "exp")
    assert verify_training_shards(spark, str(tmp_path / "exp")).count() == 0

    # tear one row out of one shard file behind the manifest's back
    victim = glob.glob(
        str(tmp_path / "exp" / "shards" / "shard=3" / "*.parquet")
    )[0]
    pdf = pd.read_parquet(victim)
    import os

    os.remove(victim)
    # fresh filename: an in-place rewrite leaves the session's cached
    # file STATUS (length) stale and the scan dies at the new EOF
    # instead of reading the torn content
    pdf.iloc[1:].to_parquet(
        os.path.join(os.path.dirname(victim), "torn.parquet"), index=False
    )
    spark.catalog.refreshByPath(str(tmp_path / "exp" / "shards"))

    bad = verify_training_shards(spark, str(tmp_path / "exp")).collect()
    assert bad and all(r.shard == 3 for r in bad)
    assert {r.side for r in bad} == {"manifest_only", "recomputed_only"}


def test_manifest_xor_is_order_independent(spark, tmp_path):
    docs = synthetic_documents(spark, 200, start=0)
    a = {r.shard: r.content_xor
         for r in shard_manifest(docs, 8).collect()}
    b = {r.shard: r.content_xor
         for r in shard_manifest(
             docs.orderBy(docs.doc_id.desc()).repartition(13), 8
         ).collect()}
    assert a == b


def test_sparse_export_with_empty_shards_verifies_clean(spark, tmp_path):
    """Regression: verify used to infer the modulus from the manifest's
    ROW COUNT, so an export where some shards are empty recomputed
    under the wrong modulus and reported every shard torn."""
    m = write_training_shards(
        synthetic_documents(spark, 5, start=0), str(tmp_path / "exp"),
        n_shards=64,
    )
    assert m.count() < 64                      # some shards really empty
    assert m.select("n_shards").first()["n_shards"] == 64
    assert verify_training_shards(spark, str(tmp_path / "exp")).count() == 0
