"""Distributed corpus generator equivalence + multimodal plumbing tests."""

from __future__ import annotations

import pytest

from ocr_spark.corpus import corpus_dataframes_distributed
from ocr_spark.fixtures import build_corpus, corpus_dataframes
from ocr_spark.multimodal import extract_media_meta, sample_frames

N_DOCS = 40
SEED = 42


def test_distributed_equals_driver_side(spark):
    """The executor-side generator must produce bit-identical corpora to the
    driver-side one (both are pure functions of (seed, doc_index))."""
    d_spans, d_media = corpus_dataframes(spark, seed=SEED, n_docs=N_DOCS)
    x_spans, x_media = corpus_dataframes_distributed(
        spark, seed=SEED, n_docs=N_DOCS, partitions=4
    )
    a = {r.doc_id: [tuple(s) for s in r.spans] for r in d_spans.collect()}
    b = {r.doc_id: [tuple(s) for s in r.spans] for r in x_spans.collect()}
    assert a == b
    am = {r.media_ref: (bytes(r.content), r.fmt, r.width, r.height)
          for r in d_media.collect()}
    bm = {r.media_ref: (bytes(r.content), r.fmt, r.width, r.height)
          for r in x_media.collect()}
    assert am == bm


def test_media_meta_counts_lines_and_quarantines(spark):
    _, media = corpus_dataframes_distributed(spark, seed=SEED, n_docs=N_DOCS)
    meta = extract_media_meta(media).collect()
    span_rows, media_rows = build_corpus(SEED, N_DOCS)
    truth = {m["media_ref"]: m for m in media_rows}
    assert len(meta) == len(truth)
    for r in meta:
        t = truth[r.media_ref]
        if bytes(t["content"]).startswith(b"FAKEOCR1"):
            assert r.error is None
            assert r.n_lines == len(t["truth_lines"])
        else:
            assert r.error is not None
        assert r.n_bytes == len(t["content"])


def test_frame_sample_expands_rows(spark):
    _, media = corpus_dataframes_distributed(spark, seed=SEED, n_docs=N_DOCS)
    frames = sample_frames(media, every_n=2).collect()
    span_rows, media_rows = build_corpus(SEED, N_DOCS)
    ok = [m for m in media_rows
          if bytes(m["content"]).startswith(b"FAKEOCR1")]
    expected = sum((len(m["truth_lines"]) + 1) // 2 for m in ok)
    got_ok = [f for f in frames if f.error is None]
    assert len(got_ok) == expected
    # frame refs are unique and carry the frame index
    refs = {f.frame_ref for f in got_ok}
    assert len(refs) == len(got_ok)


def test_real_backend_is_stubbed_not_silent(spark):
    _, media = corpus_dataframes_distributed(spark, seed=SEED, n_docs=5)
    meta = extract_media_meta(media.limit(3), backend="real").collect()
    assert meta and all(
        r.error and r.error.startswith("not_implemented:") for r in meta
    )
