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


def test_media_meta_null_metadata_is_not_a_task_failure(spark):
    """A NULL width/height arrives in the pandas batch as NaN (Arrow int
    with nulls -> float64); a bare int(NaN) failed the whole task.  The
    row must come through with width/height None — metadata gaps are not
    decode errors."""
    from ocr_spark.fixtures import fake_media_content

    media = spark.createDataFrame(
        [("m1", fake_media_content(["A", "B"]), "img", None, None, ["A", "B"]),
         ("m2", fake_media_content(["C"]), "img", 3, 4, ["C"])],
        "media_ref string, content binary, fmt string, width int, "
        "height int, truth_lines array<string>",
    )
    got = {r.media_ref: r for r in extract_media_meta(media).collect()}
    assert got["m1"].error is None and got["m1"].n_lines == 2
    assert got["m1"].width is None and got["m1"].height is None
    assert got["m2"].width == 3 and got["m2"].height == 4


def test_sample_frames_rejects_degenerate_every_n(spark):
    """every_n=0 quarantined EVERY row with a cryptic range() error and
    every_n<0 silently emitted zero frames — both are config errors that
    must fail the call, not read as corpus properties."""
    _, media = corpus_dataframes_distributed(spark, seed=SEED, n_docs=4)
    for bad in (0, -1):
        with pytest.raises(ValueError, match="every_n"):
            sample_frames(media, every_n=bad)


def test_fake_decoder_rejects_non_dict_json():
    """Valid JSON that is not an object (b'FAKEOCR1\"hi\"', arrays) used
    to escape as AttributeError past the decode handler; the shared
    decoder must classify it decode_error everywhere."""
    from ocr_spark.recognizer import FakeRecognizer, decode_fake_payload

    rec = FakeRecognizer()
    for payload in (b'FAKEOCR1"hi"', b"FAKEOCR1[1,2]", b"FAKEOCR1null"):
        assert rec.recognize(payload).error == "decode_error"
        with pytest.raises(ValueError, match="decode_error"):
            decode_fake_payload(payload)


def test_real_backend_is_stubbed_not_silent(spark):
    _, media = corpus_dataframes_distributed(spark, seed=SEED, n_docs=5)
    meta = extract_media_meta(media.limit(3), backend="real").collect()
    assert meta and all(
        r.error and r.error.startswith("not_implemented:") for r in meta
    )
