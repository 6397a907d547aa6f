"""Preprocessing-stage gating: the hooks run when enabled, the
reference-equivalence profile (deskew=binarize=False, like main.py:171-175)
bypasses them entirely, and unknown/real backends fail loudly."""

from __future__ import annotations

import pytest

from ocr_spark.config import PipelineConfig
from ocr_spark.fixtures import fake_media_content
from ocr_spark.pipeline import run_extraction
from ocr_spark.preproc import get_preprocessor

SPANS_DDL = ("doc_id string, spans array<struct<kind:string,text:string,"
             "media_ref:string,offset:int>>")
MEDIA_DDL = ("media_ref string, content binary, fmt string, width int, "
             "height int, truth_lines array<string>")


def test_fake_preproc_is_identity():
    p = get_preprocessor("fake")
    assert p(b"abc", True, True) == b"abc"


def test_unknown_backend_rejected():
    with pytest.raises(ValueError):
        get_preprocessor("nope")


def test_cv2_backend_fails_loudly_without_opencv():
    p = get_preprocessor("cv2")
    with pytest.raises(RuntimeError, match="opencv"):
        p(b"\x89PNG", True, True)


@pytest.mark.parametrize("deskew,binarize", [(True, True), (False, False)])
def test_pipeline_output_stable_across_preproc_profiles(
    spark, deskew, binarize
):
    """With the fake backend the preproc is identity, so enabling or
    disabling the stage must not change extraction output — this pins the
    plumbing (ordering, gating) without raster assets."""
    spans_df = spark.createDataFrame(
        [("d1", [("media", None, "m1", 0)])], schema=SPANS_DDL
    )
    media_df = spark.createDataFrame(
        [("m1", fake_media_content(["HELLO", "WORLD"]), "img", 1, 1,
          ["HELLO", "WORLD"])],
        schema=MEDIA_DDL,
    )
    cfg = PipelineConfig(deskew=deskew, binarize=binarize)
    row = run_extraction(spark, spans_df, media_df, cfg).collect()[0]
    assert row.spans_out[0].text == "HELLO\nWORLD"
    assert not row.errors
