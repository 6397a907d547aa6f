"""End-to-end golden tests: the north-star invariant.

Exact span-sequence equality ``(kind, text, media_ref, order)`` per doc_id
between the distributed pipeline and the doc-by-doc oracle, plus the fields
struct and the quarantine rows.
"""

from __future__ import annotations

import pytest

from ocr_spark.config import PipelineConfig
from ocr_spark.fixtures import build_corpus, corpus_dataframes, fake_media_content
from ocr_spark.pipeline import run_extraction

from tests.oracle import expected_document

N_DOCS = 120
SEED = 42


@pytest.fixture(scope="module")
def pipeline_output(spark):
    cfg = PipelineConfig()
    spans_df, media_df = corpus_dataframes(spark, seed=SEED, n_docs=N_DOCS)
    actual = {
        r.doc_id: r
        for r in run_extraction(spark, spans_df, media_df, cfg).collect()
    }
    span_rows, media_rows = build_corpus(SEED, N_DOCS)
    media_by_ref = {m["media_ref"]: m for m in media_rows}
    expected = {
        r["doc_id"]: expected_document(r, media_by_ref, cfg) for r in span_rows
    }
    return actual, expected


def test_every_document_present(pipeline_output):
    actual, expected = pipeline_output
    assert sorted(actual) == sorted(expected)


def test_span_sequence_equality(pipeline_output):
    """THE invariant: (kind, text, media_ref, order) per doc, exactly."""
    actual, expected = pipeline_output
    for doc_id, exp in expected.items():
        got = [
            (s.kind, s.text, s.media_ref, s.offset)
            for s in actual[doc_id].spans_out
        ]
        assert got == exp["spans_out"], doc_id


def test_fields_equality(pipeline_output):
    actual, expected = pipeline_output
    for doc_id, exp in expected.items():
        got = actual[doc_id].fields.asDict()
        assert got == exp["fields"], doc_id


def test_quarantine_rows(pipeline_output):
    actual, expected = pipeline_output
    for doc_id, exp in expected.items():
        got = sorted(
            (e.offset, e.media_ref, e.error) for e in actual[doc_id].errors
        )
        assert got == exp["errors"], doc_id
    # the generator's 1% broken media must actually exercise the path
    total_errors = sum(len(e["errors"]) for e in expected.values())
    assert total_errors > 0


def test_media_heavy_skew_cohort_survives(pipeline_output):
    """The 2% heavy docs (50..200 media spans) must come back complete and
    ordered — this is the salting path."""
    actual, expected = pipeline_output
    heavy = [d for d, e in expected.items() if len(e["spans_out"]) >= 50]
    assert heavy, "corpus must contain media-heavy docs"
    for doc_id in heavy:
        got_offsets = [s.offset for s in actual[doc_id].spans_out]
        assert got_offsets == sorted(got_offsets)
        assert len(got_offsets) == len(expected[doc_id]["spans_out"])


def test_timeout_budget_quarantines_not_kills(spark):
    cfg = PipelineConfig(media_time_budget_s=0.1)
    spans_df = spark.createDataFrame(
        [("d1", [("media", None, "m_slow", 0), ("text", "ok   text", None, 1)])],
        schema="doc_id string, spans array<struct<kind:string,text:string,"
               "media_ref:string,offset:int>>",
    )
    media_df = spark.createDataFrame(
        [("m_slow", fake_media_content(["X"], sleep_s=0.5), "img", 1, 1, ["X"])],
        schema="media_ref string, content binary, fmt string, width int, "
               "height int, truth_lines array<string>",
    )
    row = run_extraction(spark, spans_df, media_df, cfg).collect()[0]
    assert [e.error for e in row.errors] == ["timeout"]
    assert row.spans_out[0].text is None
    assert row.spans_out[1].text == "ok text"


def test_raw_profile_disables_boilerplate_strip(spark):
    cfg = PipelineConfig(strip_html=False)
    html = "<p>hello</p>"
    spans_df = spark.createDataFrame(
        [("d1", [("text", html, None, 0)])],
        schema="doc_id string, spans array<struct<kind:string,text:string,"
               "media_ref:string,offset:int>>",
    )
    media_df = spark.createDataFrame(
        [], schema="media_ref string, content binary, fmt string, width int, "
                   "height int, truth_lines array<string>",
    )
    row = run_extraction(spark, spans_df, media_df, cfg).collect()[0]
    assert row.spans_out[0].text == html


def test_oversized_doc_quarantined_batch_commits(spark):
    """Monster-document guard: a doc whose span count exceeds
    max_spans_per_doc is quarantined (error row, empty spans_out,
    fields-of-no-lines — identical to a genuinely empty document) with NO
    per-span work spent on it, while every other doc in the batch
    processes normally — fail the document, commit the batch.  The
    50k-span monster is built executor-side (sequence+transform), not as
    a driver list.  The guard is mark-in-the-explode (single input scan);
    a filter-and-union shape would re-scan the whole table."""
    from pyspark.sql import functions as F

    cfg = PipelineConfig(max_spans_per_doc=49_999)
    spans_df, media_df = corpus_dataframes(spark, seed=SEED, n_docs=8)
    monster = spark.range(1).select(
        F.lit("monster").alias("doc_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(49_999)),  # 50,000 spans
            lambda i: F.struct(
                F.lit("text").alias("kind"),
                F.concat(F.lit("span "), i.cast("string")).alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                i.cast("int").alias("offset"),
            ),
        ).alias("spans"),
    )
    out = {
        r.doc_id: r
        for r in run_extraction(
            spark, spans_df.unionByName(monster), media_df, cfg
        ).collect()
    }

    m = out["monster"]
    assert list(m.spans_out) == []
    assert [e.error for e in m.errors] == ["oversized_doc:50000"]
    # fields = the extraction cascade over zero lines (same as an empty
    # document): classification default 'D', every field empty
    assert m.fields.tipo_credencial == "D" and m.fields.curp == ""

    # the rest of the batch is untouched by the guard: identical rows to
    # a run without the monster
    base = {
        r.doc_id: r
        for r in run_extraction(spark, spans_df, media_df, cfg).collect()
    }
    others = {k: v for k, v in out.items() if k != "monster"}
    assert others == base

    # ceiling-off profile keeps legacy behavior (the monster processes)
    cfg_off = PipelineConfig(max_spans_per_doc=None)
    n = (
        run_extraction(spark, monster, media_df, cfg_off)
        .select(F.size("spans_out").alias("n")).collect()[0].n
    )
    assert n == 50_000

def test_oversized_marker_not_spoofable_by_input_kind(spark):
    """The oversized flag is an out-of-band column, not a reserved kind
    string: a genuine input span whose kind happens to look like a
    sentinel ("__oversized__:junk") must flow the normal unknown-kind
    quarantine path — present in spans_out, error attributing the real
    cause — never be mistaken for a tripped span ceiling."""
    cfg = PipelineConfig(max_spans_per_doc=100)
    spans_df = spark.createDataFrame(
        [("d1", [("__oversized__:junk", "body", None, 0),
                 ("text", "ok", None, 1)])],
        schema="doc_id string, spans array<struct<kind:string,text:string,"
               "media_ref:string,offset:int>>",
    )
    media_df = spark.createDataFrame(
        [], schema="media_ref string, content binary, fmt string, width int, "
                   "height int, truth_lines array<string>",
    )
    row = run_extraction(spark, spans_df, media_df, cfg).collect()[0]
    assert [s.kind for s in row.spans_out] == ["__oversized__:junk", "text"]
    assert [e.error for e in row.errors] == [
        "unknown_kind:__oversized__:junk"
    ]
