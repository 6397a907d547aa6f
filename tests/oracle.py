"""Doc-by-doc oracle: computes the expected pipeline output without Spark.

Uses the exact same pinned-behavior functions as the executor-side UDFs, so
any Spark-vs-oracle difference can only come from distribution mechanics
(partitioning, join, splice order) — which is precisely what the e2e test
needs to verify.
"""

from __future__ import annotations

from ocr_spark.boilerplate import strip_boilerplate
from ocr_spark.config import PipelineConfig
from ocr_spark.extraction.fields import extract_fields
from ocr_spark.recognizer import FakeRecognizer


def expected_document(
    span_row: dict, media_by_ref: dict[str, dict], cfg: PipelineConfig
) -> dict:
    """Expected (spans_out, fields, errors) for one corpus document."""
    recognizer = FakeRecognizer()
    spans_out: list[tuple] = []
    doc_lines: list[str] = []
    errors: list[tuple] = []

    for span in sorted(span_row["spans"], key=lambda s: s["offset"]):
        if span["kind"] == "text":
            text = (
                strip_boilerplate(span["text"]) if cfg.strip_html
                else span["text"]
            )
            spans_out.append(("text", text, None, span["offset"]))
        else:
            media = media_by_ref.get(span["media_ref"])
            if media is None:
                error, lines = "missing_media", []
            else:
                result = recognizer.recognize(media["content"])
                error, lines = result.error, result.lines
            if error is not None:
                errors.append((span["offset"], span["media_ref"], error))
                text = None
            else:
                text = "\n".join(lines)
                doc_lines.extend(lines)
            spans_out.append(("media", text, span["media_ref"], span["offset"]))

    return {
        "doc_id": span_row["doc_id"],
        "spans_out": spans_out,
        "fields": extract_fields(doc_lines, cfg.ref_year),
        "errors": sorted(errors),
    }
