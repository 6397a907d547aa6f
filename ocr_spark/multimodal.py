"""Multimodal column handling: image/audio/video as opaque ``binary``
columns with typed metadata, processed through Arrow-batched ``mapInPandas``.

The Spark-side plumbing — schemas, batch iteration, partitioning, error
quarantine — is real and tested.  The actual codec work (cv2/PIL/ffmpeg) is
behind backend seams exactly like :mod:`ocr_spark.recognizer`: the ``fake``
backend decodes the deterministic fixture payloads; the ``real`` backend
raises ``NotImplementedError`` until the codec libraries exist on the
cluster image (they are not in this sandbox).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ocr_spark.recognizer import decode_fake_payload

MEDIA_META_SCHEMA = (
    "media_ref string, fmt string, width int, height int, n_lines int, "
    "n_bytes bigint, error string"
)

FRAME_SAMPLE_SCHEMA = (
    "media_ref string, frame_idx int, frame_ref string, error string"
)


# The fake-payload decode lives in ocr_spark.recognizer
# (decode_fake_payload) — ONE definition of the FAKEOCR1 format for the
# OCR path, this metadata path, and tools/gen_truth.py.
_decode_fake = decode_fake_payload


def _decode_real(content: bytes) -> dict:  # pragma: no cover - no codecs here
    raise NotImplementedError(
        "real image/audio decode requires cv2/PIL/ffmpeg on the cluster "
        "image; this sandbox ships none — use backend='fake'"
    )


def extract_media_meta(media_df: DataFrame, backend: str = "fake") -> DataFrame:
    """(media_ref, content, fmt, width, height, …) → typed metadata rows.

    Decode failures become quarantined rows (``error`` set), never task
    failures — same contract as the OCR stage.
    """
    decode = _decode_fake if backend == "fake" else _decode_real

    def meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, content, fmt, width, height in zip(
                pdf["media_ref"], pdf["content"], pdf["fmt"],
                pdf["width"], pdf["height"],
            ):
                row = {
                    "media_ref": ref, "fmt": fmt,
                    # pd.notna guards: a NULL width/height arrives as NaN
                    # (Arrow int column with nulls → float64) and a bare
                    # int(NaN) would fail the whole TASK — metadata
                    # gaps surface as None, never a task failure.
                    "width": int(width) if pd.notna(width) else None,
                    "height": int(height) if pd.notna(height) else None,
                    "n_lines": 0,
                    "n_bytes": int(len(content) if content is not None else 0),
                    "error": None,
                }
                try:
                    if content is None:
                        raise ValueError("missing_media")
                    payload = decode(bytes(content))
                    row["n_lines"] = len(payload.get("lines") or [])
                except NotImplementedError as exc:
                    row["error"] = f"not_implemented:{exc}"
                except Exception as exc:
                    row["error"] = str(exc) or "decode_error"
                rows.append(row)
            yield pd.DataFrame(
                rows,
                columns=["media_ref", "fmt", "width", "height", "n_lines",
                         "n_bytes", "error"],
            )

    return media_df.mapInPandas(meta_batches, schema=MEDIA_META_SCHEMA)


def sample_frames(
    media_df: DataFrame, every_n: int = 2, backend: str = "fake"
) -> DataFrame:
    """Frame-sampling plumbing for video-ish media: one output row per kept
    frame.  The fake backend treats each embedded truth line as one frame;
    the real backend would ffmpeg-seek.  Demonstrates the 1→N expansion
    shape (mapInPandas emitting more rows than it receives)."""
    if every_n < 1:
        # Fail the CALL, not the corpus: every_n=0 quarantined every row
        # with a cryptic range() error, and a negative value silently
        # emitted zero frames with error=None — a config typo reading as
        # "no frames in the corpus".
        raise ValueError(f"every_n must be >= 1 (got {every_n})")
    decode = _decode_fake if backend == "fake" else _decode_real

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                try:
                    if content is None:
                        raise ValueError("missing_media")
                    payload = decode(bytes(content))
                    n = len(payload.get("lines") or [])
                    for i in range(0, n, every_n):
                        rows.append({
                            "media_ref": ref, "frame_idx": i,
                            "frame_ref": f"{ref}#f{i}", "error": None,
                        })
                except NotImplementedError as exc:
                    rows.append({"media_ref": ref, "frame_idx": -1,
                                 "frame_ref": None,
                                 "error": f"not_implemented:{exc}"})
                except Exception as exc:
                    rows.append({"media_ref": ref, "frame_idx": -1,
                                 "frame_ref": None,
                                 "error": str(exc) or "decode_error"})
            yield pd.DataFrame(
                rows, columns=["media_ref", "frame_idx", "frame_ref", "error"]
            )

    return media_df.mapInPandas(frame_batches, schema=FRAME_SAMPLE_SCHEMA)
