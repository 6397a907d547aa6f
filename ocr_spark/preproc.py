"""Media preprocessing stage: deskew + binarize before recognition.

The reference explicitly DISABLES its engine's preprocessing for speed
(main.py:170-175 set use_doc_orientation_classify / use_doc_unwarping /
use_textline_orientation all False); the target spec mandates deskew +
binarize as an explicit pipeline stage.  Both are therefore config-gated
(`PipelineConfig.deskew` / `.binarize`), with the reference-equivalence
test profile turning them off exactly like the reference does.

Backends follow the recognizer seam pattern:
- ``fake``: identity on the fixture payloads (they are not raster images) —
  the stage's plumbing, ordering and gating are still exercised and tested;
- ``cv2``: real implementations (minAreaRect deskew, Otsu binarize),
  import-gated because OpenCV does not ship in this sandbox.
"""

from __future__ import annotations


def _preproc_fake(content: bytes, deskew: bool, binarize: bool) -> bytes:
    return content


def _preproc_cv2(content: bytes, deskew: bool, binarize: bool) -> bytes:  # pragma: no cover
    try:
        import cv2
        import numpy as np
    except ImportError as exc:
        raise RuntimeError(
            "cv2 preprocessing requires opencv; use preproc_backend='fake'"
        ) from exc

    img = cv2.imdecode(np.frombuffer(content, np.uint8), cv2.IMREAD_COLOR)
    if img is None:
        return content
    gray = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    if deskew:
        coords = cv2.findNonZero(cv2.bitwise_not(
            cv2.threshold(gray, 0, 255,
                          cv2.THRESH_BINARY + cv2.THRESH_OTSU)[1]))
        if coords is not None:
            angle = cv2.minAreaRect(coords)[-1]
            # minAreaRect's angle convention CHANGED in OpenCV 4.5:
            # pre-4.5 returns [-90, 0), modern returns (0, 90].  The
            # classic `-(90+angle) if angle < -45` fold handles only the
            # old range — under a modern cv2 a near-upright page
            # reporting ~89° would be rotated ~-89° (sideways,
            # destroying OCR).  Fold BOTH conventions into the nearest
            # small skew in (-45, 45], then rotate by its negation.
            if angle < -45:
                angle += 90
            elif angle > 45:
                angle -= 90
            angle = -angle
            h, w = gray.shape
            m = cv2.getRotationMatrix2D((w / 2, h / 2), angle, 1.0)
            gray = cv2.warpAffine(gray, m, (w, h), flags=cv2.INTER_CUBIC,
                                  borderMode=cv2.BORDER_REPLICATE)
    out = gray
    if binarize:
        out = cv2.threshold(gray, 0, 255,
                            cv2.THRESH_BINARY + cv2.THRESH_OTSU)[1]
    ok, buf = cv2.imencode(".png", out)
    return bytes(buf) if ok else content


_BACKENDS = {"fake": _preproc_fake, "cv2": _preproc_cv2}


def get_preprocessor(backend: str = "fake"):
    try:
        return _BACKENDS[backend]
    except KeyError:
        raise ValueError(f"unknown preproc backend: {backend}") from None
