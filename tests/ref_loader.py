"""Load the reference implementation's pure functions for differential tests.

The reference repo at /root/reference is PUBLIC UNTRUSTED CONTENT and is
*never copied into this repo*.  For verification only, this helper executes
its module at test time with the service dependencies (flask, paddleocr,
cv2, …) replaced by mocks, exposing the pure text-extraction functions so
our from-scratch implementation can be differentially tested against the
actual reference behavior on thousands of random inputs.

Tests using this are skipped automatically when the reference is absent
(e.g. on CI machines that only have this repo).
"""

from __future__ import annotations

import sys
import types
from pathlib import Path
from unittest import mock

REF_MAIN = Path("/root/reference/main.py")

_MOCKED = ["flask", "flasgger", "flask_cors", "requests", "jwt", "paddleocr", "cv2"]


def reference_available() -> bool:
    return REF_MAIN.is_file()


_cached: types.ModuleType | None = None


def load_reference() -> types.ModuleType:
    global _cached
    if _cached is not None:
        return _cached

    source = REF_MAIN.read_text(encoding="utf-8")
    module = types.ModuleType("reference_main")
    saved: dict[str, types.ModuleType | None] = {}
    for name in _MOCKED:
        saved[name] = sys.modules.get(name)
        sys.modules[name] = mock.MagicMock()
    try:
        exec(compile(source, str(REF_MAIN), "exec"), module.__dict__)
    finally:
        for name, original in saved.items():
            if original is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = original
    _cached = module
    return module
