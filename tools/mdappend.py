"""Marker-aware appends to the evidence markdown (BENCH/BASELINE.md).

``tools/scaling_bench.py --out`` REGENERATES its report section and
preserves only what sits below :data:`MANUAL_MARKER` — so every other
writer (``tools/stress_bench.py``, ``bench.py --addendum``) must land
its block BELOW that marker, inserting it first when the file does not
carry one yet.  Appending at bare EOF was the silent-loss path: a block
appended to a marker-less file was destroyed by the next ``--out``
regeneration.
"""

from __future__ import annotations

import os

MANUAL_MARKER = "<!-- MANUAL ADDENDA: preserved across --out regenerations -->"


def append_addendum(path: str, block: str) -> None:
    """Append ``block`` to ``path`` below :data:`MANUAL_MARKER`,
    creating the file (marker first) or inserting the marker at EOF when
    absent, so a later report regeneration can never clobber it."""
    if os.path.dirname(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
    if os.path.exists(path):
        with open(path, encoding="utf-8") as fh:
            content = fh.read()
        if MANUAL_MARKER not in content:
            with open(path, "a", encoding="utf-8") as fh:
                if content and not content.endswith("\n"):
                    fh.write("\n")
                fh.write(f"\n{MANUAL_MARKER}\n")
    else:
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(f"{MANUAL_MARKER}\n")
    with open(path, "a", encoding="utf-8") as fh:
        fh.write(block)
