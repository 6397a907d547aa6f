"""Validity-period ("vigencia") extraction: positional scans + formatting.

Reference: ``extraer_vigencia_correcta`` main.py:888-965.  Three strategies
in order, each with its quirks preserved:

1. a line containing VIGENCIA: same-line year-pair regex, else scan the next
   ≤2 lines.  The look-ahead window is positioned with ``list.index(line)``
   — i.e. the *first occurrence of equal text* — which mis-windows duplicate
   lines.  That latent reference bug is replicated on purpose (golden
   equality demands it).
2. any line with a plausible ``YYYY-YYYY`` pair (checked per line *within*
   the same loop as strategy 1, so a later VIGENCIA line can lose to an
   earlier bare year-pair);
3. a VIGENCIA line followed by split years across the next lines, pairing a
   lone year with one from the following line.
"""

from __future__ import annotations

import re

from ocr_spark.extraction.lines import (
    _plausible_year_pair,
    normalize_lines,
)

_SAME_LINE = re.compile(r"VIGENCIA\s*[:\-]?\s*(\d{4}\s*[-\s]+\s*\d{4})")
_YEAR_PAIR_LOOSE = re.compile(r"(\d{4}\s*[-\s]+\s*\d{4})")
_YEAR_PAIR_DASH = re.compile(r"\b(\d{4}\s*[-]\s*\d{4})\b")
_PLAUSIBLE_YEAR = re.compile(r"\b(19\d{2}|20\d{2})\b")
_WS = re.compile(r"\s+")


def _format_pair(value: str) -> str:
    """Normalize any matched pair to ``"YYYY - YYYY"`` (main.py:918)."""
    return _WS.sub(" ", value.replace("-", " - ").strip())


def extract_validity(
    lines: list[str], credential_type: str, *,
    assume_normalized: bool = False,
) -> str:
    """Extract the validity period as ``"YYYY - YYYY"`` or ``""``.

    ``assume_normalized`` as in :func:`ocr_spark.extraction.name.extract_name`:
    skip the (idempotent) entry normalize when the caller already did it.
    """
    clean = lines if assume_normalized else normalize_lines(lines)

    for line in clean:
        upper = line.upper()

        if "VIGENCIA" in upper:
            m = _SAME_LINE.search(upper)
            if m:
                return _format_pair(m.group(1))

            # Reference quirk: window anchored at the FIRST occurrence of
            # equal text, not the current index (main.py:922).
            idx = clean.index(line)
            for j in range(idx + 1, min(idx + 3, len(clean))):
                m = _YEAR_PAIR_LOOSE.search(clean[j])
                if m:
                    return _format_pair(m.group(1))

        m = _YEAR_PAIR_DASH.search(line)
        if m and _plausible_year_pair(m.group(1)):
            return _format_pair(m.group(1))

    for i, line in enumerate(clean):
        if "VIGENCIA" in line.upper():
            for j in range(i, min(i + 3, len(clean))):
                years = _PLAUSIBLE_YEAR.findall(clean[j])
                if len(years) >= 2:
                    return f"{years[0]} - {years[1]}"
                if len(years) == 1 and j > i:
                    following = clean[j + 1] if j + 1 < len(clean) else ""
                    m = _PLAUSIBLE_YEAR.search(following)
                    if m:
                        return f"{years[0]} - {m.group(1)}"

    return ""
