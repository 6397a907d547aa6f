"""Line-sequence primitives: normalization and ordered first-match search.

The engine's central data structure is the *ordered* list of recognized
text lines; every extractor below is defined over that order (reference
semantics: main.py:1097-1186).
"""

from __future__ import annotations

import re

from ocr_spark.constants import REF_YEAR

_WS = re.compile(r"\s+")
_FOUR_DIGITS = re.compile(r"\d{4}")


def normalize_lines(lines: list[str] | None) -> list[str]:
    """Collapse runs of whitespace, trim, and drop empty lines.

    Reference: ``normalizar_textos`` main.py:1150-1169.  Order-preserving;
    idempotent (property-tested).
    """
    out: list[str] = []
    for raw in lines or []:
        collapsed = _WS.sub(" ", (raw or "").strip())
        if collapsed:
            out.append(collapsed)
    return out


def _plausible_date(value: str, ref_year: int) -> bool:
    """DD/MM/YYYY sanity window used by the birthdate scan (main.py:1120-1123)."""
    try:
        day, month, year = map(int, value.split("/"))
    except Exception:
        return False
    return 1 <= day <= 31 and 1 <= month <= 12 and 1900 <= year <= ref_year


def _plausible_year_pair(value: str) -> bool:
    """Two 4-digit years, each in [1900, 2099], strictly increasing
    (main.py:1132-1137)."""
    years = _FOUR_DIGITS.findall(value)
    if len(years) != 2:
        return False
    y1, y2 = int(years[0]), int(years[1])
    return 1900 <= y1 <= 2099 and 1900 <= y2 <= 2099 and y2 > y1


def search_lines(pattern: str, lines: list[str], ref_year: int = REF_YEAR) -> str:
    """Scan lines in order; return group(1) of the first *valid* match.

    Replicates ``buscar_en_lista`` (main.py:1097-1144) including its quirk of
    dispatching extra validation by inspecting the pattern source text:

    - patterns containing ``\\d{2}/\\d{2}/\\d{4}``: the matched date must be
      plausible (day 1-31, month 1-12, year 1900..ref_year) or the scan
      continues with the next line;
    - patterns containing ``\\d{4}\\s*[-]``: the match must contain exactly
      two plausible, strictly increasing years;
    - anything else: first match wins.

    Only the first match per line is considered (``re.search``), exactly as
    in the reference.
    """
    compiled = re.compile(pattern)
    if "\\d{2}/\\d{2}/\\d{4}" in pattern:
        for line in lines:
            m = compiled.search(line)
            if m and _plausible_date(m.group(1), ref_year):
                return m.group(1)
        return ""
    if "\\d{4}\\s*[-]" in pattern:
        for line in lines:
            m = compiled.search(line)
            if m and _plausible_year_pair(m.group(1)):
                return m.group(1)
        return ""
    for line in lines:
        m = compiled.search(line)
        if m:
            return m.group(1)
    return ""


def find_section(lines: list[str]) -> str:
    """First line that is *exactly* four digits (after strip) → electoral
    section.  Reference: ``buscar_seccion`` main.py:1172-1186."""
    for line in lines:
        stripped = line.strip()
        if _FOUR_DIGITS.fullmatch(stripped):
            return stripped
    return ""
