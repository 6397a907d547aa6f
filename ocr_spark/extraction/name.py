"""Person-name extraction: anchor/window scans over the ordered line list.

This is the positional "window over lines" operator (SURVEY.md §2.6 W1).
Reference: ``limpiar_y_validar_nombre`` main.py:661-722 and
``extraer_nombre_mejorado`` main.py:728-882.  All quirks preserved:

- token cleaning strips punctuation before the stopword test but the
  reconstruction keeps the *original-cased, original-punctuation* token
  whenever any surviving cleaned token matches it case-insensitively
  (main.py:713-722);
- strategy (a) takes the *last* ≤4 surviving lines above the DOMICILIO
  anchor (main.py:791);
- strategy (b) distinguishes break-on-stop-label vs continue-on-blacklist
  (main.py:815-817);
- every strategy re-validates with "at least two words" before accepting.
"""

from __future__ import annotations

import re

from ocr_spark.constants import (
    NAME_BLACKLIST_REGEX,
    NAME_STOP_LABELS_REGEX,
    NAME_STOPWORDS,
)
from ocr_spark.extraction.lines import normalize_lines

_BLACKLIST = re.compile(NAME_BLACKLIST_REGEX)
_STOP_LABELS = re.compile(NAME_STOP_LABELS_REGEX)
_NON_WORD = re.compile(r"[^\wÁÉÍÓÚÜÑ]")
_DIGIT_CODE = re.compile(r"^\d+[A-Z]*$")
_ONLY_NOMBRE = re.compile(r"NOMBRE")
_NOMBRE_LABEL_LINE = re.compile(r"^NOMBRE\s*$")
_NOMBRE_INLINE = re.compile(r"NOMBRE\s*[:\-]?\s*([A-ZÁÉÍÓÚÜÑ\s\.]{3,})")
_NON_LETTER = re.compile(r"[^A-ZÁÉÍÓÚÜÑ]")


def clean_name(name: str) -> str:
    """Drop administrative/numeric tokens from a candidate name, keeping the
    original casing of survivors (main.py:661-722)."""
    if not name:
        return ""

    upper_tokens = name.upper().split()
    kept_upper: list[str] = []
    for token in upper_tokens:
        cleaned = _NON_WORD.sub("", token)
        if (
            cleaned
            and len(cleaned) > 1
            and cleaned not in NAME_STOPWORDS
            and not cleaned.isdigit()
            and not _DIGIT_CODE.match(cleaned)
        ):
            kept_upper.append(token)

    kept_set = [t.upper() for t in kept_upper]
    survivors = [tok for tok in name.split() if tok.upper() in kept_set]
    return " ".join(survivors)


def _is_name_candidate(upper_line: str) -> bool:
    """Shared per-line predicate for the window scans (main.py:773-784)."""
    if not upper_line:
        return False
    if _STOP_LABELS.search(upper_line):
        return False
    if _BLACKLIST.search(upper_line):
        return False
    if any(ch.isdigit() for ch in upper_line):
        return False
    if len(_NON_LETTER.sub("", upper_line)) < 2:
        return False
    return True


def extract_name(
    lines: list[str], credential_type: str, *,
    assume_normalized: bool = False,
) -> str:
    """Three-strategy cascade, first success wins (main.py:728-882).

    ``assume_normalized=True`` skips the entry normalize pass —
    output-identical when the caller already ran
    :func:`normalize_lines` (it is idempotent, property-tested), and
    saves a full regex pass per document in the pandas-UDF hot path
    (``extract_fields`` normalizes once and fans out).
    """
    clean_lines = lines if assume_normalized else normalize_lines(lines)

    # Strategy (a): look back ≤12 lines above the first DOMICILIO anchor.
    anchor = None
    for i, line in enumerate(clean_lines):
        if "DOMICILIO" in line.upper():
            anchor = i
            break

    if anchor is not None:
        window = clean_lines[max(0, anchor - 12):anchor]
        candidates: list[str] = []
        for raw in window:
            s = raw.strip()
            up = s.upper().strip()
            if not s:
                continue
            if _ONLY_NOMBRE.fullmatch(up):
                continue
            if not _is_name_candidate(up):
                continue
            candidates.append(s)

        if candidates:
            joined = " ".join(candidates[-4:]).strip()
            joined = clean_name(joined).strip()
            if len(joined.split()) >= 2:
                return joined

    # Strategy (b): GH cards — scan forward ≤6 lines after a bare NOMBRE
    # label, then a same-line "NOMBRE: …" regex.
    if credential_type == "GH":
        for i, line in enumerate(clean_lines):
            up = line.upper().strip()
            if _NOMBRE_LABEL_LINE.fullmatch(up):
                parts: list[str] = []
                for j in range(i + 1, min(i + 7, len(clean_lines))):
                    s = clean_lines[j].strip()
                    s_up = s.upper().strip()
                    if _STOP_LABELS.search(s_up):
                        break
                    if _BLACKLIST.search(s_up):
                        continue
                    if not s:
                        continue
                    if any(ch.isdigit() for ch in s_up):
                        continue
                    if len(_NON_LETTER.sub("", s_up)) < 2:
                        continue
                    parts.append(s)

                joined = " ".join(parts).strip()
                joined = clean_name(joined).strip()
                if len(joined.split()) >= 2:
                    return joined

        for line in clean_lines:
            up = line.upper()
            m = _NOMBRE_INLINE.search(up)
            if m:
                candidate = clean_name(m.group(1).strip()).strip()
                cand_up = candidate.upper()
                if (
                    len(candidate.split()) >= 2
                    and not _STOP_LABELS.search(cand_up)
                    and not _BLACKLIST.search(cand_up)
                    and not any(ch.isdigit() for ch in cand_up)
                ):
                    return candidate

    # Strategy (c): first line anywhere with ≥2 words passing all filters.
    # The reference (main.py:858-881) collects EVERY qualifying line into
    # `candidatos` and returns candidatos[0]; only the first is ever used,
    # so returning on the first success is output-identical and skips the
    # regex-heavy clean_name on every later line (per-doc UDF hot path).
    for line in clean_lines:
        up = line.upper().strip()
        if not up:
            continue
        if len(up.split()) < 2:
            continue
        if _STOP_LABELS.search(up):
            continue
        if _BLACKLIST.search(up):
            continue
        if any(ch.isdigit() for ch in up):
            continue
        candidate = clean_name(line.strip()).strip()
        if len(candidate.split()) >= 2:
            return candidate

    return ""
