"""Name splitting guided by the CURP prefix: generate → score → argmax.

Reference: main.py:1376-1527 (helpers ``_solo_letras``,
``_quitar_particulas``, ``_primera_vocal_interna``,
``_primer_nombre_para_curp``, ``_curp_prefijo_4``,
``separar_nombre_por_curp_y_tokens``) and the colonia/postal-code cleanup
``limpiar_colonia_con_cp`` main.py:1530-1545.

Relational shape: enumerate at most 3×3 surname splits per row, score each
candidate's derived CURP-4 prefix against ``curp[:4]`` (+10 exact-match
bonus, −5 empty-name penalty), keep the argmax with first-wins tie-break
(strict ``>``, main.py:1513).
"""

from __future__ import annotations

import re

from ocr_spark.constants import SURNAME_PARTICLES

_NON_LETTER = re.compile(r"[^A-ZÁÉÍÓÚÜÑ\s]")
_WS = re.compile(r"\s+")
_VOWEL = re.compile(r"[AEIOUÁÉÍÓÚÜ]")
_CURP_FIRST_NAMES = {"JOSE", "JOSÉ", "MARIA", "MARÍA"}


def letters_only(s: str) -> str:
    """Uppercase; keep only letters (incl. Ñ/accents) and spaces
    (main.py:1376-1383)."""
    if not s:
        return ""
    s = s.upper().strip()
    s = _NON_LETTER.sub(" ", s)
    return _WS.sub(" ", s).strip()


def _drop_particles(tokens: list[str]) -> list[str]:
    """Remove surname particles when deriving CURP initials
    (main.py:1386-1395)."""
    return [t for t in tokens if t and t not in SURNAME_PARTICLES]


def _first_internal_vowel(word: str) -> str:
    """First vowel after the first character of the paternal surname
    (main.py:1398-1407)."""
    if not word:
        return ""
    word = letters_only(word).replace(" ", "")
    if len(word) < 2:
        return ""
    m = _VOWEL.search(word[1:])
    return m.group(0) if m else ""


def _curp_first_name(name_tokens: list[str]) -> str:
    """JOSE/MARÍA rule: skip a leading JOSE/MARÍA when a second name exists
    (main.py:1410-1422)."""
    if not name_tokens:
        return ""
    nt = _drop_particles([t.upper() for t in name_tokens])
    if not nt:
        return ""
    if nt[0] in _CURP_FIRST_NAMES and len(nt) >= 2:
        return nt[1]
    return nt[0]


def curp_prefix4(paternal: str, maternal: str, given: str) -> str:
    """Derive the 4-char CURP prefix from name parts (main.py:1425-1446)."""
    pat_tokens = _drop_particles(letters_only(paternal).split())
    mat_tokens = _drop_particles(letters_only(maternal).split())
    given_tokens = letters_only(given).split()

    pat_base = pat_tokens[0] if pat_tokens else ""
    mat_base = mat_tokens[0] if mat_tokens else ""
    first_given = _curp_first_name(given_tokens)

    return (
        f"{pat_base[:1]}{_first_internal_vowel(pat_base)}"
        f"{mat_base[:1]}{first_given[:1]}"
    ).upper()


def split_name_by_curp(full_name: str, curp: str) -> dict[str, str]:
    """Split a full name into (paternal surname, maternal surname, given
    names), choosing the split whose CURP-4 prefix best matches
    ``curp[:4]`` (main.py:1449-1527)."""
    full_name = letters_only(full_name)
    curp = (curp or "").upper().strip()

    out = {"apellido_paterno": "", "apellido_materno": "", "nombres": ""}

    tokens = [t for t in full_name.split() if t]
    if len(tokens) < 3:
        if len(tokens) == 2:
            out["apellido_paterno"] = tokens[0]
            out["nombres"] = tokens[1]
        elif len(tokens) == 1:
            out["nombres"] = tokens[0]
        return out

    if len(curp) < 4:
        out["apellido_paterno"] = tokens[0]
        out["apellido_materno"] = tokens[1]
        out["nombres"] = " ".join(tokens[2:])
        return out

    target = curp[:4]
    best: tuple[int, str, str, str] | None = None

    for i in range(1, min(3, len(tokens) - 1) + 1):
        for j in range(1, min(3, len(tokens) - i) + 1):
            if i + j >= len(tokens):
                continue
            paternal = " ".join(tokens[:i])
            maternal = " ".join(tokens[i:i + j])
            given = " ".join(tokens[i + j:])

            prefix = curp_prefix4(paternal, maternal, given)
            score = sum(1 for a, b in zip(prefix, target) if a == b)
            if prefix == target:
                score += 10
            # Replicated VERBATIM from the reference (main.py:1508-1510)
            # where it is equally unreachable: the `i + j >= len(tokens):
            # continue` guard above guarantees `given` has >= 1 token, so
            # this "-5 empty-given penalty" never fires — in either
            # implementation.  Kept (not removed) so a line-by-line
            # parity check against the reference scoring loop holds.
            if len(given.split()) == 0:
                score -= 5

            if best is None or score > best[0]:
                best = (score, paternal, maternal, given)

    if best:
        _, paternal, maternal, given = best
        out["apellido_paterno"] = paternal
        out["apellido_materno"] = maternal
        out["nombres"] = given
        return out

    out["apellido_paterno"] = tokens[0]
    out["apellido_materno"] = tokens[1]
    out["nombres"] = " ".join(tokens[2:])
    return out


def strip_cp_from_colonia(colonia: str, postal_code: str) -> str:
    """Remove an exact postal-code *token* embedded in the colonia string
    (main.py:1530-1545).  Word-bounded so longer numbers survive."""
    colonia = (colonia or "").strip()
    cp = (postal_code or "").strip()
    if not colonia or not cp:
        return colonia
    stripped = re.sub(rf"(\b{re.escape(cp)}\b)", "", colonia)
    return _WS.sub(" ", stripped).strip()
