"""CURP / elector-key substring parsers (the dimension-lookup operators).

Reference: ``extraer_datos_desde_curp`` main.py:531-598 and
``extraer_datos_desde_clave_elector`` main.py:604-655.  The reference's
``datetime.now()`` (main.py:583, 651) is replaced by ``ref_year``.
"""

from __future__ import annotations

import re

from ocr_spark.constants import CURP_STATE_CODES, ELECTOR_STATE_CODES, REF_YEAR

_FOUR_DIGIT_TOKEN = re.compile(r"\b(\d{4})\b")
_PLAUSIBLE_YEAR = re.compile(r"\b(19\d{2}|20[0-2]\d)\b")


def parse_curp(curp: str, ref_year: int = REF_YEAR) -> dict[str, str]:
    """Demographics from a CURP string.

    Output keys: ``sexo`` (H/M/X), ``fecha_nacimiento`` (DD/MM/YYYY),
    ``entidad_nacimiento`` (2-letter code), ``estado`` (full state name).

    Century pivot (main.py:583-587): with the two-digit birth year YY and
    two-digit ref year RR, YY > RR → 19YY else 20YY.  Strings shorter than
    16 chars yield all-empty output (main.py:563).
    """
    out = {"sexo": "", "fecha_nacimiento": "", "entidad_nacimiento": "", "estado": ""}
    if not curp or len(curp) < 16:
        return out

    sex_char = curp[10].upper()
    out["sexo"] = sex_char if sex_char in ("H", "M") else "X"

    # The reference can only ever see regex-validated CURPs here (digits at
    # 4:10, main.py:997); for arbitrary strings the engine defines a
    # non-numeric year as "no date" instead of crashing the task.
    yy, mm, dd = curp[4:6], curp[6:8], curp[8:10]
    try:
        yy_num = int(yy)
    except ValueError:
        yy_num = None
    if yy_num is not None:
        century = "19" if yy_num > ref_year % 100 else "20"
        out["fecha_nacimiento"] = f"{dd}/{mm}/{century}{yy}"

    state_code = curp[11:13].upper()
    out["entidad_nacimiento"] = state_code
    out["estado"] = CURP_STATE_CODES.get(state_code, "")
    return out


def parse_elector_key(key: str, ref_year: int = REF_YEAR) -> dict[str, str]:
    """Geography/registry info from an elector key.

    Output keys: ``estado_clave``, ``seccion_clave`` (first standalone
    4-digit token), ``anio_registro_clave`` (first plausible year in
    [1900, ref_year+1]).  Keys shorter than 13 chars yield all-empty output
    (main.py:632).
    """
    out = {"estado_clave": "", "seccion_clave": "", "anio_registro_clave": ""}
    if not key or len(key) < 13:
        return out

    out["estado_clave"] = ELECTOR_STATE_CODES.get(key[0:2], "")

    section = _FOUR_DIGIT_TOKEN.search(key)
    if section:
        out["seccion_clave"] = section.group(1)

    for m in _PLAUSIBLE_YEAR.finditer(key):
        year = int(m.group())
        if 1900 <= year <= ref_year + 1:
            out["anio_registro_clave"] = str(year)
            break
    return out
