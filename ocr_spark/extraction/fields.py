"""The master per-document extraction cascade (lines → 16-field record).

Reference: ``extraer_campos_ine_mejorado`` main.py:971-1091.  This is a pure
function of the ordered line list plus ``ref_year`` — exactly the property
that makes the whole engine testable without any OCR model and lets the same
code run inside the Arrow-batched pandas UDF on executors.
"""

from __future__ import annotations

import re
from typing import Any

from ocr_spark.constants import (
    BIRTHDATE_REGEX,
    CURP_REGEX,
    ELECTOR_KEY_REGEX_18,
    ELECTOR_KEY_REGEX_FLEX,
    POSTAL_CODE_REGEX,
    REF_YEAR,
    REGISTRY_YEAR_REGEX,
    SEX_REGEX,
    STREET_NUMBER_REGEX,
    VALIDITY_FALLBACK_REGEX,
)
from ocr_spark.extraction.classify import classify_credential
from ocr_spark.extraction.ids import parse_curp, parse_elector_key
from ocr_spark.extraction.lines import find_section, normalize_lines, search_lines
from ocr_spark.extraction.name import extract_name
from ocr_spark.extraction.validity import extract_validity

_STREET_NUMBER = re.compile(STREET_NUMBER_REGEX)
_WS = re.compile(r"\s+")

# Stable output column order (the reference's response dict keys,
# main.py:1011-1048).
FIELD_ORDER: tuple[str, ...] = (
    "tipo_credencial", "es_ine", "nombre", "curp", "clave_elector",
    "fecha_nacimiento", "anio_registro", "seccion", "vigencia", "sexo",
    "pais", "calle", "colonia", "estado", "numero", "codigo_postal",
)


def extract_fields(lines: list[str], ref_year: int = REF_YEAR) -> dict[str, Any]:
    """Run the full extraction cascade over one document's line list."""
    clean = normalize_lines(lines)

    credential_type = classify_credential(clean)

    curp = search_lines(CURP_REGEX, clean, ref_year)
    elector_key = search_lines(ELECTOR_KEY_REGEX_18, clean, ref_year) or search_lines(
        ELECTOR_KEY_REGEX_FLEX, clean, ref_year
    )

    curp_info = parse_curp(curp, ref_year)
    key_info = parse_elector_key(elector_key, ref_year)

    fields: dict[str, Any] = {
        "tipo_credencial": credential_type,
        "es_ine": "INSTITUTO NACIONAL ELECTORAL"
        in " ".join(t.upper() for t in clean),
        "nombre": extract_name(clean, credential_type,
                               assume_normalized=True),
        "curp": curp,
        "clave_elector": elector_key,
        "fecha_nacimiento": search_lines(BIRTHDATE_REGEX, clean, ref_year),
        "anio_registro": search_lines(REGISTRY_YEAR_REGEX, clean, ref_year),
        "seccion": find_section(clean),
        "vigencia": extract_validity(clean, credential_type,
                                     assume_normalized=True),
        "sexo": search_lines(SEX_REGEX, clean, ref_year),
        "pais": "Mex",
    }

    # Positional address slice: the 3 lines after the first DOMICILIO anchor
    # (main.py:1026-1040).
    anchor = None
    for i, line in enumerate(clean):
        if "DOMICILIO" in line.upper():
            anchor = i
            break
    if anchor is not None:
        fields["calle"] = clean[anchor + 1] if len(clean) > anchor + 1 else ""
        fields["colonia"] = clean[anchor + 2] if len(clean) > anchor + 2 else ""
        fields["estado"] = clean[anchor + 3] if len(clean) > anchor + 3 else ""
    else:
        fields["calle"] = ""
        fields["colonia"] = ""
        fields["estado"] = ""

    number_match = _STREET_NUMBER.search(fields["calle"])
    fields["numero"] = number_match.group(1) if number_match else ""

    fields["codigo_postal"] = search_lines(
        POSTAL_CODE_REGEX, [fields["colonia"], fields["estado"]], ref_year
    )

    # Missing-field completion from the parsed CURP / elector key
    # (main.py:1054-1075).
    if not fields["sexo"] and curp_info["sexo"]:
        fields["sexo"] = curp_info["sexo"]
    if not fields["fecha_nacimiento"] and curp_info["fecha_nacimiento"]:
        fields["fecha_nacimiento"] = curp_info["fecha_nacimiento"]
    if not fields["seccion"] and key_info["seccion_clave"]:
        fields["seccion"] = key_info["seccion_clave"]
    if not fields["anio_registro"] and key_info["anio_registro_clave"]:
        fields["anio_registro"] = key_info["anio_registro_clave"] + " 00"
    if not fields["estado"] or len(fields["estado"].strip()) < 5:
        if curp_info["estado"]:
            fields["estado"] = curp_info["estado"]
        elif key_info["estado_clave"]:
            fields["estado"] = key_info["estado_clave"]

    if fields["anio_registro"] and " " not in fields["anio_registro"]:
        fields["anio_registro"] = fields["anio_registro"] + " 00"

    if not fields["vigencia"]:
        fallback = search_lines(VALIDITY_FALLBACK_REGEX, clean, ref_year)
        if fallback:
            fields["vigencia"] = fallback

    if fields["vigencia"]:
        fields["vigencia"] = _WS.sub(
            " ", fields["vigencia"].replace("-", " - ").strip()
        )

    return fields
