"""Reference-API compatibility façade.

A user of the reference service interacts with three endpoints; this module
gives them the same request/response *semantics* over this engine, both
per-document (plain dicts, for drop-in shims) and as DataFrame operators
(for batch).  Auth/JWT (main.py:193-231) is deliberately out of scope —
cluster-side access control replaces it (SURVEY.md §2.12).

| reference endpoint | here |
|---|---|
| ``POST /ocr``             | :func:`process_document` (post-OCR; the OCR stage itself is the pipeline's media path) / the full batch pipeline |
| ``POST /separar-nombre``  | :func:`separate_name` / `udfs.split_name_udf` |
| ``GET /health``           | :func:`health` (engine/service metadata; operational health is the lineage table) |
"""

from __future__ import annotations

from typing import Any

from ocr_spark.constants import REF_YEAR
from ocr_spark.extraction.fields import extract_fields
from ocr_spark.extraction.lines import normalize_lines
from ocr_spark.extraction.name_split import (
    split_name_by_curp,
    strip_cp_from_colonia,
)

_DEBUG_TRUTHY = ("1", "true", "True", "yes", "YES")


def process_document(
    texts: list[str], ref_year: int = REF_YEAR, debug: str | bool = False
) -> dict[str, Any]:
    """The ``/ocr`` response for one document's recognized line list
    (main.py:1339-1346): the 16-field record, plus the two debug keys when
    ``debug`` is truthy the way the endpoint's query-arg check is
    (main.py:1342-1344)."""
    datos = extract_fields(list(texts or []), ref_year)
    is_debug = debug is True or (
        isinstance(debug, str) and debug.strip() in _DEBUG_TRUTHY
    )
    if is_debug:
        datos["_ocr_texts"] = normalize_lines(list(texts or []))
        datos["_tipo_detectado"] = datos.get("tipo_credencial", "DESCONOCIDO")
    return datos


def separate_name(payload: dict[str, Any]) -> tuple[dict[str, Any], int]:
    """The ``/separar-nombre`` contract (main.py:1620-1651), including its
    quirks: ``clave_elector`` is required but unused, the response echoes
    the whole input payload plus the three name parts, and ``colonia`` is
    rewritten only when the CP strip actually changed it."""
    data = payload or {}
    nombre = (data.get("nombre") or "").strip()
    curp = (data.get("curp") or "").strip()
    clave_elector = (data.get("clave_elector") or "").strip()
    if not nombre or not curp or not clave_elector:
        return (
            {"error": "❌ Debes enviar al menos: nombre, curp y clave_elector"},
            400,
        )

    partes = split_name_by_curp(nombre, curp)
    codigo_postal = (data.get("codigo_postal") or "").strip()
    colonia = (data.get("colonia") or "").strip()
    colonia_limpia = strip_cp_from_colonia(colonia, codigo_postal)

    resp = dict(data)
    resp["apellido_paterno"] = partes["apellido_paterno"]
    resp["apellido_materno"] = partes["apellido_materno"]
    resp["nombres"] = partes["nombres"]
    if colonia_limpia and colonia_limpia != colonia:
        resp["colonia"] = colonia_limpia
    return resp, 200


def health() -> dict[str, Any]:
    """Static service metadata (the reference's ``/health``,
    main.py:1352-1369).  Operational health of a batch engine lives in the
    lineage table (docs_in/docs_out/wall_ms per bucket), not here."""
    return {
        "status": "OK",
        "service": "ocr-spark extraction engine",
        "version": "0.1.0",
        "features": [
            "Clasificación C/D/GH",
            "Validación CURP/Clave",
            "Extracción mejorada",
            "batch Spark pipeline + lineage/resume",
        ],
    }
