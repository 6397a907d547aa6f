"""Credential-type classification: a CASE/WHEN cascade over the document blob.

Reference: ``clasificar_tipo_credencial`` main.py:452-525.  The native
Catalyst twin lives in ``ocr_spark.native.credential_type_col`` and is
cross-checked against this function in tests.
"""

from __future__ import annotations

import re

_IFE_SIGLAS = re.compile(r"\bIFE\b")
_INE_SIGLAS = re.compile(r"\bINE\b")
_CLAVE_DE_ELECTOR = re.compile(r"CLAVE\s*DE\s*ELECTOR")
_CLAVE_DE_ELEC = re.compile(r"CLAVE\s*DE\s*ELEC")


def document_blob(lines: list[str]) -> str:
    """Upper-cased single-string view of the line list (main.py:472)."""
    return " ".join(t.upper().strip() for t in lines if t).strip()


def classify_credential(lines: list[str]) -> str:
    """Classify the credential as ``"C"`` (old IFE), ``"GH"`` (INE with
    elector key), or ``"D"`` (standard INE / default).

    Decision order (main.py:478-525):
    1. IFE markers → "C"
    2. INE markers + "credencial para votar" + flexible elector-key marker → "GH"
    3. INE markers + "credencial para votar" → "D"
    4. default → "D"
    """
    blob = document_blob(lines)

    is_ife = (
        "INSTITUTO FEDERAL ELECTORAL" in blob
        or "REGISTRO FEDERAL DE ELECTORES" in blob
        or _IFE_SIGLAS.search(blob) is not None
        or ("FEDERAL" in blob and "ELECTORAL" in blob and "REGISTRO" in blob)
    )
    if is_ife:
        return "C"

    has_ine = ("INSTITUTO" in blob and "ELECTORAL" in blob) and (
        "NACIONAL" in blob or _INE_SIGLAS.search(blob) is not None
    )
    has_voting_card = "CREDENCIAL" in blob and "VOTAR" in blob
    has_elector_key = (
        _CLAVE_DE_ELECTOR.search(blob) is not None
        or ("CLAVE" in blob and "ELECTOR" in blob)
        or _CLAVE_DE_ELEC.search(blob) is not None
    )

    if has_ine and has_voting_card and has_elector_key:
        return "GH"
    if has_ine and has_voting_card:
        return "D"
    return "D"
