"""Reference-API façade: response shapes and quirks, differentially checked
against the reference implementation where its pure functions allow."""

from __future__ import annotations

from random import Random

import pytest

from ocr_spark.api import health, process_document, separate_name
from ocr_spark.fixtures import gen_ine_lines

from tests.ref_loader import load_reference, reference_available

needs_ref = pytest.mark.skipif(
    not reference_available(), reason="reference repo absent"
)


def test_separate_name_requires_all_three_fields():
    resp, code = separate_name({"nombre": "A B C", "curp": "X" * 18})
    assert code == 400 and "error" in resp
    # clave_elector is required but never used (main.py:1628 quirk)
    resp, code = separate_name(
        {"nombre": "CASTILLO OLIVERA RICARDO ORLANDO",
         "curp": "CAOR930531HQRSLC09", "clave_elector": "whatever"}
    )
    assert code == 200


def test_separate_name_swagger_example():
    """The reference author's own worked example (main.py:1569-1616)."""
    resp, code = separate_name({
        "nombre": "CASTILLO OLIVERA RICARDO ORLANDO",
        "curp": "CAOR930531HQRSLC09",
        "clave_elector": "CSOLRC93053123H100",
    })
    assert code == 200
    assert resp["apellido_paterno"] == "CASTILLO"
    assert resp["apellido_materno"] == "OLIVERA"
    assert resp["nombres"] == "RICARDO ORLANDO"


def test_separate_name_colonia_rewrite_only_when_changed():
    base = {"nombre": "GOMEZ LOPEZ ANA", "curp": "GOLA900101MDFMPN01",
            "clave_elector": "k" * 18}
    with_cp = separate_name(
        {**base, "colonia": "FRACC SOL 77050", "codigo_postal": "77050"}
    )[0]
    assert with_cp["colonia"] == "FRACC SOL"
    untouched = separate_name(
        {**base, "colonia": "FRACC SOL", "codigo_postal": "77050"}
    )[0]
    assert untouched["colonia"] == "FRACC SOL"
    # response echoes the full input payload
    assert untouched["codigo_postal"] == "77050"


def test_process_document_debug_keys():
    lines = ["INSTITUTO NACIONAL ELECTORAL", "CREDENCIAL PARA VOTAR",
             "  NOMBRE  "]
    plain = process_document(lines)
    assert "_ocr_texts" not in plain
    dbg = process_document(lines, debug="1")
    assert dbg["_ocr_texts"] == ["INSTITUTO NACIONAL ELECTORAL",
                                 "CREDENCIAL PARA VOTAR", "NOMBRE"]
    assert dbg["_tipo_detectado"] == dbg["tipo_credencial"]
    assert process_document(lines, debug="no").get("_ocr_texts") is None


def test_health_shape():
    h = health()
    assert h["status"] == "OK" and h["features"]


@needs_ref
def test_process_document_matches_reference_endpoint_core():
    """datos == extraer_campos_ine_mejorado(texts) for generated cards —
    the exact computation behind /ocr (main.py:1339)."""
    ref = load_reference()
    for seed in range(40):
        lines = gen_ine_lines(Random(seed))
        ours = process_document(lines)
        theirs = ref.extraer_campos_ine_mejorado(list(lines))
        assert ours == theirs, seed


@needs_ref
def test_separate_name_matches_reference_endpoint_core():
    ref = load_reference()
    rng = Random(7)
    for seed in range(40):
        lines = gen_ine_lines(Random(seed))
        fields = ref.extraer_campos_ine_mejorado(list(lines))
        nombre = fields["nombre"] or "PEREZ GOMEZ JUAN"
        curp = fields["curp"] or "PEGJ900101HDFRRN01"
        ours, code = separate_name(
            {"nombre": nombre, "curp": curp, "clave_elector": "x" * 18}
        )
        assert code == 200
        theirs = ref.separar_nombre_por_curp_y_tokens(nombre, curp)
        assert ours["apellido_paterno"] == theirs["apellido_paterno"]
        assert ours["apellido_materno"] == theirs["apellido_materno"]
        assert ours["nombres"] == theirs["nombres"]
