"""Cross-check: native Catalyst expressions ≡ pinned-behavior Python.

Runs both layers over the same generated line lists and asserts equal
outputs — proving the JVM-side operator library implements the same
semantics the pandas UDFs (and the reference) do.
"""

from __future__ import annotations

from random import Random

import pytest
from pyspark.sql import functions as F

from ocr_spark import native
from ocr_spark.constants import (
    BIRTHDATE_REGEX,
    CURP_REGEX,
    ELECTOR_KEY_REGEX_18,
    POSTAL_CODE_REGEX,
    REF_YEAR,
    SEX_REGEX,
    VALIDITY_FALLBACK_REGEX,
)
from ocr_spark.extraction import (
    classify_credential,
    find_section,
    normalize_lines,
    parse_curp,
    parse_elector_key,
    search_lines,
)
from ocr_spark.extraction.classify import document_blob
from ocr_spark.fixtures import gen_generic_lines, gen_ine_lines


# Fuzz alphabet = realistic OCR output (Latin letters incl. accents,
# digits, the punctuation the extractors key on).  Deliberately NOT
# arbitrary unicode: Java regex \d and \w are ASCII-only (Java's \b is
# Unicode-aware — verified empirically) while the reference's Python
# patterns are unicode-aware throughout, so e.g. Arabic-Indic digits
# match the Python twins but not the native ones — a known, accepted
# boundary (the authoritative pipeline path is the pinned Python UDF;
# the native twins serve contract queries over this alphabet).  Do NOT
# "fix" native.py with (?U): that would change \d/\w semantics and
# break real contract parity.
_FUZZ_ALPHABET = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZÁÉÍÓÚÜÑabcdefghij"
    "0123456789 /-.,:()#HMX\t"
)


@pytest.fixture(scope="module")
def corpora():
    out = []
    for k in range(250):
        rng = Random(f"native/{k}")
        lines = gen_ine_lines(rng) if k % 2 else gen_generic_lines(rng)
        if k % 7 == 0:
            lines = lines + ["", "  ", "0378", "31/05/1993", "2021-2031"]
        out.append(lines)
    # adversarial fuzz corpora: random strings over the OCR alphabet —
    # nothing fixture-shaped, so regex-semantic divergences between the
    # JVM and Python layers have nowhere to hide
    for k in range(250):
        rng = Random(f"native-fuzz/{k}")
        out.append([
            "".join(rng.choice(_FUZZ_ALPHABET)
                    for _ in range(rng.randint(0, 40)))
            for _ in range(rng.randint(0, 10))
        ])
    return out


@pytest.fixture(scope="module")
def lines_df(spark, corpora):
    return spark.createDataFrame(
        [(i, lines) for i, lines in enumerate(corpora)],
        schema="id int, raw array<string>",
    ).withColumn("lines", native.normalize_lines(F.col("raw")))


def test_native_pipeline_columns_match_python(lines_df, corpora):
    blob = native.doc_blob(F.col("lines"))
    out = lines_df.select(
        "id",
        F.col("lines"),
        native.credential_type(blob).alias("tipo"),
        native.is_ine(blob).alias("es_ine"),
        native.first_match(F.col("lines"), CURP_REGEX).alias("curp"),
        native.first_match(F.col("lines"), ELECTOR_KEY_REGEX_18).alias("clave18"),
        native.first_match_date(F.col("lines"), BIRTHDATE_REGEX).alias("fecha"),
        native.find_section(F.col("lines")).alias("seccion"),
        native.first_match(F.col("lines"), SEX_REGEX).alias("sexo"),
        native.first_match(F.col("lines"), POSTAL_CODE_REGEX).alias("cp"),
        native.first_match_year_pair(
            F.col("lines"), VALIDITY_FALLBACK_REGEX
        ).alias("vig"),
    ).collect()

    for row in out:
        lines = corpora[row.id]
        clean = normalize_lines(lines)
        assert list(row.lines) == clean, row.id
        assert row.tipo == classify_credential(clean), row.id
        assert row.es_ine == (
            "INSTITUTO NACIONAL ELECTORAL" in document_blob(clean)
        ), row.id
        assert row.curp == search_lines(CURP_REGEX, clean), row.id
        assert row.clave18 == search_lines(ELECTOR_KEY_REGEX_18, clean), row.id
        assert row.fecha == search_lines(BIRTHDATE_REGEX, clean), row.id
        assert row.seccion == find_section(clean), row.id
        assert row.sexo == search_lines(SEX_REGEX, clean), row.id
        assert row.cp == search_lines(POSTAL_CODE_REGEX, clean), row.id
        assert row.vig == search_lines(VALIDITY_FALLBACK_REGEX, clean), row.id


def test_native_curp_and_key_parsers_match_python(spark):
    samples = [
        "CAOR930531HQRSLC05", "CAOR050531MDFSLC05", "AAAA260101XZZBCD01",
        "CAOR9305", "", "GOMF000101MNLXYZ09", "CSOLRC93053123H800",
        "23ABCD0378201100HM", "XX 0378 2011 YYYY", "short",
        "09AAAA19990101H000", "77ZZZZ20250101M000",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "v string")
    got = df.select(
        "v",
        native.curp_sex(F.col("v")).alias("sexo"),
        native.curp_birthdate(F.col("v"), REF_YEAR).alias("fecha"),
        native.curp_state(F.col("v")).alias("estado"),
        native.elector_state(F.col("v")).alias("k_estado"),
        native.elector_section(F.col("v")).alias("k_seccion"),
        native.elector_registry_year(F.col("v"), REF_YEAR).alias("k_anio"),
    ).collect()
    for row in got:
        curp_info = parse_curp(row.v, REF_YEAR)
        key_info = parse_elector_key(row.v, REF_YEAR)
        assert row.sexo == curp_info["sexo"], row.v
        assert row.fecha == curp_info["fecha_nacimiento"], row.v
        assert row.estado == curp_info["estado"], row.v
        assert row.k_estado == key_info["estado_clave"], row.v
        assert row.k_seccion == key_info["seccion_clave"], row.v
        assert row.k_anio == key_info["anio_registro_clave"], row.v


def test_native_completion_rules(spark):
    df = spark.createDataFrame(
        [("", "H"), ("M", "H"), ("", ""), (None, "X")],
        "value string, fallback string",
    )
    got = [
        r.out
        for r in df.select(
            native.complete_if_blank(F.col("value"), F.col("fallback")).alias("out")
        ).collect()
    ]
    assert got == ["H", "M", "", "X"]

    df2 = spark.createDataFrame(
        [("QRO", "QUINTANA ROO", "JALISCO"),
         ("MONTERREY, N.L.", "QUINTANA ROO", ""),
         ("", "", "JALISCO"), ("", "", "")],
        "estado string, curp_estado string, key_estado string",
    )
    got2 = [
        r.out
        for r in df2.select(
            native.complete_state(
                F.col("estado"), F.col("curp_estado"), F.col("key_estado")
            ).alias("out")
        ).collect()
    ]
    # len("QRO")<5 → CURP state wins; long estado kept; key state fallback
    assert got2 == ["QUINTANA ROO", "MONTERREY, N.L.", "JALISCO", ""]


def test_native_registry_suffix_and_cp_strip(spark):
    df = spark.createDataFrame(
        [("2011",), ("2011 02",), ("",)], "v string"
    )
    got = [
        r.out
        for r in df.select(
            native.registry_year_suffix(F.col("v")).alias("out")
        ).collect()
    ]
    assert got == ["2011 00", "2011 02", ""]

    from ocr_spark.extraction.name_split import (
        strip_cp_from_colonia as py_strip_cp,
    )

    cp_cases = [
        ("FRACC LA HERRADURA III 77050", "77050"),
        ("COL 770501 NORTE", "77050"),
        ("", "77050"), ("COL CENTRO", ""),
        # metachar / invalid-regex CPs (OCR noise): the native twin must
        # quote the cp LITERALLY like the Python twin's re.escape — a raw
        # interpolation matched '0X600' for cp '0.600' and threw a
        # task-killing PatternSyntaxException for '06(00'
        ("COL 0X600 NORTE", "0.600"),
        ("COL 0.600 NORTE", "0.600"),
        ("COL 06(00 SUR", "06(00"),
        ("COL A\\E9 SUR", "A\\E9"),  # embedded \E must not close \Q..\E
        ("COL \\Q77050 X", "\\Q77050"),
    ]
    df2 = spark.createDataFrame(cp_cases, "colonia string, cp string")
    got2 = [
        r.out
        for r in df2.select(
            native.strip_cp_from_colonia(F.col("colonia"), F.col("cp")).alias("out")
        ).collect()
    ]
    assert got2 == [py_strip_cp(c, p) for c, p in cp_cases]
    assert got2[:4] == [
        "FRACC LA HERRADURA III", "COL 770501 NORTE", "", "COL CENTRO",
    ]


def test_native_clean_name_matches_python(spark):
    """P3 native vs the pinned-behavior Python, including the upper-cased
    membership quirk, mixed punctuation, digit codes, stopwords, and a
    non-listed accented letter (the (?U) Unicode \\w parity case)."""
    from ocr_spark.extraction.name import clean_name as py_clean

    names = [
        "CASTILLO OLIVERA RICARDO ORLANDO",
        "JUAN 123 PEREZ C1",
        "DOMICILIO MARIA DE LA CRUZ",
        "A B1 CD EF",
        "JOSÉ Ma. GARCÍA LÓPEZ",
        "ÀLVARO DÛPONT",          # accents outside the explicit set
        "nombre Nombre NOMBRE x",  # case-insensitive membership quirk
        "   ",
        "12345 678A",
    ]
    df = spark.createDataFrame([(n,) for n in names], "name string")
    got = [
        r.out for r in df.select(
            native.clean_name(F.col("name")).alias("out")
        ).collect()
    ]
    assert got == [py_clean(n) for n in names]
