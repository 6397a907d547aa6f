"""The operator inventory as native Catalyst ``Column`` expressions.

Everything here is pure `pyspark.sql.functions` — JVM-side, whole-stage
codegen, zero Python in the hot path.  These power the driver-contract
queries and are cross-checked against the pinned-behavior Python functions
(which the pandas UDFs run) in ``tests/test_native_vs_python.py``.

Spark 4 runs with ANSI mode on, so all element/map access uses the ``try_``
variants and numeric parsing uses ``try_cast`` — a malformed input yields
''/null, never a task failure.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ocr_spark.constants import (
    CURP_STATE_CODES,
    ELECTOR_STATE_CODES,
    NAME_STOPWORDS,
    REF_YEAR,
)


def _first(col: Column) -> Column:
    return F.try_element_at(col, F.lit(1))


def normalize_lines(lines: Column) -> Column:
    """P1 (main.py:1150-1169): collapse whitespace, trim, drop empties."""
    return F.filter(
        F.transform(lines, lambda x: F.trim(F.regexp_replace(x, r"\s+", " "))),
        lambda x: x != F.lit(""),
    )


def letters_only(s: Column) -> Column:
    """P2 (main.py:1376-1383): uppercase; letters (incl. Ñ/accents) + spaces."""
    cleaned = F.regexp_replace(F.trim(F.upper(s)), r"[^A-ZÁÉÍÓÚÜÑ\s]", " ")
    return F.trim(F.regexp_replace(cleaned, r"\s+", " "))


def doc_blob(lines: Column) -> Column:
    """A1 (main.py:472): upper-cased single-string view of the line list."""
    return F.trim(
        F.concat_ws(
            " ",
            F.transform(
                F.filter(lines, lambda t: t.isNotNull() & (t != F.lit(""))),
                lambda t: F.trim(F.upper(t)),
            ),
        )
    )


def credential_type(blob: Column) -> Column:
    """C1 (main.py:452-525): the C / GH / D rule cascade over the blob."""
    is_ife = (
        blob.contains("INSTITUTO FEDERAL ELECTORAL")
        | blob.contains("REGISTRO FEDERAL DE ELECTORES")
        | blob.rlike(r"\bIFE\b")
        | (
            blob.contains("FEDERAL")
            & blob.contains("ELECTORAL")
            & blob.contains("REGISTRO")
        )
    )
    has_ine = (blob.contains("INSTITUTO") & blob.contains("ELECTORAL")) & (
        blob.contains("NACIONAL") | blob.rlike(r"\bINE\b")
    )
    has_card = blob.contains("CREDENCIAL") & blob.contains("VOTAR")
    has_key = (
        blob.rlike(r"CLAVE\s*DE\s*ELECTOR")
        | (blob.contains("CLAVE") & blob.contains("ELECTOR"))
        | blob.rlike(r"CLAVE\s*DE\s*ELEC")
    )
    return (
        F.when(is_ife, F.lit("C"))
        .when(has_ine & has_card & has_key, F.lit("GH"))
        .otherwise(F.lit("D"))
    )


def is_ine(blob: Column) -> Column:
    """C2 (main.py:1013)."""
    return blob.contains("INSTITUTO NACIONAL ELECTORAL")


def first_match(lines: Column, pattern: str) -> Column:
    """A4/R* (main.py:1139-1142): ordered first-match scan, group(1)."""
    extracted = F.transform(lines, lambda x: F.regexp_extract(x, pattern, 1))
    return F.coalesce(
        _first(F.filter(extracted, lambda v: v != F.lit(""))), F.lit("")
    )


def date_is_plausible(value: Column, ref_year: int = REF_YEAR) -> Column:
    """Validation branch of main.py:1114-1123 for DD/MM/YYYY strings."""
    parts = F.split(value, "/")
    day = (F.try_element_at(parts, F.lit(1))).try_cast("int")
    month = (F.try_element_at(parts, F.lit(2))).try_cast("int")
    year = (F.try_element_at(parts, F.lit(3))).try_cast("int")
    return (
        day.between(1, 31) & month.between(1, 12) & year.between(1900, ref_year)
    )


def first_match_date(
    lines: Column, pattern: str, ref_year: int = REF_YEAR
) -> Column:
    """R3 (main.py:1017, 1114-1123): first plausible DD/MM/YYYY in order."""
    extracted = F.transform(lines, lambda x: F.regexp_extract(x, pattern, 1))
    valid = F.filter(
        extracted,
        lambda v: (v != F.lit("")) & date_is_plausible(v, ref_year),
    )
    return F.coalesce(_first(valid), F.lit(""))


def year_pair_is_plausible(value: Column) -> Column:
    """Validation branch of main.py:1127-1137: two years, 1900-2099, y2>y1."""
    years = F.regexp_extract_all(value, F.lit(r"(\d{4})"), F.lit(1))
    y1 = (F.try_element_at(years, F.lit(1))).try_cast("int")
    y2 = (F.try_element_at(years, F.lit(2))).try_cast("int")
    return (
        (F.size(years) == 2)
        & y1.between(1900, 2099)
        & y2.between(1900, 2099)
        & (y2 > y1)
    )


def first_match_year_pair(lines: Column, pattern: str) -> Column:
    """R8 (main.py:1082-1085, 1126-1137): first plausible year pair."""
    extracted = F.transform(lines, lambda x: F.regexp_extract(x, pattern, 1))
    valid = F.filter(
        extracted, lambda v: (v != F.lit("")) & year_pair_is_plausible(v)
    )
    return F.coalesce(_first(valid), F.lit(""))


def find_section(lines: Column) -> Column:
    """P5 (main.py:1172-1186): first line that is exactly 4 digits."""
    trimmed = F.transform(lines, lambda x: F.trim(x))
    return F.coalesce(
        _first(F.filter(trimmed, lambda x: x.rlike(r"^[0-9]{4}$"))), F.lit("")
    )


def format_year_pair(value: Column) -> Column:
    """Vigencia formatter (main.py:918/1089): '-' → ' - ', collapse spaces."""
    return F.when(
        value == F.lit(""), F.lit("")
    ).otherwise(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(value, "-", " - "), r"\s+", " "
            )
        )
    )


# ----------------------------------------------------------- CURP / clave

def _map_literal(mapping: dict[str, str]) -> Column:
    return F.create_map(
        *[F.lit(x) for pair in mapping.items() for x in pair]
    )


def curp_sex(curp: Column) -> Column:
    """D1 (main.py:567-574): char 11 → H/M/X; short/empty CURP → ''."""
    c = F.upper(F.substring(curp, 11, 1))
    return (
        F.when(curp.isNull() | (F.length(curp) < 16), F.lit(""))
        .when(c == "H", F.lit("H"))
        .when(c == "M", F.lit("M"))
        .otherwise(F.lit("X"))
    )


def curp_birthdate(curp: Column, ref_year: int = REF_YEAR) -> Column:
    """D1 (main.py:576-590): AAMMDD with the two-digit century pivot."""
    yy = F.substring(curp, 5, 2)
    mm = F.substring(curp, 7, 2)
    dd = F.substring(curp, 9, 2)
    yy_num = yy.try_cast("int")
    century = F.when(yy_num > F.lit(ref_year % 100), F.lit("19")).otherwise(
        F.lit("20")
    )
    return F.when(
        curp.isNull() | (F.length(curp) < 16) | yy_num.isNull(), F.lit("")
    ).otherwise(F.concat(dd, F.lit("/"), mm, F.lit("/"), century, yy))


def curp_state(curp: Column) -> Column:
    """D1 (main.py:593-596): chars 12-13 → state name via the 33-entry map."""
    code = F.upper(F.substring(curp, 12, 2))
    return F.when(
        curp.isNull() | (F.length(curp) < 16), F.lit("")
    ).otherwise(
        F.coalesce(
            F.try_element_at(_map_literal(CURP_STATE_CODES), code), F.lit("")
        )
    )


def elector_state(key: Column) -> Column:
    """D2 (main.py:636-638): first 2 chars → state via the 32-entry map."""
    return F.when(
        key.isNull() | (F.length(key) < 13), F.lit("")
    ).otherwise(
        F.coalesce(
            F.try_element_at(
                _map_literal(ELECTOR_STATE_CODES), F.substring(key, 1, 2)
            ),
            F.lit(""),
        )
    )


def elector_section(key: Column) -> Column:
    """D2 (main.py:642-644): first standalone 4-digit token."""
    return F.when(
        key.isNull() | (F.length(key) < 13), F.lit("")
    ).otherwise(F.regexp_extract(key, r"\b(\d{4})\b", 1))


def elector_registry_year(key: Column, ref_year: int = REF_YEAR) -> Column:
    """D2 (main.py:648-653): first plausible year ≤ ref_year+1."""
    years = F.regexp_extract_all(
        key, F.lit(r"\b(19\d{2}|20[0-2]\d)\b"), F.lit(1)
    )
    valid = F.filter(
        years, lambda y: (y).try_cast("int").between(1900, ref_year + 1)
    )
    return F.when(
        key.isNull() | (F.length(key) < 13), F.lit("")
    ).otherwise(F.coalesce(_first(valid), F.lit("")))


# ------------------------------------------------------------ completions

def complete_if_blank(value: Column, fallback: Column) -> Column:
    """D3 (main.py:1054-1068): fill only when the extracted value is ''."""
    return F.when(
        (value.isNull() | (value == F.lit(""))) & (fallback != F.lit("")),
        fallback,
    ).otherwise(F.coalesce(value, F.lit("")))


def complete_state(
    state: Column, curp_state_col: Column, key_state_col: Column
) -> Column:
    """D3 estado rule (main.py:1071-1075): replace when empty or trimmed
    length < 5, preferring the CURP state over the elector-key state."""
    needs = state.isNull() | (F.length(F.trim(state)) < 5)
    return (
        F.when(needs & (curp_state_col != F.lit("")), curp_state_col)
        .when(needs & (key_state_col != F.lit("")), key_state_col)
        .otherwise(F.coalesce(state, F.lit("")))
    )


def registry_year_suffix(value: Column) -> Column:
    """main.py:1078-1079: append ' 00' when the value has no space."""
    return F.when(
        (value != F.lit("")) & ~value.contains(" "),
        F.concat(value, F.lit(" 00")),
    ).otherwise(value)


def clean_name(name: Column) -> Column:
    """P3 (main.py:661-722): drop administrative/numeric tokens from a
    candidate name, preserving the reference's two-phase quirk — the keep
    test runs on punctuation-stripped uppercase tokens, but survivors are
    selected by *upper-cased membership* against the kept originals, so a
    failing token identical (case-insensitively) to a passing one survives
    too (main.py:713-720)."""
    toks = F.filter(
        F.split(F.coalesce(name, F.lit("")), r"\s+"),
        lambda t: t != F.lit(""),
    )
    stop = F.array(*[F.lit(w) for w in NAME_STOPWORDS])
    # (?U) makes Java's \w Unicode-aware like Python's (the reference keeps
    # any accented letter, not just the ÁÉÍÓÚÜÑ listed explicitly).  The
    # DuckDB oracle's RE2 \w is ASCII-only; the contract inputs stay within
    # the explicit set so the two agree there.
    cleaned = lambda t: F.regexp_replace(F.upper(t), r"(?U)[^\wÁÉÍÓÚÜÑ]", "")
    passes = lambda t: (
        (F.length(cleaned(t)) > 1)
        & ~F.array_contains(stop, cleaned(t))
        & ~cleaned(t).rlike(r"^\d+$")
        & ~cleaned(t).rlike(r"^\d+[A-Z]*$")
    )
    kept_upper = F.transform(F.filter(toks, passes), lambda t: F.upper(t))
    survivors = F.filter(
        toks, lambda t: F.array_contains(kept_upper, F.upper(t))
    )
    return F.array_join(survivors, " ")


def strip_cp_from_colonia(colonia: Column, cp: Column) -> Column:
    """P4 (main.py:1530-1545): drop the exact CP token, re-collapse spaces.

    The CP is quoted into the word-boundary pattern LITERALLY
    (``\\b\\Q<cp>\\E\\b`` — Java's Pattern.quote form, with embedded
    ``\\E`` re-escaped), matching the Python twin's ``re.escape``
    (extraction/name_split.py).  Interpolating it raw diverged for
    metachar CPs (OCR noise like ``0.600`` matched ``0X600``) and a CP
    like ``06(00`` was an invalid pattern — a task-killing
    PatternSyntaxException from malformed *input*.
    """
    quoted = F.concat(
        F.lit(r"\Q"),
        # Pattern.quote's embedded-\E escape: each literal "\E" in the
        # cp becomes "\E\\E\Q" so it cannot close the quoted region.
        # (regexp_replace replacement doubles backslashes.)
        F.regexp_replace(cp, r"\\E", r"\\E\\\\E\\Q"),
        F.lit(r"\E"),
    )
    stripped = F.regexp_replace(
        colonia, F.concat(F.lit(r"\b"), quoted, F.lit(r"\b")), F.lit("")
    )
    collapsed = F.trim(F.regexp_replace(stripped, r"\s+", " "))
    return F.when(
        colonia.isNull()
        | (F.trim(colonia) == F.lit(""))
        | cp.isNull()
        | (F.trim(cp) == F.lit("")),
        F.coalesce(F.trim(colonia), F.lit("")),
    ).otherwise(collapsed)
