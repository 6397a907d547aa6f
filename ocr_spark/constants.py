"""Shared constants: state-code dimension maps, word lists, pinned ref date.

The two state-code maps are the engine's only "dimension tables"
(reference: main.py:130-140 and main.py:144-154).  At 33/32 entries they are
compiled into the plan as map literals (``F.create_map``) rather than
broadcast joins — constant-folded by Catalyst, zero shuffle.
"""

from __future__ import annotations

# Pinned evaluation date for every rule the reference ties to
# ``datetime.now()`` (main.py:583, 651, 1122).  Injected, never wall-clock,
# so goldens are reproducible across years.
REF_YEAR: int = 2026

# CURP two-letter birth-state codes → state name (main.py:130-140).
CURP_STATE_CODES: dict[str, str] = {
    "AS": "AGUASCALIENTES", "BC": "BAJA CALIFORNIA", "BS": "BAJA CALIFORNIA SUR",
    "CC": "CAMPECHE", "CL": "COAHUILA", "CM": "COLIMA", "CS": "CHIAPAS",
    "CH": "CHIHUAHUA", "DF": "CIUDAD DE MÉXICO", "DG": "DURANGO",
    "GT": "GUANAJUATO", "GR": "GUERRERO", "HG": "HIDALGO", "JC": "JALISCO",
    "MC": "MÉXICO", "MN": "MICHOACÁN", "MS": "MORELOS", "NT": "NAYARIT",
    "NL": "NUEVO LEÓN", "OC": "OAXACA", "PL": "PUEBLA", "QT": "QUERÉTARO",
    "QR": "QUINTANA ROO", "SP": "SAN LUIS POTOSÍ", "SL": "SINALOA",
    "SR": "SONORA", "TC": "TABASCO", "TS": "TAMAULIPAS", "TL": "TLAXCALA",
    "VZ": "VERACRUZ", "YN": "YUCATÁN", "ZS": "ZACATECAS", "NE": "EXTRANJERO",
}

# Elector-key two-digit state codes → state name (main.py:144-154).
ELECTOR_STATE_CODES: dict[str, str] = {
    "01": "AGUASCALIENTES", "02": "BAJA CALIFORNIA", "03": "BAJA CALIFORNIA SUR",
    "04": "CAMPECHE", "05": "COAHUILA", "06": "COLIMA", "07": "CHIAPAS",
    "08": "CHIHUAHUA", "09": "CIUDAD DE MÉXICO", "10": "DURANGO",
    "11": "GUANAJUATO", "12": "GUERRERO", "13": "HIDALGO", "14": "JALISCO",
    "15": "MÉXICO", "16": "MICHOACÁN", "17": "MORELOS", "18": "NAYARIT",
    "19": "NUEVO LEÓN", "20": "OAXACA", "21": "PUEBLA", "22": "QUERÉTARO",
    "23": "QUINTANA ROO", "24": "SAN LUIS POTOSÍ", "25": "SINALOA",
    "26": "SONORA", "27": "TABASCO", "28": "TAMAULIPAS", "29": "TLAXCALA",
    "30": "VERACRUZ", "31": "YUCATÁN", "32": "ZACATECAS",
}

# Administrative words never allowed inside an extracted person name
# (main.py:680-687).  Matched against punctuation-stripped uppercase tokens.
NAME_STOPWORDS: list[str] = [
    "EDAD", "AÑOS", "AÑO", "EDAD:", "EDADES", "FECHA", "NACIMIENTO",
    "DOMICILIO", "CALLE", "COLONIA", "ESTADO", "MUNICIPIO", "CIUDAD",
    "CP", "C.P.", "CÓDIGO", "POSTAL", "SECCIÓN", "SECCION", "CLAVE",
    "ELECTOR", "CURP", "VIGENCIA", "VIGENTE", "INSTITUTO", "NACIONAL",
    "FEDERAL", "ELECTORAL", "CREDENCIAL", "VOTAR", "PARA", "MÉXICO",
    "REGISTRO",
]

# Institutional boilerplate that disqualifies a candidate name line
# (main.py:750).
NAME_BLACKLIST_REGEX = (
    r"(INSTITUTO|NACIONAL|ELECTORAL|CREDENCIAL|PARA\s+VOTAR|M[EÉ]XICO|"
    r"ESTADOS\s+UNIDOS)"
)

# Field labels that terminate the name region (main.py:752).
NAME_STOP_LABELS_REGEX = (
    r"(DOMICILIO|CLAVE|CURP|FECHA|SECCI[ÓO]N|AÑO|REGISTRO|VIGENCIA|SEXO|EDAD)"
)

# Surname particles skipped when deriving CURP initials (main.py:1391-1394).
SURNAME_PARTICLES: frozenset[str] = frozenset(
    {"DE", "DEL", "LA", "LAS", "LOS", "Y", "MC", "MAC", "VAN", "VON",
     "DA", "DAS", "DO", "DOS", "DI", "DU"}
)

# Core extraction regexes (reference call sites in §2.4 of SURVEY.md).
CURP_REGEX = r"\b([A-Z]{4}\d{6}[HMX][A-Z]{5}\d{2})\b"              # main.py:997
ELECTOR_KEY_REGEX_18 = r"\b([A-Z0-9]{18})\b"                       # main.py:998
ELECTOR_KEY_REGEX_FLEX = r"\b([A-Z]{6}\d{8,10}[A-Z0-9]{2,4})\b"    # main.py:998
BIRTHDATE_REGEX = r"\b(\d{2}/\d{2}/\d{4})\b"                       # main.py:1017
REGISTRY_YEAR_REGEX = r"(\d{4}\s\d+)"                              # main.py:1018
SEX_REGEX = r"\b(H|M|X)\b"                                         # main.py:1021
POSTAL_CODE_REGEX = r"\b(\d{5})\b"                                 # main.py:1048
STREET_NUMBER_REGEX = r"\b(\d{1,5}[A-Z]?(?:\s*INT\.?\s*\d+)?)\b"   # main.py:1044
VALIDITY_FALLBACK_REGEX = r"(\d{4}\s*[-]?\s*?\d{4})"               # main.py:1083
