"""Pinned-behavior extraction semantics (pure Python, no Spark imports).

These functions reproduce, bit for bit, the field-extraction behavior of the
reference service's text pipeline (everything downstream of the OCR line
list).  They are deliberately dependency-free so the exact same code runs

1. inside the Arrow-batched pandas UDFs on executors, and
2. in the test oracle that computes golden outputs doc-by-doc,

which makes Spark-vs-oracle divergence impossible at the logic level — any
difference can only come from partitioning/ordering, which the tests check
separately.

Reference behavior citations use ``main.py:<line>`` of the reference repo.
Every ``datetime.now()`` in the reference (main.py:583, 651, 1122) is
replaced by an injected ``ref_year`` so outputs are reproducible.
"""

from ocr_spark.extraction.lines import normalize_lines, search_lines, find_section
from ocr_spark.extraction.classify import classify_credential
from ocr_spark.extraction.ids import parse_curp, parse_elector_key
from ocr_spark.extraction.name import clean_name, extract_name
from ocr_spark.extraction.validity import extract_validity
from ocr_spark.extraction.fields import extract_fields, FIELD_ORDER
from ocr_spark.extraction.name_split import split_name_by_curp, strip_cp_from_colonia

__all__ = [
    "normalize_lines",
    "search_lines",
    "find_section",
    "classify_credential",
    "parse_curp",
    "parse_elector_key",
    "clean_name",
    "extract_name",
    "extract_validity",
    "extract_fields",
    "FIELD_ORDER",
    "split_name_by_curp",
    "strip_cp_from_colonia",
]
