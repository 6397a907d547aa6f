"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship end-to-end extraction pipeline over the
synthetic interleaved span corpus (the BASELINE.json ``input_hint`` shape),
generated deterministically *on executors* and sized to the sf0.001
``documents`` table.  ``queries``/``oracle_sql`` expose one entry per
implemented operator (SURVEY.md §2 plus the training-data curation
operators) backed by :mod:`ocr_spark.driver_contract`.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full interleaved-document extraction at sf0.001 —
    explode → boilerplate-strip ∥ salted OCR → splice → field cascade —
    returning one row per document with stable flat schema."""
    from ocr_spark.driver_contract import q_extract_pipeline

    return q_extract_pipeline(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ocr_spark.driver_contract import registry

    return {name: fn for name, (fn, _sql) in registry().items()}


def oracle_sql() -> dict[str, str]:
    from ocr_spark.driver_contract import registry

    return {
        name: sql for name, (_fn, sql) in registry().items() if sql is not None
    }
