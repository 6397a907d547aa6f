"""Distributed synthetic-corpus materialization.

The driver-side ``fixtures.corpus_dataframes`` builds the whole corpus on the
driver (fine for unit tests); this module generates the SAME corpus (bit-for-
bit: both paths call :func:`ocr_spark.fixtures.build_doc`, a pure function of
``(seed, doc_index)``) *on executors* via ``spark.range(n).mapInPandas`` — no
driver materialization, no collect, scales to any doc count by adding
partitions.  This is the 100 TB-shaped entry point: at real scale the corpus
is an Iceberg table and these generators are replaced by table scans; the
pipeline code is identical either way.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ocr_spark.fixtures import MEDIA_SCHEMA_DDL, SPANS_SCHEMA_DDL, build_doc

# DataFrame-friendly corpus knobs (kept in one place so the spans pass and
# the media pass can never disagree on generator parameters).
DEFAULT_SEED = 42


def _spans_gen(seed: int, heavy_frac: float, ine_frac: float,
               broken_frac: float):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d in pdf["id"]:
                span_row, _ = build_doc(
                    seed, int(d), heavy_frac, ine_frac, broken_frac
                )
                rows.append({
                    "doc_id": span_row["doc_id"],
                    "spans": [
                        (s["kind"], s["text"], s["media_ref"], s["offset"])
                        for s in span_row["spans"]
                    ],
                })
            yield pd.DataFrame(rows, columns=["doc_id", "spans"])
    return gen


def _media_gen(seed: int, heavy_frac: float, ine_frac: float,
               broken_frac: float):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_ref", "content", "fmt", "width", "height",
                "truth_lines"]
        for pdf in batches:
            rows = []
            for d in pdf["id"]:
                _, media_rows = build_doc(
                    seed, int(d), heavy_frac, ine_frac, broken_frac
                )
                rows.extend(
                    {k: m[k] for k in cols} for m in media_rows
                )
            yield pd.DataFrame(rows, columns=cols)
    return gen


def corpus_dataframes_distributed(
    spark: SparkSession,
    seed: int = DEFAULT_SEED,
    n_docs: int = 500,
    partitions: int | None = None,
    heavy_frac: float = 0.02,
    ine_frac: float = 0.30,
    broken_frac: float = 0.01,
) -> tuple[DataFrame, DataFrame]:
    """(spans_df, media_df) generated on executors, ``partitions`` wide."""
    parts = partitions or max(8, spark.sparkContext.defaultParallelism)
    base = spark.range(0, n_docs, 1, parts)
    spans_df = base.mapInPandas(
        _spans_gen(seed, heavy_frac, ine_frac, broken_frac),
        schema=SPANS_SCHEMA_DDL,
    )
    media_df = base.mapInPandas(
        _media_gen(seed, heavy_frac, ine_frac, broken_frac),
        schema=MEDIA_SCHEMA_DDL,
    )
    return spans_df, media_df


def docs_count_for_sf(spark: SparkSession, sf_dir: str) -> int:
    """Corpus size tied to the driver's scale factor: one synthetic
    interleaved document per row of ``documents.parquet`` at that SF
    (500 @ sf0.01, 5000 @ sf0.1)."""
    return spark.read.parquet(f"{sf_dir}/documents.parquet").count()
