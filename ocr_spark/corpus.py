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
    if partitions is not None and partitions < 1:
        # `partitions or default` would silently treat an explicit 0 as
        # unset — masking a caller's miscomputed partition count
        raise ValueError(f"partitions must be >= 1 (got {partitions})")
    parts = (partitions if partitions is not None
             else max(8, spark.sparkContext.defaultParallelism))
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


# Cross-run dedup corpus: every doc's text is a PURE FUNCTION of its id
# (no batching state), so any split of an id range into runs produces
# byte-identical documents — the property the incremental-dedup job's
# two-runs == one-run equivalence test rests on.
DUP_GAP = 50  # id%10==6 docs exactly duplicate the doc DUP_GAP below


def synthetic_documents(
    spark: SparkSession, n_docs: int, start: int = 0,
    vocab: int = 30_000, doc_tokens: int = 40,
) -> DataFrame:
    """``(doc_id, text)`` for ids ``[start, start+n_docs)``, generated
    executor-side as a pure Catalyst expression tree (no driver lists).

    Built-in duplicate structure, all pure functions of the id:
    ids ``% 10 == 1`` are heavy NEAR-dups of ``id−1`` (every 7th token
    dropped, J ≈ 0.5); ids ``% 10 == 6`` are EXACT dups of
    ``id % DUP_GAP`` (the mod RESOLVES the dup chain in one step — a
    subtractive ``id − DUP_GAP`` would point 106 at 56 whose own text is
    already redirected, so nothing would actually match) — every exact
    group spans all batches, so consecutive id-range runs always carry
    cross-batch duplicates."""
    from pyspark.sql import functions as F

    doc_id = F.col("id")
    exact_src = F.when(
        doc_id % 10 == 6, doc_id % DUP_GAP
    ).otherwise(doc_id)
    base_id = F.when(exact_src % 10 == 1, exact_src - 1).otherwise(exact_src)

    # stride must be >= doc_tokens or consecutive docs would share token
    # streams (doc N's token j == doc N+1's token j-stride), corrupting
    # the dup structure with spurious near-pairs between unrelated ids.
    # 53 is kept as the floor so default-parameter corpora stay
    # byte-identical across rounds (recorded bench/stress evidence).
    stride = max(53, doc_tokens)

    def tok(j):
        return F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(base_id * stride + j), F.lit(vocab))
            .cast("string"),
        )

    toks = F.transform(F.sequence(F.lit(0), F.lit(doc_tokens - 1)), tok)
    kept = F.when(
        exact_src % 10 == 1, F.filter(toks, lambda _x, i: i % 7 != 0)
    ).otherwise(toks)
    return (
        spark.range(start, start + n_docs)
        .select(doc_id.alias("doc_id"), F.array_join(kept, " ").alias("text"))
    )
