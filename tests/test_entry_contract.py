"""Driver-contract smoke: entry() + a fast subset of the Spark↔DuckDB
oracle cross-checks (the full 28-query sweep lives in
tools/check_contract.py; here we keep pytest wall-clock bounded)."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod
from ocr_spark.driver_contract import TABLES, registry

SF_DIR = "/root/testdata/sf0.001"

FAST_QUERIES = [
    "curp_parse",
    "classify_credential",
    "regex_extractors",
    "name_clean",
    "dedup_exact",
    "langid",
    "quality_score",
    "lineitem_pricing",
    "events_sessions",
]

pytestmark = pytest.mark.skipif(
    not os.path.exists(SF_DIR), reason="driver testdata absent"
)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def test_entry_returns_documents(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) >= {"doc_id", "n_spans", "tipo_credencial"}


def test_every_query_has_matching_oracle_keys():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 25 and len(oracles) >= 20


@pytest.mark.parametrize("name", FAST_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    fn, sql = registry()[name]
    assert sql is not None
    sdf = _canon(fn(spark, SF_DIR).toPandas())
    ddf = _canon(duck.sql(sql).df())
    assert list(sdf.columns) == list(ddf.columns)
    assert len(sdf) == len(ddf)
    pd.testing.assert_frame_equal(sdf, ddf, check_dtype=False)
