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
    "id_parsers",
    "classify_credential",
    "regex_extractors",
    "text_cleaners",
    "dedup_exact",
    "doc_stats",
    "lineitem_pricing",
]

# Queries that prove the north-rule invariant / operator families the
# driver MUST verify every round: each must sit inside the first 50
# registry positions (the driver's correctness window).  CORRECTNESS_r04
# lost 12 queries — the flagship included — to registry overflow; this
# list is the tripwire that stops a future addition from repeating that.
MUST_BE_IN_WINDOW = [
    "extract_pipeline",
    "split_name",
    "strip_boilerplate",
    "media_meta",
    "frame_sample",
    "events_hourly_stream",
    "events_sessions_stream",
    "events_dedup_stream",
    "curp_state_join",
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


def test_registry_fits_driver_correctness_window():
    """The driver checks only the FIRST 50 registry entries; a 51st entry
    silently goes driver-unverified (it happened in round 4, to the
    flagship).  Hard caps: ≤ 50 entries total, and the pipeline-stage +
    streaming queries pinned to the front so no future growth can evict
    them."""
    names = list(registry())
    assert len(names) <= 50, (
        f"registry has {len(names)} entries; the driver verifies only the "
        "first 50 — merge or retire entries instead of overflowing"
    )
    window = names[:50]
    missing = [n for n in MUST_BE_IN_WINDOW if n not in window]
    assert not missing, f"critical queries outside the window: {missing}"
    # pinned to the FRONT, not merely inside the current window
    assert names[:5] == [
        "extract_pipeline", "split_name", "strip_boilerplate",
        "media_meta", "frame_sample",
    ]


def test_bench_headline_is_subset_of_registry():
    """bench.py times registry entries by name; a registry rename/retire
    that misses HEADLINE would crash the driver's per-round bench run
    (BENCH_r{N}.json) instead of this cheap test."""
    import bench

    missing = [n for n in bench.HEADLINE if n not in registry()]
    assert not missing, f"bench HEADLINE names not in registry: {missing}"


@pytest.mark.parametrize("name", FAST_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    fn, sql = registry()[name]
    assert sql is not None
    sdf = _canon(fn(spark, SF_DIR).toPandas())
    ddf = _canon(duck.sql(sql).df())
    assert list(sdf.columns) == list(ddf.columns)
    assert len(sdf) == len(ddf)
    pd.testing.assert_frame_equal(sdf, ddf, check_dtype=False)
