"""Bucketed co-located joins: when the media-span table and the media
store are bucketed on the join key, the join runs with NO exchange on
either side — the pre-shuffle that makes repeated joins/aggregations on the
same key free at 100 TB."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    spans = spark.range(2000).select(
        F.concat(F.lit("m_"), F.col("id")).alias("media_ref"),
        (F.col("id") % 97).alias("doc_no"),
    )
    store = spark.range(2000).select(
        F.concat(F.lit("m_"), F.col("id")).alias("media_ref"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    for name, df in (("b_spans", spans), ("b_store", store)):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.format("parquet")
            .bucketBy(8, "media_ref").sortBy("media_ref")
            .option("path", str(tmp_path / name))
            .saveAsTable(name)
        )
    yield "b_spans", "b_store"
    spark.sql("DROP TABLE IF EXISTS b_spans")
    spark.sql("DROP TABLE IF EXISTS b_store")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        joined = spark.table(left).join(spark.table(right), on="media_ref")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan[:2000]
        assert joined.count() == 2000
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_unbucketed_control_does_shuffle(spark, bucketed_tables):
    left, _ = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plain = spark.range(2000).select(
            F.concat(F.lit("m_"), F.col("id")).alias("media_ref"),
            F.lit("x").alias("other"),
        )
        joined = spark.table(left).join(plain, on="media_ref")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
