"""Incremental ingestion via Structured Streaming ``foreachBatch``.

The reference has no streaming semantics (SURVEY.md §2.10 — strictly
request/response), and the target is a batch pipeline; this module is the
continuous-ingestion adapter the survey reserves for it: a file-source
stream of ``documents_spans`` rows drives the IDENTICAL batch pipeline per
micro-batch through ``foreachBatch``.  Output is partitioned by
``batch_id`` and written with dynamic partition overwrite, so a micro-batch
replayed after a crash (foreachBatch is at-least-once) overwrites its own
partition instead of appending duplicates — effectively-once results on
top of Spark's offset checkpointing.

No stateful operators, watermarks or event-time windows are introduced —
nothing in the operator inventory needs them; each document is complete
within its row, so a micro-batch is just a small batch run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_spark.config import PipelineConfig
from ocr_spark.fixtures import SPANS_SCHEMA_DDL
from ocr_spark.pipeline import run_extraction


def run_streaming_extraction(
    spark: SparkSession,
    input_dir: str,
    media_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    cfg: PipelineConfig | None = None,
    available_now: bool = True,
):
    """Stream span-row parquet files from ``input_dir`` through the batch
    pipeline; append extracted documents to ``out_dir``.

    ``available_now=True`` drains everything currently present and stops
    (the incremental-batch mode); ``False`` keeps running for continuous
    ingestion.  Returns the StreamingQuery.
    """
    cfg = cfg or PipelineConfig()

    stream = (
        spark.readStream.schema(SPANS_SCHEMA_DDL)
        .option("maxFilesPerTrigger", "8")
        .parquet(input_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = run_extraction(spark, batch_df, media_df, cfg)
        # foreachBatch may replay a batch after a crash between the data
        # write and the streaming commit log; dynamic overwrite of the
        # batch_id partition makes the replay idempotent.
        (
            out.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
