"""SparkSession factory with the engine's scale-oriented defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ocr-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a session with AQE, Arrow, and worker reuse on.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` in the sandbox;
    pass ``master="submit"`` from a spark-submit entry point so the
    launcher owns the master while the tuned defaults still apply.
    """
    if master is None:
        # `or "*"`: a SET-but-EMPTY env var (unset CI variable
        # interpolated into an env file) would build master 'local[]',
        # which dies in Spark's master-URL parser far from the cause
        cpus = os.environ.get("SPARK_GRAFT_CPUS") or "*"
        master = f"local[{cpus}]"

    builder = SparkSession.builder.appName(app_name)
    if master != "submit":
        builder = builder.master(master)
    builder = (
        builder
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Bytes are a poor proxy for this engine's cost: a 64 MB partition of
        # media refs is hours of OCR.  Small advisory sizes keep AQE's
        # post-shuffle coalescing from serializing the CPU-heavy UDF stages
        # onto a handful of cores (measured 42% wall regression at default).
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.python.worker.reuse", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    if master.startswith("local"):
        # Single-machine local mode only: delay scheduling just inserts 3 s
        # idle gaps at stage boundaries (no data locality to gain with one
        # node).  On any cluster master (spark://, yarn, k8s://, or the
        # "submit" sentinel) the Spark default is kept — disabling locality
        # there would de-localize every scan.
        builder = builder.config("spark.locality.wait", "0s")
    if shuffle_partitions is not None:
        builder = builder.config(
            "spark.sql.shuffle.partitions", str(shuffle_partitions)
        )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    return builder.getOrCreate()
