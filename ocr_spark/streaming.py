"""Structured-Streaming surface: incremental ingestion plus the two
canonical streaming shapes a large-scale event pipeline needs.

1. ``run_streaming_extraction`` — the continuous-ingestion adapter: a
   file-source stream of ``documents_spans`` rows drives the IDENTICAL
   batch pipeline per micro-batch through ``foreachBatch`` (the reference
   has no streaming semantics — SURVEY.md §2.10 — so each document is
   complete within its row and a micro-batch is just a small batch run).
   Output partitioned by ``batch_id`` with dynamic overwrite →
   effectively-once on top of the offset checkpoint.
2. ``stream_windowed_counts`` — watermarked event-time tumbling-window
   aggregation in APPEND mode: a window row is emitted exactly once, when
   the watermark passes its end; data later than the watermark is dropped
   by the engine.  The streaming twin of the batch ``events_hourly``
   contract query.
3. ``sessionize_stream`` — custom stateful operator via
   ``applyInPandasWithState``: per-user gap-based sessionization with
   event-time timeouts (state = the open session; closed sessions are
   emitted in-batch on a gap, or by timeout when the watermark passes
   ``session_end + gap``).  The streaming twin of the batch
   ``events_sessions`` contract query.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_spark.config import PipelineConfig
from ocr_spark.fixtures import SPANS_SCHEMA_DDL
from ocr_spark.pipeline import run_extraction

EVENTS_STREAM_DDL = "user_id bigint, ts timestamp, event_type string, value double"


def _start_append_stream(df, out_dir: str, checkpoint_dir: str,
                         available_now: bool):
    """Shared parquet APPEND writer (one place for the write contract)."""
    writer = (
        df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


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


def stream_windowed_counts(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    available_now: bool = True,
):
    """Watermarked tumbling-window counts/sums over an event file stream.

    APPEND output mode: a window's single final row is emitted when the
    watermark (max event time − ``watermark``) passes the window end, and
    events arriving later than the watermark are dropped by the engine —
    the standard late-data contract.  State per open window is bounded by
    the watermark horizon.
    """
    stream = (
        spark.readStream.schema(EVENTS_STREAM_DDL)
        .parquet(input_dir)
        .withWatermark("ts", watermark)
    )
    agg = (
        stream.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    return _start_append_stream(agg, out_dir, checkpoint_dir, available_now)


SESSION_OUT_DDL = (
    "user_id bigint, session_start double, session_end double, "
    "n_events bigint"
)
SESSION_STATE_DDL = "start double, end double, n bigint"


def merge_session_intervals(
    ivals: list[tuple[float, float, int]], gap_s: float
) -> list[tuple[float, float, int]]:
    """Merge (start, end, n) intervals whose gap is ≤ ``gap_s``, in start
    order.  Shared by the stateful stream (where one interval is the
    checkpointed open session and the rest are the batch's events) so
    out-of-order-but-within-watermark events merge correctly — including
    ones EARLIER than the open session's start (they lower it, or form
    their own earlier session when the backward gap exceeds ``gap_s``)."""
    merged: list[tuple[float, float, int]] = []
    for s, e, c in sorted(ivals):
        if merged and s - merged[-1][1] <= gap_s:
            ms, me, mc = merged[-1]
            merged[-1] = (ms, max(me, e), mc + c)
        else:
            merged.append((s, e, c))
    return merged


def sessionize_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    gap_s: float = 1800.0,
    watermark: str = "30 minutes",
    available_now: bool = True,
):
    """Gap-based per-user sessionization as a CUSTOM STATEFUL operator
    (``applyInPandasWithState`` + event-time timeout).

    State per user is the one open session ``(start, end, n)``.  Within a
    batch, events are merged in event-time order; a gap > ``gap_s`` closes
    the current session (emitted immediately).  The still-open session is
    kept in state with an event-time timeout at ``end + gap_s``: when the
    watermark passes it, the timed-out invocation emits the final session
    and clears the state — so every session is emitted exactly once, by
    gap or by timeout.  Events later than the watermark may arrive after
    their session closed; the checkpointed state cannot reopen it (the
    same contract as the windowed aggregation).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    # The stateful function reads event times via pandas .timestamp(),
    # which treats the tz-naive values Arrow delivers as UTC — only
    # correct when the session renders timestamps in UTC (get_spark pins
    # this).  Enforce rather than silently shift every session by the
    # JVM's tz offset (and trip the timeout-below-watermark check).
    tz = spark.conf.get("spark.sql.session.timeZone")
    if tz.upper() not in ("UTC", "GMT", "ETC/UTC", "Z"):
        raise ValueError(
            f"sessionize_stream requires spark.sql.session.timeZone=UTC "
            f"(got {tz!r}); see ocr_spark.session.get_spark"
        )

    def sessionize(
        key, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        user = key[0]
        if state.hasTimedOut:
            start, end, n = state.get
            state.remove()
            yield pd.DataFrame(
                [{"user_id": user, "session_start": start,
                  "session_end": end, "n_events": n}]
            )
            return

        ivals = [
            (t.timestamp(), t.timestamp(), 1)
            for pdf in pdfs for t in pdf["ts"] if t is not None
        ]
        if state.exists:
            s0, e0, n0 = state.get
            ivals.append((float(s0), float(e0), int(n0)))
        merged = merge_session_intervals(ivals, gap_s)
        if not merged:
            return
        *closed, (start, end, n) = merged
        state.update((float(start), float(end), int(n)))
        # fire when the watermark passes the open session's close horizon
        state.setTimeoutTimestamp(int((end + gap_s) * 1000))
        if closed:
            yield pd.DataFrame(
                [{"user_id": user, "session_start": s, "session_end": e,
                  "n_events": c} for s, e, c in closed]
            )

    stream = (
        spark.readStream.schema(EVENTS_STREAM_DDL)
        .parquet(input_dir)
        .withWatermark("ts", watermark)
    )
    sessions = stream.groupBy("user_id").applyInPandasWithState(
        sessionize,
        outputStructType=SESSION_OUT_DDL,
        stateStructType=SESSION_STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return _start_append_stream(sessions, out_dir, checkpoint_dir,
                                available_now)
