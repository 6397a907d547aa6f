"""Structured-Streaming adapter: the file-source stream must process every
document exactly once through the identical batch pipeline, and a restarted
stream must resume from the checkpoint without reprocessing."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_spark.fixtures import corpus_dataframes
from ocr_spark.streaming import run_streaming_extraction

N_DOCS = 40
SEED = 11


def _write_chunks(spark, spans_df, input_dir, n_chunks=4):
    spans_df.repartition(n_chunks).write.mode("overwrite").parquet(input_dir)


def test_stream_drains_all_docs_exactly_once(spark, tmp_path):
    spans_df, media_df = corpus_dataframes(spark, seed=SEED, n_docs=N_DOCS)
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_chunks(spark, spans_df, inp)

    q = run_streaming_extraction(spark, inp, media_df, out, ckpt)
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    assert got.count() == N_DOCS
    dupes = got.groupBy("doc_id").count().filter(F.col("count") > 1)
    assert dupes.count() == 0
    # offsets stay ordered per doc through the micro-batch path too
    row = got.orderBy("doc_id").first()
    offs = [s.offset for s in row.spans_out]
    assert offs == sorted(offs)


def test_stream_restart_resumes_from_checkpoint(spark, tmp_path):
    spans_df, media_df = corpus_dataframes(spark, seed=SEED, n_docs=N_DOCS)
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_chunks(spark, spans_df, inp)

    q1 = run_streaming_extraction(spark, inp, media_df, out, ckpt)
    q1.awaitTermination(120)
    n1 = spark.read.parquet(out).count()

    # Restart with no new input: checkpoint says everything is consumed.
    q2 = run_streaming_extraction(spark, inp, media_df, out, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == n1 == N_DOCS


def _events_df(spark, rows):
    """rows: (user_id, epoch_s, event_type, value) → events stream schema."""
    from ocr_spark.streaming import EVENTS_STREAM_DDL

    return spark.createDataFrame(
        [(u, s, k, v) for u, s, k, v in rows],
        "user_id bigint, s bigint, event_type string, value double",
    ).selectExpr(
        "user_id", "timestamp_seconds(s) AS ts", "event_type", "value"
    )


def test_windowed_counts_append_and_late_drop(spark, tmp_path):
    """APPEND-mode watermarked windows: finalized windows emit exactly
    once when the watermark passes; a later-than-watermark event is
    dropped (no duplicate or updated row for its window)."""
    from ocr_spark.streaming import stream_windowed_counts

    inp, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    H = 3600
    f1 = _events_df(spark, [
        (1, 0 * H + 10, "a", 1.0), (1, 0 * H + 20, "a", 2.0),
        (1, 1 * H + 10, "a", 1.0),
        (2, 2 * H + 5, "b", 4.0), (2, 2 * H + 6, "b", 1.0),
        (2, 2 * H + 7, "b", 1.0),
        (9, 10 * H, "a", 0.0),     # watermark driver → wm = 8h
    ])
    f1.coalesce(1).write.mode("append").parquet(inp)
    q = stream_windowed_counts(spark, inp, out, ckpt)
    q.awaitTermination(120)
    got1 = {(r.window_start.hour, r.event_type): (r.n_events, r.total_value)
            for r in spark.read.parquet(out).collect()}
    assert got1 == {(0, "a"): (2, 3.0), (1, "a"): (1, 1.0),
                    (2, "b"): (3, 6.0)}

    # late event for hour 1 (far behind the 8h watermark) + an hour-9
    # event whose window is not yet finalized
    f2 = _events_df(spark, [(1, 1 * H + 30, "a", 99.0),
                            (3, 9 * H + 10, "a", 1.0)])
    f2.coalesce(1).write.mode("append").parquet(inp)
    q = stream_windowed_counts(spark, inp, out, ckpt)
    q.awaitTermination(120)
    got2 = {(r.window_start.hour, r.event_type): (r.n_events, r.total_value)
            for r in spark.read.parquet(out).collect()}
    assert got2 == got1  # late row dropped, open window unemitted


def _dedup_events_df(spark, rows):
    """rows: (event_id, user_id, epoch_s) → EVENTS_DEDUP_DDL shape."""
    return spark.createDataFrame(
        [(e, u, s, "a", 0.0) for e, u, s in rows],
        "event_id bigint, user_id bigint, s bigint, event_type string, "
        "value double",
    ).selectExpr(
        "event_id", "user_id", "timestamp_seconds(s) AS ts",
        "event_type", "value"
    )


def test_stream_dedup_exact_bounded_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark: duplicates inside the watermark
    horizon are dropped (in-batch AND cross-batch); once the watermark
    evicts a key's state, a much-later copy is re-emitted — the
    documented bounded-state contract."""
    from ocr_spark.streaming import stream_dedup_exact

    inp, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    B = 100000

    def drain():
        q = stream_dedup_exact(spark, inp, out, ckpt,
                               watermark="2 hours")
        q.awaitTermination(120)
        return sorted(
            (r.event_id, int(r.ts.timestamp()))
            for r in spark.read.parquet(out).collect()
        )

    # key 1 duplicated in-batch; key 9 drives the watermark high enough
    # to evict key 1's state (1000+7200 < 50000-7200) but keep key 2's
    f1 = _dedup_events_df(spark, [
        (1, 7, B + 1000), (1, 7, B + 1000),
        (2, 7, B + 44000),
        (9, 8, B + 50000),
    ])
    f1.coalesce(1).write.mode("append").parquet(inp)
    assert drain() == [(1, B + 1000), (2, B + 44000), (9, B + 50000)]

    # batch 2: key 2's duplicate is still within its state horizon →
    # dropped; key 1's state was evicted → its late copy re-emits
    f2 = _dedup_events_df(spark, [
        (2, 7, B + 44500),
        (1, 7, B + 51000),
    ])
    f2.coalesce(1).write.mode("append").parquet(inp)
    assert drain() == [(1, B + 1000), (1, B + 51000),
                       (2, B + 44000), (9, B + 50000)]


def test_sessionize_buffers_reopenable_sessions_across_batches(
    spark, tmp_path
):
    """A gap-closed session whose end+gap is still ABOVE the watermark must
    stay buffered in state: a within-watermark out-of-order event arriving
    in a LATER batch can bridge the gap, and the stream must then emit the
    single merged session the batch twin would produce (not the split
    pair an eager in-batch emission would have locked in)."""
    from ocr_spark.streaming import sessionize_stream

    inp, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    B = 100000

    def drain():
        q = sessionize_stream(spark, inp, out, ckpt,
                              gap_s=1800.0, watermark="2 hours")
        q.awaitTermination(120)
        return sorted(
            (r.user_id, r.session_start, r.session_end, r.n_events)
            for r in spark.read.parquet(out).collect()
        )

    # gap 2000 > 1800 splits these in-batch, but end+gap is above the
    # watermark → both stay buffered, nothing emitted
    f1 = _events_df(spark, [(7, B, "a", 0.0), (7, B + 2000, "a", 0.0)])
    f1.coalesce(1).write.mode("append").parquet(inp)
    assert drain() == []

    # the bridging event (within watermark) merges everything into ONE
    # session; the far-future event drives the watermark past its close
    f2 = _events_df(spark, [(7, B + 1000, "a", 0.0),
                            (1, B + 20000, "a", 0.0)])
    f2.coalesce(1).write.mode("append").parquet(inp)
    assert drain() == [(7, float(B), float(B + 2000), 3)]


def test_sessionize_stream_stateful_gap_and_timeout(spark, tmp_path):
    """applyInPandasWithState sessionization: in-batch gap closes a
    session immediately; the open session survives restarts in the state
    store and is closed by the event-time timeout once the watermark
    passes end+gap (availableNow runs a trailing no-data batch that fires
    newly-eligible timeouts) — each session emitted exactly once.

    Timestamps sit well above epoch 0: a row whose event time equals the
    initial watermark (0) is dropped by the stateful operator's late-row
    filter."""
    from ocr_spark.streaming import sessionize_stream

    inp, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    B = 100000

    def drain():
        q = sessionize_stream(spark, inp, out, ckpt,
                              gap_s=1800.0, watermark="10 minutes")
        q.awaitTermination(120)
        return sorted(
            (r.user_id, r.session_start, r.session_end, r.n_events)
            for r in spark.read.parquet(out).collect()
        )

    f1 = _events_df(spark, [
        (7, B + 0, "a", 0.0), (7, B + 10, "a", 0.0),        # session A
        (7, B + 5000, "a", 0.0), (7, B + 5010, "a", 0.0),   # session B (open)
        (8, B + 100, "a", 0.0),                              # session C
    ])
    f1.coalesce(1).write.mode("append").parquet(inp)
    # drain 1: A closes in-batch on the gap; the trailing no-data batch
    # advances the watermark to B+5010-600, past C's timeout (B+1900) →
    # C emits too.  Session B (timeout B+6810) stays open.
    assert drain() == [(7, B + 0.0, B + 10.0, 2),
                       (8, B + 100.0, B + 100.0, 1)]

    # drain 2: the new event advances the watermark past B's timeout →
    # B emits exactly once; the driver's own session stays open.
    f2 = _events_df(spark, [(9, B + 20000, "a", 0.0)])
    f2.coalesce(1).write.mode("append").parquet(inp)
    assert drain() == [(7, B + 0.0, B + 10.0, 2),
                       (7, B + 5000.0, B + 5010.0, 2),
                       (8, B + 100.0, B + 100.0, 1)]


def test_drain_empty_events_fails_with_clear_message(spark, tmp_path):
    """An empty (or all-NULL-ts) events input cannot anchor the watermark
    sentinel — the drain must raise a descriptive error up front instead
    of emitting nothing and dying later in parquet schema inference on
    the empty output directory."""
    import pytest

    from ocr_spark.streaming import (
        drain_dedup_exact, drain_sessions, drain_windowed_counts,
    )

    empty = spark.createDataFrame(
        [],
        "user_id bigint, ts timestamp, event_type string, value double",
    )
    with pytest.raises(ValueError, match="empty events"):
        drain_windowed_counts(spark, empty, str(tmp_path / "w"))
    with pytest.raises(ValueError, match="empty events"):
        drain_sessions(spark, empty, str(tmp_path / "s"))
    with pytest.raises(ValueError, match="empty events"):
        drain_dedup_exact(
            spark,
            spark.createDataFrame(
                [],
                "event_id bigint, user_id bigint, ts timestamp, "
                "event_type string, value double",
            ),
            str(tmp_path / "d"),
        )


def test_sessionize_skips_null_ts_events(spark, tmp_path):
    """A NULL-ts event reaches the stateful operator (the engine's
    late-row predicate treats NULL as not-late) and Arrow delivers it as
    pd.NaT — which `is not None`.  The operator must SKIP it (matching
    the batch twin, where NULL event times join no session), not crash
    on NaT.timestamp()."""
    from ocr_spark.streaming import drain_sessions

    base = [(1, 1000, "a", 1.0), (1, 1500, "a", 1.0), (2, 9000, "b", 1.0)]
    with_null = _events_df(spark, base).unionByName(
        spark.createDataFrame(
            [(1, None, "a", 1.0)],
            "user_id bigint, s bigint, event_type string, value double",
        ).selectExpr(
            "user_id", "timestamp_seconds(s) AS ts", "event_type", "value"
        )
    )
    got = drain_sessions(
        spark, with_null, str(tmp_path / "null_ts"), gap_s=600.0
    ).orderBy("user_id", "session_start").collect()
    want = drain_sessions(
        spark, _events_df(spark, base), str(tmp_path / "no_null"),
        gap_s=600.0,
    ).orderBy("user_id", "session_start").collect()
    assert got == want and len(got) == 2


def test_drains_keep_null_group_keys(spark, tmp_path):
    """NULL group keys are real result rows (the batch twins' GROUP BY
    keeps the NULL group); the drain read-back's sentinel filter must be
    null-safe — a plain `!= sentinel` evaluates NULL for them and would
    silently drop them."""
    from ocr_spark.streaming import drain_sessions, drain_windowed_counts

    rows = [(1, 1000, None, 2.0), (1, 1200, None, 3.0), (2, 2000, "b", 1.0)]
    wc = drain_windowed_counts(
        spark, _events_df(spark, rows), str(tmp_path / "wc")
    ).collect()
    null_rows = [r for r in wc if r["event_type"] is None]
    assert len(null_rows) == 1
    assert null_rows[0]["n_events"] == 2
    assert null_rows[0]["total_value"] == 5.0

    srows = [(None, 1000, "a", 1.0), (None, 1400, "a", 1.0),
             (7, 2000, "a", 1.0)]
    ses = drain_sessions(
        spark, _events_df(spark, srows), str(tmp_path / "ses"), gap_s=600.0
    ).collect()
    null_ses = [r for r in ses if r["user_id"] is None]
    assert len(null_ses) == 1 and null_ses[0]["n_events"] == 2


def test_windowed_counts_survive_huge_values(spark, tmp_path):
    """|value| ≥ 1e14 overflowed the old decimal(18,4) sum cast — a
    query-killing error under ANSI (the Spark 4 default).  decimal(28,4)
    must hold it and sum exactly."""
    from ocr_spark.streaming import drain_windowed_counts

    rows = [(1, 1000, "a", 1.0e15), (1, 1100, "a", 2.5), (2, 9000, "b", 1.0)]
    got = drain_windowed_counts(
        spark, _events_df(spark, rows), str(tmp_path / "big")
    ).collect()
    a = [r for r in got if r["event_type"] == "a"]
    assert len(a) == 1 and a[0]["total_value"] == 1.0e15 + 2.5
