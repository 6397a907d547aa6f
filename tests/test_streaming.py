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
