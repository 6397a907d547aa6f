"""Streaming ingest with cross-batch exact dedup through the store seam.

The production composition the batch pieces were built for: a
Structured-Streaming source of ``(doc_id, text)`` document rows is
drained micro-batch by micro-batch, each batch is deduplicated against
the COMMITTED digest store (first-run-wins — a document whose normalized
text digest is already committed is dropped; within the batch the
minimum id wins, via :func:`ocr_spark.dedup.exact_duplicates_incremental`),
the surviving canonical documents land in a per-batch output partition,
and the batch's digests are appended to the store as ONE tagged tableio
snapshot.  The reference service (main.py:1284-1346) processes each
uploaded document exactly once per request; this is that semantic as a
continuously-running, restartable pipeline.

Exactly-once across crashes and foreachBatch replays, with NO
distributed transaction, comes from write ordering plus one idempotence
primitive:

1. **Replay short-circuit** — each batch commits under a deterministic
   tag ``{stream_id}/b{batch_id}``.  If the tag is already in the
   store's manifest, the batch committed in a previous life: skip
   everything.  (Recomputing would be WRONG, not just wasted: the store
   now contains this batch's digests, so every doc would classify
   dup-of-committed and an overwrite would erase the batch's output.)
2. **Optional Bloom registry first** — when a registry table is
   configured, the batch's digest bitmap is appended BEFORE the main
   store commit.  A crash between the two leaves extra bits whose main
   commit never happened: future probes see false POSITIVES (extra
   verify work, resolved by the exact join), never false negatives
   (which would admit duplicates).  The safe over-approximation is why
   the registry is written first.  The registry ⊇ store invariant is
   ENFORCED at both edges (round 5): enabling the registry on a
   pre-existing store first backfills every committed digest (one pass,
   once per store lifetime), and a batch run with the registry disabled
   against a store that has one is REFUSED — either hole would let a
   probe prune a committed digest and admit its duplicate.
3. **Docs partition next** — per-batch dynamic partition overwrite, so
   a replayed write of the same batch id replaces rather than
   duplicates.
4. **Tagged store append LAST** — the commit point.  The append is
   refused under the writer lock if the tag already exists
   (:class:`ocr_spark.tableio.DuplicateTagError`), so even two racing
   replays of one batch commit exactly once.

A crash at any point therefore converges on retry: before (4) the store
is unchanged, so the recomputed kept-set is identical and the docs
overwrite is idempotent; after (4) the tag short-circuits.

Scale shape: per batch, one groupBy(digest) over the BATCH only, one
digest-keyed join of batch digests against the store probe (Bloom-pruned
to the might-contain survivors when the registry is on — at a 10^12-doc
store the registry bitmap is what keeps the probe join's build side from
being the whole store), and one narrow append.  The committed corpus is
never re-grouped.  Store growth is one snapshot per batch — fold with
``jobs/compact_store.py`` (tags survive compaction).
"""

from __future__ import annotations

import time

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_spark.dedup import exact_digests, exact_duplicates_incremental
from ocr_spark.tableio import DuplicateTagError, ParquetManifestIO
from ocr_spark.textstats import portable_hash

DOCS_SCHEMA_DDL = "doc_id bigint, text string"

#: store table holding the committed ``(id, digest)`` rows
STORE_TABLE = "digests"


def ingest_batch(
    spark: SparkSession,
    docs: DataFrame,
    batch_id: int,
    io: ParquetManifestIO,
    out_dir: str,
    *,
    stream_id: str = "ingest",
    store_table: str = STORE_TABLE,
    registry_m_bits: int | None = None,
    enforce_disjoint_ids: bool = True,
) -> dict:
    """Process ONE micro-batch of ``(doc_id, text)`` rows — the
    foreachBatch body of :func:`run_stream_dedup_ingest`, callable
    directly for batch-mode ingest.  Returns a stats dict
    (``replayed`` True when the tag short-circuit fired).

    ``registry_m_bits`` enables the Bloom-registry prune: size it at
    ~12 bits per EXPECTED TOTAL corpus doc (the membership module's
    m/n ≈ 12 → fpp ≈ 0.6% guidance) — the geometry is fixed at table
    creation and cannot be grown later.
    """
    tag = f"{stream_id}/b{batch_id:06d}"
    t0 = time.monotonic()
    if tag in io.tags(store_table):
        return {"batch_id": batch_id, "tag": tag, "replayed": True}
    if registry_m_bits is None and _registry_exists(io, store_table):
        # toggle-off guard: this store HAS a registry, and a batch
        # committed without appending to it would punch false-NEGATIVE
        # holes (probes would prune committed digests this batch adds)
        # — the one failure class the registry design rules out.  The
        # prune is optional; keeping the registry complete is not.
        raise ValueError(
            f"store table {store_table!r} has a Bloom registry "
            f"({_registry_table(store_table)!r}) but this run disabled "
            "it (registry_m_bits=None); committing a batch without the "
            "registry append would admit future duplicates — pass the "
            "registry geometry, or drop the registry table explicitly"
        )

    # batch-sized, consumed by up to four actions (disjointness guard,
    # verdict, registry append, store append) — one cache, dropped on
    # exit.  The try opens HERE: the disjointness fail-fast and the
    # registry reads are designed failure paths, and a driver that
    # catches per-batch errors and continues must not accrete one
    # leaked cache per failed batch.
    new_digests = exact_digests(docs).persist()
    n_pruned = None
    survivors_cache = None
    try:
        committed = None
        try:
            committed = io.read(spark, store_table)
        except FileNotFoundError:
            pass  # first batch ever — nothing committed yet

        if committed is not None:
            if enforce_disjoint_ids:
                # same precondition + fail-fast as
                # jobs/run_dedup_incremental: a batch re-submitting
                # committed ids under a NEW tag would double-commit
                # digests and corrupt first-run-wins semantics.
                overlap = (
                    new_digests.select("id")
                    .join(committed.select("id"), on="id", how="left_semi")
                    .limit(3)
                    .collect()
                )
                if overlap:
                    raise ValueError(
                        f"batch {batch_id}: doc ids overlap the "
                        "committed store (e.g. "
                        f"{sorted(r.id for r in overlap)}); each batch "
                        "must carry fresh ids — a replay of an "
                        "already-committed batch is detected by TAG, "
                        "not by resubmitting ids under a new tag"
                    )
            if registry_m_bits is not None:
                if not _registry_exists(io, store_table):
                    # registry enabled on a PRE-EXISTING store: back-
                    # fill every committed digest first, or the probe
                    # would report false negatives for them and admit
                    # duplicates (registry ⊇ store is the invariant the
                    # 'no false negatives' argument rests on).  One
                    # pass over the store, once per store lifetime; a
                    # crash after this append just leaves a registry
                    # that over-contains committed — the safe side.
                    _registry_append(
                        io, committed, store_table, registry_m_bits
                    )
                committed, n_pruned, survivors_cache = _registry_prune(
                    spark, io, new_digests, committed, store_table,
                    registry_m_bits,
                )

        verdict = exact_duplicates_incremental(new_digests, committed)
        kept_ids = verdict.filter(F.col("kept")).select("id").persist()
        # NULL-text rows have no digest (exact_digests excludes them to
        # avoid a bogus NULL-digest group) — they ride through unscreened
        # rather than vanish: content-less rows can't be duplicates, and
        # dropping data silently is never this pipeline's job.
        kept_docs = docs.filter(F.col("text").isNull()).unionByName(
            docs.join(
                kept_ids.withColumnRenamed("id", "doc_id"),
                on="doc_id", how="left_semi",
            )
        )

        if registry_m_bits is not None:
            # registry BEFORE docs/store (module docstring, ordering
            # rule 2: crash between the appends must over-contain, so
            # future probes get false positives, never false negatives)
            _registry_append(io, new_digests, store_table, registry_m_bits)

        (
            kept_docs.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )

        # commit point: kept rows only (keeps the store digest-unique by
        # construction — the probe's defensive distinct never multiplies)
        kept_digest_rows = new_digests.join(
            kept_ids, on="id", how="left_semi"
        )
        try:
            snap = io.append(kept_digest_rows, store_table, tag=tag)
        except DuplicateTagError:
            # a racing replay won the lock between our tags() check and
            # the append; its docs overwrite carried the same content
            return {"batch_id": batch_id, "tag": tag, "replayed": True}

        n_in = new_digests.count()  # digestable (non-NULL-text) rows
        n_kept = kept_ids.count()
        return {
            "batch_id": batch_id,
            "tag": tag,
            "replayed": False,
            "snapshot": snap,
            "docs_in": n_in,
            "docs_kept": n_kept,
            "docs_dropped": n_in - n_kept,
            "registry_survivors": n_pruned,
            "wall_s": round(time.monotonic() - t0, 3),
        }
    finally:
        new_digests.unpersist()
        try:
            kept_ids.unpersist()
        except NameError:
            pass
        if survivors_cache is not None:
            survivors_cache.unpersist()  # one cache per BATCH — a
            # continuous stream would otherwise accrete one forever


def _registry_exists(io, store_table: str) -> bool:
    """Whether the store's Bloom registry table has ever committed —
    manifest presence, the same existence probe the store tables use."""
    import os

    return os.path.exists(os.path.join(
        io.root, _registry_table(store_table), "manifest.json"
    ))


def _registry_table(store_table: str) -> str:
    return f"{store_table}_bloom"


def _registry_key(df: DataFrame) -> DataFrame:
    """Bloom keys are the portable 60-bit hash of the digest string —
    the registry's unit is the digest, matching the store's join key."""
    return df.select(portable_hash(F.col("digest")).alias("g"))


def _registry_append(
    io, new_digests: DataFrame, store_table: str, m_bits: int
) -> None:
    from ocr_spark.membership import DEFAULT_K, bloom_store_append

    m, k = m_bits, DEFAULT_K
    bloom_store_append(
        io, _registry_key(new_digests), "g",
        _registry_table(store_table), m, k,
    )


def _registry_prune(
    spark, io, new_digests: DataFrame, committed: DataFrame,
    store_table: str, m_bits: int,
):
    """Shrink the store probe to digests the registry says MIGHT be
    committed.  No false negatives (every committed digest's bits are
    set — the registry commits before the store, so it can only
    over-contain); false positives just ride through to the exact join.
    Returns (pruned committed-side, survivor count, survivors cache to
    unpersist after the batch commits) — the committed side is filtered
    by semi-join against the surviving batch digests, so the exact
    join's build input is |survivors|-bounded, not |store|."""
    from ocr_spark.membership import (
        DEFAULT_K, bloom_probe, bloom_store_read,
    )

    m, k = m_bits, DEFAULT_K
    try:
        bitmap = bloom_store_read(
            io, spark, _registry_table(store_table), m, k
        )
    except FileNotFoundError:
        # registry table not yet created (e.g. enabled on an existing
        # store): no prune this batch; the append below creates it
        return committed, None, None
    probed = bloom_probe(
        _registry_key(new_digests).distinct(), bitmap, "g", m, k
    )
    survivors = (
        probed.filter(F.col("might_contain"))
        .select("g")
        .persist()          # consumed by the count and the semi-join
    )
    n_survivors = survivors.count()
    pruned = committed.join(
        survivors,
        on=portable_hash(F.col("digest")) == survivors["g"],
        how="left_semi",
    )
    return pruned, n_survivors, survivors


def _start_ingest_stream(
    spark: SparkSession,
    schema_ddl: str,
    input_dir: str,
    checkpoint_dir: str,
    process_batch,
    available_now: bool,
    max_files_per_trigger: int,
):
    """Shared readStream → foreachBatch → checkpoint scaffolding of the
    three ingest entry points — one definition so a stream option or
    trigger change cannot be applied to two of the three and drift."""
    writer = (
        spark.readStream.schema(schema_ddl)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(input_dir)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_stream_dedup_ingest(
    spark: SparkSession,
    input_dir: str,
    store_root: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    stream_id: str = "ingest",
    registry_m_bits: int | None = None,
    available_now: bool = True,
    max_files_per_trigger: int = 8,
    collect_stats: list | None = None,
):
    """Stream ``(doc_id, text)`` parquet drops from ``input_dir``
    through :func:`ingest_batch`; returns the StreamingQuery.

    ``available_now=True`` drains everything present and stops (the
    scheduled-incremental mode); ``False`` runs continuously.  Restart
    with the same ``checkpoint_dir`` to resume — already-processed files
    are skipped by the checkpoint, and a replayed in-flight batch is
    skipped by its store tag.  ``collect_stats`` (a list) receives each
    batch's stats dict — test/driver telemetry only.
    """
    io = ParquetManifestIO(store_root)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        stats = ingest_batch(
            spark, batch_df, batch_id, io, out_dir,
            stream_id=stream_id,
            registry_m_bits=registry_m_bits,
        )
        if collect_stats is not None:
            collect_stats.append(stats)

    return _start_ingest_stream(
        spark, DOCS_SCHEMA_DDL, input_dir, checkpoint_dir,
        process_batch, available_now, max_files_per_trigger,
    )


# --------------------------------------------------------------- near-dup

SIGNATURES_TABLE = "signatures"


def neardup_ingest_batch(
    spark: SparkSession,
    docs: DataFrame,
    batch_id: int,
    io: ParquetManifestIO,
    out_dir: str,
    *,
    stream_id: str = "neardup",
    threshold: float = 0.3,
) -> dict:
    """One micro-batch through the FULL incremental dedup family (exact
    + MinHash near-dup + cluster maintenance) against the committed
    signature store — the streaming twin of
    ``jobs/run_dedup_incremental.py``, sharing its compute core
    (:func:`ocr_spark.dedup.incremental_signature_delta`) so batch and
    streaming deployments cannot drift.

    Outputs per batch (both ``batch_id``-partitioned dynamic overwrite,
    so replays rewrite rather than duplicate):

    * ``{out_dir}/docs`` — exact-kept docs with their CURRENT cluster
      label (NULL-text rows ride through with a NULL label, as in
      :func:`ingest_batch`);
    * ``{out_dir}/pairs`` — verified near-dup pairs touching this batch.

    Commit point: ONE tagged append of the batch's signature rows
    (docs + merge records).  Same crash-window argument as
    :func:`ingest_batch`: before the tagged append the store is
    unchanged, so a replay recomputes the identical delta and the
    overwrites are idempotent; after it, the tag short-circuits.
    """
    from ocr_spark.dedup import incremental_signature_delta

    tag = f"{stream_id}/b{batch_id:06d}"
    t0 = time.monotonic()
    if tag in io.tags(SIGNATURES_TABLE):
        return {"batch_id": batch_id, "tag": tag, "replayed": True}

    committed = None
    try:
        committed = io.read(spark, SIGNATURES_TABLE)
    except FileNotFoundError:
        pass

    delta = incremental_signature_delta(docs, committed, threshold)
    try:
        labeled = docs.filter(F.col("text").isNull()).withColumn(
            "cluster_id", F.lit(None).cast("bigint")
        ).unionByName(
            docs.join(
                delta["clusters"].filter("role = 'delta'").select(
                    F.col("id").alias("doc_id"), "cluster_id"
                ),
                on="doc_id",
            )
        )
        (
            labeled.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(f"{out_dir}/docs")
        )
        (
            delta["pairs"].withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(f"{out_dir}/pairs")
        )

        try:
            snap = io.append(
                delta["store_rows"], SIGNATURES_TABLE, tag=tag
            )
        except DuplicateTagError:
            return {"batch_id": batch_id, "tag": tag, "replayed": True}

        counts = delta["exact"].agg(
            F.count(F.lit(1)).alias("n_new"),
            F.sum(F.col("dup_of_committed").cast("bigint"))
            .alias("n_dup_of_committed"),
            F.sum(F.col("kept").cast("bigint")).alias("n_kept"),
        ).first()
        return {
            "batch_id": batch_id,
            "tag": tag,
            "replayed": False,
            "snapshot": snap,
            "docs_in": counts["n_new"],
            "docs_kept": int(counts["n_kept"] or 0),
            "dup_of_committed": int(counts["n_dup_of_committed"] or 0),
            "near_pairs": delta["pairs"].count(),
            "merges": delta["clusters"].filter("role = 'merge'").count(),
            "wall_s": round(time.monotonic() - t0, 3),
        }
    finally:
        for k in ("exact", "sketches", "pairs", "clusters"):
            delta[k].unpersist()


def run_stream_neardup_ingest(
    spark: SparkSession,
    input_dir: str,
    store_root: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    stream_id: str = "neardup",
    threshold: float = 0.3,
    available_now: bool = True,
    max_files_per_trigger: int = 8,
    collect_stats: list | None = None,
):
    """Stream ``(doc_id, text)`` parquet drops through
    :func:`neardup_ingest_batch` — continuous ingestion with cross-batch
    exact AND near-duplicate maintenance.  Same checkpoint/tag resume
    semantics as :func:`run_stream_dedup_ingest`."""
    io = ParquetManifestIO(store_root)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        stats = neardup_ingest_batch(
            spark, batch_df, batch_id, io, out_dir,
            stream_id=stream_id, threshold=threshold,
        )
        if collect_stats is not None:
            collect_stats.append(stats)

    return _start_ingest_stream(
        spark, DOCS_SCHEMA_DDL, input_dir, checkpoint_dir,
        process_batch, available_now, max_files_per_trigger,
    )


# ------------------------------------------------- extraction × dedup store

EXTRACT_STORE_TABLE = "doc_digests"

#: record separator between serialized spans; unit separator within one
_SPAN_RS, _SPAN_US = "\x1e", "\x1f"


def _framed(field: Column) -> Column:
    """``<len>:<field>`` — explicit-length framing.  A parser reads the
    decimal length, takes exactly that many chars, and expects the next
    delimiter; field CONTENT can therefore never shift the framing, so
    the concatenated encoding is injective over field sequences (the
    bare separator scheme it replaced collided when extracted text
    itself contained \\x1e/\\x1f — OCR output is not sanitized for
    control characters, and a colliding pair would silently drop a
    NON-duplicate document)."""
    return F.concat(F.length(field).cast("string"), F.lit(":"), field)


def serialized_spans(spans_out: Column) -> Column:
    """Canonical serialization of an extracted span sequence — the digest
    input for document-level dedup: every field of every span, in offset
    order (``spans_out`` is emitted ordered), length-prefix-framed
    (:func:`_framed`) and delimited, so DISTINCT sequences cannot
    collide regardless of field content.  NULL fields encode as ``''``
    (deliberate: a NULL and an empty extracted text are the same
    no-content outcome).  NULL for an EMPTY sequence:
    quarantined/empty documents carry no content to deduplicate on and
    must not collapse into one bogus ''-digest group (they ride through
    unscreened, like NULL-text rows in :func:`ingest_batch`).

    Framing v2 (round 5): digests differ from the unframed v1 encoding
    — a store written by v1 must be rebuilt before running under v2, or
    v1-era content would re-keep once (content identity only holds
    within one framing version).
    """
    ser = F.array_join(
        F.transform(
            spans_out,
            lambda s: F.concat_ws(
                _SPAN_US,
                _framed(F.coalesce(s["kind"], F.lit(""))),
                _framed(F.coalesce(s["text"], F.lit(""))),
                _framed(F.coalesce(s["media_ref"], F.lit(""))),
                _framed(s["offset"].cast("string")),
            ),
        ),
        _SPAN_RS,
    )
    return F.when(F.size(spans_out) > 0, ser)


def extract_ingest_batch(
    spark: SparkSession,
    spans_df: DataFrame,
    media_df: DataFrame,
    batch_id: int,
    io: ParquetManifestIO,
    out_dir: str,
    *,
    cfg=None,
    stream_id: str = "extract",
    store_table: str = EXTRACT_STORE_TABLE,
    enforce_disjoint_ids: bool = True,
) -> dict:
    """One micro-batch of INTERLEAVED documents (span rows + media
    store) through the flagship extraction pipeline, then exact
    document-level dedup against the committed store — the north-rule
    pipeline as a continuously-running, exactly-once ingest:

    1. ``run_extraction`` (boilerplate strip, OCR seam, offset-order
       splice) produces ``(doc_id, spans_out, fields, errors)``;
    2. the span sequence serializes canonically
       (:func:`serialized_spans` — the SAME (kind, text, media_ref,
       order) tuple the north invariant equates on) and digests against
       the committed store, first-run-wins;
    3. kept documents (full extraction rows) land in a
       ``batch_id``-partitioned dynamic-overwrite output;
    4. the batch's digests commit as ONE tagged snapshot.

    Same crash-window convergence as :func:`ingest_batch`.  Documents
    with EMPTY ``spans_out`` (quarantined/oversized/genuinely empty)
    ride through unscreened — no content, no dedup, never dropped.
    """
    tag = f"{stream_id}/b{batch_id:06d}"
    t0 = time.monotonic()
    if tag in io.tags(store_table):
        return {"batch_id": batch_id, "tag": tag, "replayed": True}

    from ocr_spark.pipeline import run_extraction

    docs = run_extraction(spark, spans_df, media_df, cfg).persist()
    try:
        keyed = docs.select(
            "doc_id", serialized_spans(F.col("spans_out")).alias("text")
        )
        new_digests = exact_digests(keyed, "text", "doc_id").persist()

        committed = None
        try:
            committed = io.read(spark, store_table)
        except FileNotFoundError:
            pass

        if committed is not None and enforce_disjoint_ids:
            # same precondition + fail-fast as ingest_batch: spans for
            # an already-committed doc_id re-dropped under new file
            # names (the checkpoint skips FILES, not content) whose
            # extraction output changed would otherwise commit a second
            # (id, digest) row and corrupt first-run-wins semantics
            overlap = (
                new_digests.select("id")
                .join(committed.select("id"), on="id", how="left_semi")
                .limit(3)
                .collect()
            )
            if overlap:
                raise ValueError(
                    f"batch {batch_id}: doc ids overlap the committed "
                    f"store (e.g. {sorted(r.id for r in overlap)}); "
                    "each batch must carry fresh doc ids — replays of "
                    "a committed batch are detected by TAG"
                )

        verdict = exact_duplicates_incremental(new_digests, committed)
        kept_ids = verdict.filter(F.col("kept")).select("id").persist()
        kept_docs = docs.join(
            keyed.filter(F.col("text").isNull()).select("doc_id"),
            on="doc_id", how="left_semi",
        ).unionByName(
            docs.join(
                kept_ids.withColumnRenamed("id", "doc_id"),
                on="doc_id", how="left_semi",
            )
        )
        (
            kept_docs.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )
        kept_digest_rows = new_digests.join(kept_ids, on="id",
                                            how="left_semi")
        try:
            snap = io.append(kept_digest_rows, store_table, tag=tag)
        except DuplicateTagError:
            return {"batch_id": batch_id, "tag": tag, "replayed": True}
        n_in = docs.count()
        n_digestable = new_digests.count()
        n_kept = kept_ids.count()
        return {
            "batch_id": batch_id,
            "tag": tag,
            "replayed": False,
            "snapshot": snap,
            "docs_in": n_in,
            "docs_empty": n_in - n_digestable,
            "docs_kept": n_kept,
            "docs_dropped": n_digestable - n_kept,
            "wall_s": round(time.monotonic() - t0, 3),
        }
    finally:
        docs.unpersist()
        try:
            new_digests.unpersist()
            kept_ids.unpersist()
        except NameError:
            pass  # failed before the later persists existed


def run_stream_extract_ingest(
    spark: SparkSession,
    input_dir: str,
    media_df: DataFrame,
    store_root: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    cfg=None,
    stream_id: str = "extract",
    available_now: bool = True,
    max_files_per_trigger: int = 8,
    collect_stats: list | None = None,
):
    """Stream span-row parquet drops through extraction + store-backed
    document dedup (:func:`extract_ingest_batch`) — the flagship
    pipeline as continuous exactly-once ingestion.  ``media_df`` is the
    media store dimension (static, joined per batch, as in
    :func:`ocr_spark.streaming.run_streaming_extraction`)."""
    from ocr_spark.fixtures import SPANS_SCHEMA_DDL

    io = ParquetManifestIO(store_root)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        stats = extract_ingest_batch(
            spark, batch_df, media_df, batch_id, io, out_dir,
            cfg=cfg, stream_id=stream_id,
        )
        if collect_stats is not None:
            collect_stats.append(stats)

    return _start_ingest_stream(
        spark, SPANS_SCHEMA_DDL, input_dir, checkpoint_dir,
        process_batch, available_now, max_files_per_trigger,
    )
