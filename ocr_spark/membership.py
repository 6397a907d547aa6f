"""Distributed Bloom-filter membership: the scale path for set-membership
joins whose build side is too big to broadcast exactly.

:func:`ocr_spark.decontam.decontaminate` broadcasts the eval set's hashed
n-grams — right for benchmark eval sets (10^4–10^6 grams), wrong for the
other membership workloads a 100 TB curation pipeline runs daily: URL /
domain blocklists, previously-emitted-document registries, cross-corpus
"seen" sets, all of which reach 10^9+ keys (8+ GB exact — far past any
broadcast ceiling).  The classic fix is a Bloom filter, and the
Spark-first shape for one is **the bitmap as a table**:

* **build** — every key contributes ``k`` bit positions; positions group
  by 63-bit word index and ``bit_or`` into one bigint per word.  One
  narrow shuffle of ``k`` ints per key, output ``m/63`` rows total
  (a 10^10-bit filter is ~159M rows ≈ 2.5 GB — a *table*, not a
  broadcast, so the build side has no memory ceiling).
* **probe** — each probe key explodes its ``k`` positions, equi-joins
  the bitmap on ``word_idx`` (broadcast when the filter is small,
  shuffled hash join when it is not — Spark picks via AQE), and passes
  iff **all** ``k`` bits are set.

No false negatives ever; false positives at the standard
``(1 - e^{-kn/m})^k`` rate, so the intended composition is
**prune → exact verify**: Bloom-prune the 99.9% of probe keys that
cannot match, then run the exact join on the survivors only
(:func:`ocr_spark.decontam.decontaminate_bloom` with ``mode='verify'``).

Portability contract (oracle-replayable, like everything else here):

* positions come from Kirsch-Mitzenmacher double hashing over the
  already-portable 60-bit md5 hash (:func:`ocr_spark.textstats.portable_hash`):
  ``h2 = ((g >> 31) & (2^29-1)) | 1`` (odd, so it steps through all
  residues of a power-of-two ``m``), ``pos_i = (g + i·h2) mod m``.
  The base term is the FULL 60-bit hash, not a 31-bit slice, so
  positions stay uniform over ``[0, m)`` for any ``m_bits`` up to the
  ``2^50`` guard (mod bias ≤ 2^-10; the 10^10-bit blocklist regime is
  ~2^34).  Max intermediate ``g + (k-1)·h2 < 2^60 + k·2^29`` — no
  int64 overflow in either engine, independent of ``m_bits``.
  (For power-of-two ``m_bits ≤ 2^31`` this is bit-identical to the
  earlier ``h1 = g & (2^31-1)`` form, since ``2^31 ≡ 0 (mod m)`` —
  existing small-geometry bitmaps remain readable.)
* words hold **63 bits, not 64**: DuckDB raises OutOfRange on
  ``1::BIGINT << 63`` (sign bit), so the portable word uses shifts
  ≤ 62 and both engines agree bit-for-bit.  The 1/64 space overhead is
  the price of an exact cross-engine twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WORD_BITS = 63  # NOT 64 — see module docstring (DuckDB << 63 overflow)

_H2_MASK = (1 << 29) - 1

# Uniformity guard: positions are g mod m_bits over a 60-bit hash, so the
# mod bias is ~m/2^60 — capped at 2^50 it stays ≤ 2^-10.  Anything larger
# is also far past a sane filter (2^50 bits ≈ 141 TB of bitmap).
MAX_M_BITS = 1 << 50

# Defaults sized for the prune→verify composition: k=4 with m/n ≈ 12
# gives fpp ≈ 0.6%; callers size m_bits = 12 × expected keys (rounded up)
# and keep k=4 unless they measure otherwise.
DEFAULT_K = 4


def bloom_positions(g: Column, m_bits: int, k: int = DEFAULT_K) -> Column:
    """``array<bigint>`` of ``k`` bit positions in ``[0, m_bits)`` for a
    60-bit portable hash ``g`` — Kirsch-Mitzenmacher double hashing, pure
    int64 arithmetic (see module docstring for the overflow headroom).
    The base term is the full hash, so every bit of an arbitrarily large
    filter is addressable (up to the ``MAX_M_BITS`` uniformity guard)."""
    if m_bits <= 0:
        raise ValueError(f"m_bits must be positive, got {m_bits}")
    if m_bits > MAX_M_BITS:
        raise ValueError(
            f"m_bits={m_bits} exceeds MAX_M_BITS={MAX_M_BITS}; positions "
            "are derived mod m from a 60-bit hash and lose uniformity "
            "past 2^50 bits"
        )
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    h2 = F.shiftrightunsigned(g, 31).bitwiseAND(F.lit(_H2_MASK)) \
        .bitwiseOR(F.lit(1))
    return F.array(*[
        F.pmod(g + F.lit(i) * h2, F.lit(m_bits)).cast("bigint")
        for i in range(k)
    ])


def _word_idx(pos: Column) -> Column:
    # pos ≥ 0, so truncation == floor; keep it bigint end-to-end
    return (pos / F.lit(WORD_BITS)).cast("bigint")


def bloom_build(
    keys: DataFrame,
    key_col: str,
    m_bits: int,
    k: int = DEFAULT_K,
) -> DataFrame:
    """``(word_idx: bigint, word: bigint)`` bitmap table for the distinct
    hashed keys in ``keys[key_col]`` (bigint).  One shuffle: explode the
    ``k`` positions per key, group by 63-bit word index, ``bit_or`` the
    masks.  Output cardinality ≤ ``ceil(m_bits / 63)`` regardless of key
    count — the filter's whole point."""
    pos = (
        keys.select(F.col(key_col).alias("g"))
        .filter(F.col("g").isNotNull())
        .distinct()
        .select(F.explode(bloom_positions(F.col("g"), m_bits, k)).alias("pos"))
    )
    return (
        pos.select(
            _word_idx(F.col("pos")).alias("word_idx"),
            F.expr(f"shiftleft(1L, CAST(pmod(pos, {WORD_BITS}) AS INT))")
            .alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )


# bloom_probe's internal working columns — reserved (validated against the
# probe projection, since the re-aggregation keys on the probe's full row).
_PROBE_INTERNAL = (
    "__bloom_pos", "__bloom_word_idx", "__bloom_mask",
    "__bloom_word", "__bloom_hit",
)


def bloom_probe(
    probe: DataFrame,
    bloom: DataFrame,
    key_col: str,
    m_bits: int,
    k: int = DEFAULT_K,
    out_col: str = "might_contain",
    broadcast_bloom: bool = True,
) -> DataFrame:
    """``probe`` + boolean ``out_col``: true iff every one of the key's
    ``k`` positions has its bit set in ``bloom``.

    The probe explodes to ``k`` rows per input row, equi-joins the bitmap
    on the word index (LEFT: a word index absent from the bitmap means no
    key ever touched that word — bit unset), and re-aggregates with
    ``min(hit)``.  ``broadcast_bloom=True`` is right whenever
    ``m_bits/63`` rows fit an executor (up to ~10^8 bits); beyond that
    pass False and let the shuffled hash join + AQE handle it.  The
    re-aggregation groups on the probe's FULL row (all original columns),
    so callers need no surrogate key; keep the probe projection narrow.
    Internal working columns are ``__bloom_``-prefixed, so arbitrary
    probe projections never collide (validated, not assumed).

    SET semantics, by construction: the output carries one row per
    DISTINCT probe row — duplicate probe rows collapse in the
    re-aggregation (membership is a property of the key, so every
    in-repo caller passes pre-distincted probes).  If duplicate rows
    are meaningful, carry a uniqueness column (position, doc id)
    through the probe projection; rows with non-groupable column types
    (maps) need the same treatment.
    """
    pcols = probe.columns
    clash = [c for c in pcols if c == out_col or c in _PROBE_INTERNAL]
    if clash:
        raise ValueError(
            f"probe columns {clash!r} collide with the probe output "
            f"({out_col!r}) or its reserved internals {_PROBE_INTERNAL}"
        )
    exploded = probe.select(
        *pcols,
        F.explode(bloom_positions(F.col(key_col), m_bits, k))
        .alias("__bloom_pos"),
    ).select(
        *pcols,
        _word_idx(F.col("__bloom_pos")).alias("__bloom_word_idx"),
        F.expr(f"shiftleft(1L, CAST(pmod(__bloom_pos, {WORD_BITS}) AS INT))")
        .alias("__bloom_mask"),
    )
    bm = bloom.select(
        F.col("word_idx").alias("__bloom_word_idx"),
        F.col("word").alias("__bloom_word"),
    )
    if broadcast_bloom:
        bm = F.broadcast(bm)
    hit = F.when(
        F.col("__bloom_word").isNotNull()
        & (F.col("__bloom_word").bitwiseAND(F.col("__bloom_mask")) != 0),
        F.lit(1),
    ).otherwise(F.lit(0))
    return (
        exploded.join(bm, on="__bloom_word_idx", how="left")
        .select(*pcols, hit.alias("__bloom_hit"))
        .groupBy(*pcols)
        .agg((F.min("__bloom_hit") == 1).alias(out_col))
    )


# ---------------------------------------------------------------------------
# Cross-run Bloom registry: an incremental membership store.
#
# Bloom bitmaps merge by OR — union(A, B)'s filter is exactly
# bit_or(word_A, word_B) per word index, with NO recomputation of either
# side's keys.  That makes a "seen" registry the cheapest member of the
# incremental-store family (dedup sketch stores persist per-doc rows and
# re-join them; this store persists only ≤ m/63 words per run and folds
# by one groupBy): each ingest run appends its delta keys' bitmap as one
# tableio snapshot, the read side ORs all snapshots, and compaction
# (jobs/compact_store.py --mode bloom-or) folds history into one
# snapshot without touching any key data.
#
# The honest trade, stated where callers will read it: the registry
# stores ONLY the bitmap, so "have we seen this key?" is approximate —
# a false positive silently drops a genuinely novel key at the filter's
# fpp.  Use it where that loss is acceptable (seen-URL suppression,
# best-effort cross-corpus novelty) or as the prune stage in front of an
# exact store; for exactly-once semantics use the digest store
# (dedup.exact_duplicates_incremental), which keeps the keys.
#
# Parameter drift is the corruption mode (a bitmap built at m=2^20 is
# meaningless read at m=2^24), so every row carries (m_bits, k) and the
# read side FAILS FAST on any mismatch — same loud-break discipline as
# the dedup stores' band_size/k guards.

def bloom_store_append(
    io,
    keys: DataFrame,
    key_col: str,
    table: str,
    m_bits: int,
    k: int = DEFAULT_K,
) -> int:
    """Build the delta keys' bitmap and commit it as one snapshot of
    ``table`` via the tableio seam.  Returns the snapshot id."""
    words = bloom_build(keys, key_col, m_bits, k).select(
        F.lit(m_bits).cast("bigint").alias("m_bits"),
        F.lit(k).cast("int").alias("k"),
        "word_idx", "word",
    )
    return io.append(words, table)


def bloom_store_read(
    io,
    spark,
    table: str,
    m_bits: int,
    k: int = DEFAULT_K,
) -> DataFrame:
    """The registry's current bitmap: every committed snapshot OR-folded
    per word index.  Raises on any snapshot whose (m_bits, k) disagree
    with the caller's — probing a bitmap under the wrong geometry is
    silent garbage, never a degraded answer.  (The validation pass
    reads only the two int param columns — parquet column pruning keeps
    it from re-reading the bitmap words, so per-call cost is metadata-
    scale, not bitmap-scale.)"""
    raw = io.read(spark, table)
    bad = (
        raw.select("m_bits", "k").distinct()
        .filter((F.col("m_bits") != m_bits) | (F.col("k") != k))
        .collect()          # bounded: one row per distinct param pair
    )
    if bad:
        seen = ", ".join(f"(m_bits={r.m_bits}, k={r.k})" for r in bad)
        raise ValueError(
            f"bloom store {table!r} holds snapshots with {seen}; caller "
            f"expects (m_bits={m_bits}, k={k}) — a geometry change needs "
            "a NEW table, bitmaps cannot be reinterpreted"
        )
    return raw.groupBy("word_idx").agg(F.bit_or("word").alias("word"))


def bloom_store_fold(df: DataFrame) -> DataFrame:
    """The compaction transform for a bloom registry (OR-merge words per
    index, parameters carried through) — pass to ``tableio.compact`` /
    ``jobs/compact_store.py``.  Refuses mixed-geometry history for the
    same reason the read side does."""
    # direct geometry check (same as the read path's): the earlier
    # word_idx-collision heuristic missed disjoint-word-index histories,
    # which would have compacted into a silently mixed snapshot.
    geoms = df.select("m_bits", "k").distinct().limit(2).collect()
    if len(geoms) > 1:
        raise ValueError(
            "bloom store holds mixed (m_bits, k) geometries; it cannot "
            "be compacted — split the histories into separate tables"
        )
    return (
        df.groupBy("m_bits", "k", "word_idx")
        .agg(F.bit_or("word").alias("word"))
        .select("m_bits", "k", "word_idx", "word")
    )
