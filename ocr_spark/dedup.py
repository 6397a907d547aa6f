"""Deduplication operators for large-corpus curation: exact, n-gram Jaccard,
MinHash + LSH banding, SimHash, and embedding-cosine near-dup.

All shapes are chosen for the 100 TB case, tested at SF scale:

- **exact**: one hash-groupBy shuffle on a 128-bit digest — the minimum
  possible; map-side partial aggregation applies to the count.
- **minhash/LSH**: signatures are computed per row (narrow, no shuffle);
  candidate generation shuffles on the *band key* only (small, uniform),
  never on O(n²) pairs.  Verification (exact Jaccard) runs only on candidate
  pairs.
- **simhash**: per-row signature + prefix-bucket blocking; hamming check via
  ``bit_count(a ^ b)`` inside the bucket join.
- **embedding near-dup**: hyperplane-LSH buckets (see
  :mod:`ocr_spark.similarity`) block the cosine check; brute force is the
  small-side fallback.

Every numeric primitive is the portable md5-based hash from
:mod:`ocr_spark.textstats`, so each operator has a replayable DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ocr_spark.textstats import norm_text, portable_hash, tokens, trunc4

DEFAULT_SHINGLE = 3
DEFAULT_MINHASH_K = 8  # permutations; banded 2-per-band → 4 bands


# --------------------------------------------------------------- primitives

def shingles(toks: Column, n: int = DEFAULT_SHINGLE) -> Column:
    """Distinct word n-grams of a token array (1-based element_at, matching
    the DuckDB 1-based `l[i]` oracle exactly).

    Guarded for < n tokens: Spark's ``sequence(1, 0)`` counts *down* to
    ``[1, 0]`` instead of returning empty, so short docs need the explicit
    empty-array branch."""
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    gram = lambda i: F.concat_ws(
        " ", *[F.element_at(toks, i + j) for j in range(n)]
    )
    return F.when(
        F.size(toks) < n, F.array().cast("array<string>")
    ).otherwise(F.array_distinct(F.transform(idx, gram)))


def shingle_hashes(toks: Column, n: int = DEFAULT_SHINGLE) -> Column:
    """Distinct 60-bit hashes of the shingle set.  All pairwise work
    (Jaccard intersects, band joins) runs on these instead of the shingle
    strings: bigint compares are ~2x faster and shuffle ~5x fewer bytes,
    and the md5-based hash keeps the DuckDB oracles replayable (collision
    probability over per-doc sets is negligible at 60 bits)."""
    return F.array_distinct(F.transform(shingles(toks, n), portable_hash))


def jaccard(a: Column, b: Column) -> Column:
    """|A∩B| / |A∪B| over distinct-element arrays, floor-truncated to 4
    decimals (see textstats.trunc4 for why not round)."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = (F.size(a) + F.size(b)).cast("double") - inter
    return F.when(union <= 0, F.lit(0.0)).otherwise(trunc4(inter / union))


def minhash_signature(sh_hashes: Column, k: int = DEFAULT_MINHASH_K) -> Column:
    """Array of k min-hashes over the hashed shingle set (each permutation
    re-hashes the 60-bit shingle hash salted with its index); empty set →
    hash of the sentinel '∅{j}' so empty docs still band deterministically."""
    sigs = [
        F.coalesce(
            F.array_min(
                F.transform(
                    sh_hashes,
                    lambda h: portable_hash(
                        F.concat(F.lit(f"{j}:"), h.cast("string"))
                    ),
                )
            ),
            portable_hash(F.lit(f"∅{j}")),
        ).alias(f"mh{j}")
        for j in range(k)
    ]
    return F.array(*sigs)


def simhash16(toks: Column) -> Column:
    """16-bit SimHash over distinct tokens (bigint in [0, 65535]).

    Classic bit-vote: each token hash votes +1/−1 per bit position; the
    signature sets bits with positive vote.  16 bits keeps the per-row
    expression tree small while preserving hamming-distance locality."""
    hashes = F.transform(F.array_distinct(toks), lambda t: portable_hash(t))
    sig = F.lit(0).cast("bigint")
    for b in range(16):
        mask = F.lit(1 << b).cast("bigint")
        vote = F.aggregate(
            hashes,
            F.lit(0).cast("bigint"),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(mask) > 0, F.lit(1)).otherwise(F.lit(-1)),
        )
        sig = sig + F.when(vote > 0, mask).otherwise(F.lit(0).cast("bigint"))
    return sig


# ---------------------------------------------------------------- operators

def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup on the normalized text digest.

    One shuffle (groupBy digest); output one row per *duplicated* digest
    with the canonical (min) id and the group size.
    """
    # NULL text (quarantined/empty docs) must not collapse into one bogus
    # "duplicate" group via the NULL digest; they are simply not dedupable.
    keyed = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        F.md5(norm_text(F.col(text_col))).alias("digest"),
    )
    return (
        keyed.groupBy("digest")
        .agg(
            F.min("id").alias("canonical_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .filter(F.col("n_docs") > 1)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_col: Column | None = None,
    n: int = DEFAULT_SHINGLE,
    threshold: float = 0.3,
) -> DataFrame:
    """Jaccard near-dup pairs inside cheap blocking buckets.

    ``bucket_col`` defaults to the 1-permutation MinHash bucket (minimum
    shingle hash): block sizes stay bounded at any corpus size and, unlike
    length bucketing, a near-identical pair can never straddle a boundary
    (a 31-token doc and its 33-token copy land in different length buckets
    and would silently never pair).  Recall per pair ≈ its Jaccard; the
    banded variant below is the high-recall path.  The self-join shuffles
    on the bucket key only.
    """
    toks = tokens(F.col(text_col))
    sh = shingle_hashes(toks, n)
    bucket = bucket_col if bucket_col is not None else F.coalesce(
        F.array_min(sh), F.lit(-1)
    )
    base = df.select(
        F.col(id_col).alias("id"),
        bucket.alias("bucket"),
        sh.alias("sh"),
        F.size(sh).alias("n_sh"),
    )
    left = base.alias("l")
    right = base.alias("r")
    pairs = left.join(right, on="bucket").filter(F.col("l.id") < F.col("r.id"))
    # Size-ratio prefilter: J(A,B) ≤ min(|A|,|B|)/max(|A|,|B|), so pairs
    # whose set sizes differ too much can never reach the threshold —
    # skip their O(|A|+|B|) intersect entirely.  Result-identical.
    ratio_ok = (
        F.least(F.col("l.n_sh"), F.col("r.n_sh")).cast("double")
        >= F.lit(threshold)
        * F.greatest(F.col("l.n_sh"), F.col("r.n_sh")).cast("double")
    )
    return (
        pairs.filter(ratio_ok)
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            jaccard(F.col("l.sh"), F.col("r.sh")).alias("jaccard_sim"),
        )
        .filter(F.col("jaccard_sim") >= threshold)
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_MINHASH_K,
    band_size: int = 2,
    verify_threshold: float = 0.3,
    shingle_n: int = DEFAULT_SHINGLE,
    persist_base: bool = True,
) -> DataFrame:
    """MinHash + LSH near-dup pairs, verified with exact Jaccard.

    shingle → k min-hashes → bands of ``band_size`` → explode to
    (band_idx, band_hash) → self-join on the band key → distinct candidate
    *id* pairs → join the shingle sets back → exact-Jaccard verify.

    Shape notes for scale: the band self-join and the distinct carry only
    ``(id, band)`` — never the shingle arrays (shuffling megabyte array
    columns through the explode+join was a 6× wall-clock regression at
    bench time).  Bands are hashes, so the join key space is uniform (no
    skew); the shingle arrays move over the wire exactly twice, keyed by the
    (small) candidate pair set.
    """
    toks = tokens(F.col(text_col))
    sh = shingle_hashes(toks, shingle_n)
    base = df.select(F.col(id_col).alias("id"), sh.alias("sh"))
    # The hashed-shingle base feeds banding AND both sides of the verify
    # join; persisting it avoids recomputing tokenize+shingle+hash three
    # times (spills to disk when it outgrows memory — it is the compressed
    # per-doc sketch, ~2 orders smaller than the corpus text).  Spark's
    # CacheManager holds the entry until unpersist, so repeated callers in
    # one long session should pass persist_base=False (or clearCache());
    # one-shot jobs keep the default.
    if persist_base:
        base = base.persist()
    sig_df = base.withColumn("sig", minhash_signature(F.col("sh"), k))

    n_bands = k // band_size
    sig = F.col("sig")
    bands = F.array(*[
        F.struct(
            F.lit(b).alias("band_idx"),
            F.md5(
                F.concat_ws(
                    ":",
                    *[sig[b * band_size + j].cast("string")
                      for j in range(band_size)],
                )
            ).alias("band_hash"),
        )
        for b in range(n_bands)
    ])
    banded = sig_df.select("id", F.explode(bands).alias("band")).select(
        "id", "band.band_idx", "band.band_hash"
    )

    cand = (
        banded.alias("l")
        .join(banded.alias("r"), on=["band_idx", "band_hash"])
        .filter(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    sh_a = base.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    sh_b = base.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    ratio_ok = (
        F.least(F.size("sh_a"), F.size("sh_b")).cast("double")
        >= F.lit(verify_threshold)
        * F.greatest(F.size("sh_a"), F.size("sh_b")).cast("double")
    )
    return (
        cand.join(sh_a, on="id_a")
        .join(sh_b, on="id_b")
        .filter(ratio_ok)  # J ≤ min/max sizes — result-identical prefilter
        .select(
            "id_a", "id_b",
            jaccard(F.col("sh_a"), F.col("sh_b")).alias("jaccard_sim"),
        )
        .filter(F.col("jaccard_sim") >= verify_threshold)
    )


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    prefix_bits: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs: block on the top ``prefix_bits`` of the
    signature, verify hamming distance inside the block.

    Note the usual SimHash caveat applies (pairs straddling a prefix-bucket
    boundary are missed); production sweeps rotate the prefix.  Kept single-
    sweep here because the oracle replays exactly this shape.
    """
    base = df.select(
        F.col(id_col).alias("id"),
        simhash16(tokens(F.col(text_col))).alias("sig"),
    )
    shift = 16 - prefix_bits
    base = base.withColumn(
        "bucket", F.shiftright(F.col("sig"), shift)
    )
    left = base.alias("l")
    right = base.alias("r")
    xor = F.expr("l.sig ^ r.sig")
    return (
        left.join(right, on="bucket")
        .filter(F.col("l.id") < F.col("r.id"))
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.bit_count(xor).cast("bigint").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
