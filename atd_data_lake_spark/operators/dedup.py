"""Deduplication operators for large-scale training-data pipelines.

Beyond-reference extensions (BASELINE.json north star): exact dedup,
MinHash+LSH near-dup, SimHash, and n-gram Jaccard — all expressed so the
expensive candidate generation is a hash-bucket equi-join (shuffle on the
bucket key), never an all-pairs cross join.  At 100 TB the all-pairs
comparison is infeasible; LSH banding bounds candidate pairs to
near-duplicates with high probability.

All hashing is deterministic (xxhash64/crc32 with fixed salts), so the
operators are reproducible across runs and cluster layouts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Group by content hash; keep the minimum id as canonical.

    One shuffle on md5(text).  Output: (content_hash, canonical_id, n_dups).
    """
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").alias("n_dups"),
        )
    )


# ---------------------------------------------------------------------------
# Tokenization / shingling helpers (pure column expressions)
# ---------------------------------------------------------------------------


def tokens(text: Column) -> Column:
    """Whitespace tokens of trimmed text (empty string → empty array)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array<string>."""
    toks = tokens(text)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
    )
    return F.array_distinct(
        F.when(F.size(toks) >= n, grams).otherwise(F.array().cast("array<string>"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Near-dup candidate pairs via banded MinHash LSH.

    shingle → explode → per-doc min of xxhash64(shingle, seed=i) for each
    of ``num_hashes`` seeds (plain min aggregates over exploded rows: one
    shuffle on doc id, whole-stage-codegen friendly — NOT nested array
    expressions, which re-hash the shingle array per seed and fall out of
    codegen) → band buckets → bucket equi-join.  Docs sharing any band
    bucket become a candidate pair; no cross join at any scale.

    Output: (id_a, id_b, n_shared_bands) with id_a < id_b.
    """
    rows_per_band = num_hashes // bands
    sh = df.select(
        F.col(id_col).alias("_id"),
        F.explode(word_shingles(F.col(text_col), shingle_n)).alias("_shingle"),
    ).select("_id", F.xxhash64("_shingle").alias("_base"))
    # hash family: h_i = xxhash64(base, i) — hashes the cheap 64-bit base
    # long (one string hash per shingle total), stays JVM-side, and is safe
    # under ANSI mode (no overflowing long arithmetic)
    sig = sh.groupBy("_id").agg(
        *[
            F.min(F.xxhash64(F.col("_base"), F.lit(i))).alias(f"_h{i}")
            for i in range(num_hashes)
        ]
    )
    banded = sig.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.col(f"_h{b * rows_per_band + r}") for r in range(rows_per_band)]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("_id", "bb.band", "bb.bucket")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .groupBy(
            F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b")
        )
        .agg(F.count("*").alias("n_shared_bands"))
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(text: Column) -> Column:
    """64-bit SimHash over whitespace tokens.

    Per token: h = xxhash64(token); each of the 64 bit positions votes
    +1/-1; the sign of the vote sum sets the output bit.  Expressed with
    aggregate() over the token array — stays JVM-side, no UDF.
    """
    toks = tokens(text)
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    # votes[i] = sum over tokens of (bit i set ? 1 : -1)
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda i: F.when(
                    F.call_function("shiftright", h, i).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1).cast("long"),
            ),
            lambda a, v: a + v,
        ),
    )
    return F.aggregate(
        F.zip_with(
            votes,
            F.sequence(F.lit(0), F.lit(63)),
            lambda v, i: F.when(
                v > 0, F.call_function("shiftleft", F.lit(1).cast("long"), i)
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseXOR(x),
    )


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    block_bits: int = 16,
) -> DataFrame:
    """Near-dup pairs with SimHash Hamming distance ≤ max_hamming.

    Candidate generation blocks on 16-bit chunks of the simhash (pigeonhole:
    distance ≤ 3 ⇒ at least one of 4 chunks equal), so the join is an
    equi-join on (chunk_idx, chunk_value) — no cross join at scale.
    Output: (id_a, id_b, hamming).
    """
    n_blocks = 64 // block_bits
    sh = df.select(F.col(id_col).alias("_id"), simhash64(F.col(text_col)).alias("_sh"))
    mask = (1 << block_bits) - 1
    blocked = sh.select(
        "_id",
        "_sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftright("_sh", i * block_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("val"),
                    )
                    for i in range(n_blocks)
                ]
            )
        ).alias("b"),
    ).select("_id", "_sh", "b.blk", "b.val")
    a, b = blocked.alias("a"), blocked.alias("b")
    hamming = F.bit_count(F.col("a._sh").bitwiseXOR(F.col("b._sh")))
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, via inverted-index join)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact Jaccard over word n-gram shingle *sets*, computed by an
    inverted-index self-join (shuffle on shingle, then on the pair) —
    |A∩B| from the join, |A∪B| = |A|+|B|−|A∩B|.  No cross join.

    Output: (id_a, id_b, jaccard) for pairs ≥ threshold, jaccard rounded
    to 6 places.
    """
    sh = df.select(
        F.col(id_col).alias("_id"),
        F.explode(word_shingles(F.col(text_col), n)).alias("shingle"),
    )
    sizes = sh.groupBy("_id").agg(F.count("*").alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("_id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("_id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
