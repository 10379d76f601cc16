"""Deduplication operators for training-data pipelines.

Scale design notes (100 TB):
* exact dedup: hash-groupBy on a 64-bit fingerprint — one shuffle keyed
  by the hash, AQE coalesces; canonical row = min(doc_id).
* MinHash + LSH: shingle -> K minhashes -> B bands; candidate pairs come
  from a *band-bucket self-join* (shuffle on band hash, never a cross
  join).  Shingling and minhashing are native column expressions
  (transform/aggregate over split()), no Python UDFs.
* SimHash: 64-bit sign-sum of per-token hashes; near-dups are pairs
  within Hamming distance d, found via 4-segment pigeonhole bucketing.
* n-gram Jaccard: exact verify step for LSH candidates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import norm_text

# -- exact ---------------------------------------------------------------


def dedup_exact(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per distinct canonical text: canonical id + group size."""
    return (
        df.select(F.col(id_col), norm_text(text_col).alias("canon"))
        .groupBy("canon")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").alias("n_dups"),
        )
        .select("canonical_id", "n_dups")
    )


# -- shingles / jaccard ----------------------------------------------------


def char_ngrams(col: Column, n: int = 3) -> Column:
    """Distinct character n-grams of the canonical text (native exprs:
    sequence + transform + array_distinct — no Python)."""
    s = col
    length = F.length(s)
    idx = F.sequence(F.lit(1), F.greatest(length - (n - 1), F.lit(1)))
    grams = F.transform(idx, lambda i: F.substring(s, 1, 0x7FFFFFFF).substr(i, F.lit(n)))
    return F.array_distinct(grams)


def word_shingles(col: Column, k: int = 3) -> Column:
    words = F.split(F.trim(col), r"\s+")
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, k)))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact character-n-gram Jaccard over all candidate pairs.

    The full pairwise form (used for small partitions / verify stages);
    the scale path prefilters with LSH (minhash_lsh_candidates) first.
    """
    grams = df.select(
        F.col(id_col).alias("id"),
        F.explode(char_ngrams(norm_text(text_col), n)).alias("g"),
    ).distinct()
    sizes = grams.groupBy("id").agg(F.count("*").alias("sz"))
    inter = (
        grams.alias("a")
        .join(grams.alias("b"), (F.col("a.g") == F.col("b.g")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn("jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


# -- minhash + LSH ---------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def minhash_signature(grams: Column, num_hashes: int = 32, seed: int = 1) -> Column:
    """num_hashes minhash values via affine reshuffles of xxhash64."""
    sigs = []
    for i in range(num_hashes):
        a = (seed * 0x9E3779B1 + i * 0x85EBCA77) % _MERSENNE | 1
        b = (seed * 0xC2B2AE3D + i * 0x27D4EB2F) % _MERSENNE
        h = F.transform(
            grams,
            lambda g, a=a, b=b: F.pmod(
                F.xxhash64(g) * F.lit(a) + F.lit(b), F.lit(_MERSENNE)
            ),
        )
        sigs.append(F.array_min(h))
    return F.array(*sigs)


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs from banded minhash (id_a < id_b).

    One narrow map to signatures, one explode to (band, bucket), one
    shuffle on the bucket key for the self-join — the standard
    shuffle-bounded LSH plan.
    """
    rows_per_band = num_hashes // bands
    sig = df.select(
        F.col(id_col).alias("id"),
        minhash_signature(
            char_ngrams(norm_text(text_col), shingle_n), num_hashes
        ).alias("sig"),
    )
    banded = sig.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                                lambda v: v.cast("string"),
                            ),
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    return (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """LSH candidates verified with exact n-gram Jaccard."""
    cand = minhash_lsh_candidates(df, id_col, text_col, num_hashes, bands, shingle_n)
    grams = df.select(
        F.col(id_col).alias("id"),
        char_ngrams(norm_text(text_col), shingle_n).alias("grams"),
    )
    return (
        cand.join(grams.withColumnRenamed("id", "id_a").withColumnRenamed("grams", "ga"), "id_a")
        .join(grams.withColumnRenamed("id", "id_b").withColumnRenamed("grams", "gb"), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("ga", "gb"))
            / F.size(F.array_union("ga", "gb")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


# -- simhash -----------------------------------------------------------------


def simhash64(col: Column) -> Column:
    """64-bit SimHash over whitespace tokens, as native expressions:
    per-token xxhash64, per-bit sign sum, sign -> bit."""
    tokens = F.split(F.trim(col), r"\s+")
    hashes = F.transform(tokens, lambda t: F.xxhash64(t))
    bit_idx = F.sequence(F.lit(0), F.lit(63))
    bits = F.transform(
        bit_idx,
        lambda i: F.when(
            F.aggregate(
                hashes,
                F.lit(0),
                lambda acc, h: acc
                + F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(F.lit(-1)),
            )
            > 0,
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return F.aggregate(
        F.zip_with(bits, bit_idx, lambda b, i: F.shiftleft(b.cast("long"), i)),
        F.lit(0).cast("long"),
        lambda acc, v: acc.bitwiseOR(v),
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs within Hamming distance via 4-segment pigeonhole:
    any pair with distance <= 3 shares at least one exact 16-bit segment,
    so the join is bucketed, never a cross join."""
    sh = df.select(F.col(id_col).alias("id"), simhash64(norm_text(text_col)).alias("sh"))
    segs = sh.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seg"),
                        F.shiftright("sh", s * 16).bitwiseAND(F.lit(0xFFFF)).alias("key"),
                    )
                    for s in range(4)
                ]
            )
        ).alias("sk"),
    ).select("id", "sh", F.col("sk.seg").alias("seg"), F.col("sk.key").alias("key"))
    pairs = (
        segs.alias("a")
        .join(
            segs.alias("b"),
            (F.col("a.seg") == F.col("b.seg"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .distinct()
    )
    xor = F.col("sh_a").bitwiseXOR(F.col("sh_b"))
    return (
        pairs.withColumn("hamming", F.bit_count(xor))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
