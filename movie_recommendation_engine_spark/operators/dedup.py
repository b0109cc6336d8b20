"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup (prompt §"Deduplication").

Scale design notes (the part that matters at 100 TB):

- **exact**: hash-groupBy on a content fingerprint — one shuffle keyed
  by md5(normalized text); canonical row = min id per group.  Never
  ``dropDuplicates`` on the raw text column (shuffles full documents);
  shuffle the 32-byte digest instead.
- **n-gram Jaccard**: inverted-index join (doc exploded to distinct
  shingles, self-joined on shingle) — linear in the number of co-shingle
  pairs, not quadratic in docs.  ``max_df`` drops ubiquitous shingles,
  which at scale is the difference between a join and a cross product
  (a shingle appearing in 1M docs contributes 10^12 pairs).
- **MinHash LSH**: the signature is computed per row with higher-order
  functions (no explode, no shuffle); only the ``n_bands`` short band
  keys are exploded for the bucket join.  Candidates are then verified
  with exact Jaccard on the full shingle sets.
- **SimHash**: 32-bit fingerprint per doc via one explode + 32 partial
  aggregates; near-dup = Hamming distance <= k on a self-join of the
  (tiny) fingerprint table.
- **embedding cosine**: see operators.similarity — near-dup is
  ``similar_pairs`` with a threshold.

All hashing uses the engine's md5 construction, so every operator here
is bit-reproducible in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..functions.hashing import md5_long
from .text import exact_fingerprint, word_shingles


def exact_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    keep: str = "min",
) -> DataFrame:
    """One canonical row per distinct normalized text.

    Returns (id_col, fingerprint, n_copies) — the kept id (min/max) and
    how many rows collapsed into it.
    """
    agg_id = F.min(id_col) if keep == "min" else F.max(id_col)
    return (
        df.select(F.col(id_col), exact_fingerprint(text_col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(agg_id.alias(id_col), F.count("*").alias("n_copies"))
        .select(id_col, "fingerprint", "n_copies")
    )


def _shingled(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    return df.select(id_col, word_shingles(text_col, n=n).alias("shingles"))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """All document pairs (a < b) with word-n-gram Jaccard >= threshold.

    Inverted-index self-join; ``max_df`` (scale guard) removes shingles
    occurring in more than max_df docs from *candidate generation* —
    verification still uses full shingle sets, so max_df only affects
    recall of pairs whose every shared shingle is ubiquitous.
    Output: (id_a, id_b, jaccard).
    """
    sh = _shingled(df, id_col, text_col, n).cache()
    # cache the inverted index: the self-join consumes it twice
    ex = sh.select(F.col(id_col).alias("id"), F.explode("shingles").alias("g")).cache()
    if max_df is not None:
        # candidate generation only: drop ubiquitous shingles so the
        # inverted-index join stays near-linear; verification below still
        # scores full shingle sets, so max_df only costs recall for pairs
        # whose every shared shingle is ubiquitous
        rare = ex.groupBy("g").agg(F.count("*").alias("df")).filter(F.col("df") <= max_df)
        ex = ex.join(rare.select("g"), "g")
        cand = (
            ex.alias("a")
            .join(ex.alias("b"), (F.col("a.g") == F.col("b.g")) & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .distinct()
        )
        sa = sh.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
        sb = sh.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
        inter = F.size(F.array_intersect("sh_a", "sh_b"))
        union = F.size("sh_a") + F.size("sh_b") - inter
        return (
            cand.join(sa, "id_a")
            .join(sb, "id_b")
            .withColumn("jaccard", F.round(inter / union, 6))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard")
        )
    shared = (
        ex.alias("a")
        .join(ex.alias("b"), (F.col("a.g") == F.col("b.g")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("shared"))
    )
    sizes = sh.select(F.col(id_col).alias("id"), F.size("shingles").alias("sz"))
    out = (
        shared.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("shared") / (F.col("sz_a") + F.col("sz_b") - F.col("shared")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def minhash_signature(shingles: Column, n_hashes: int = 16, salt: str = "mh") -> Column:
    """MinHash signature as array<bigint>, computed per row with
    higher-order functions — no explode, no shuffle, no UDF."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_hashes - 1)),
        lambda s: F.array_min(
            F.transform(shingles, lambda g: md5_long(F.concat_ws("\x01", F.lit(salt), s, g)))
        ),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    n_hashes: int = 16,
    band_size: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash + banded LSH near-dup pairs, verified with exact Jaccard.

    n_hashes/band_size bands; docs sharing any band bucket become
    candidates; candidates are verified on their full shingle sets.
    Output: (id_a, id_b, jaccard) with jaccard >= threshold.
    """
    assert n_hashes % band_size == 0
    n_bands = n_hashes // band_size
    sh = _shingled(df, id_col, text_col, n).cache()
    sig = sh.withColumn("sig", minhash_signature(F.col("shingles"), n_hashes))
    # band key: md5 over (band index, its slice of the signature)
    bands = sig.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda b: F.md5(
                    F.concat_ws(
                        "\x01",
                        b,
                        F.concat_ws(
                            "\x01",
                            F.transform(
                                F.slice(F.col("sig"), b * band_size + 1, band_size),
                                lambda m: m.cast("string"),
                            ),
                        ),
                    )
                ),
            )
        ).alias("band"),
    ).cache()  # self-join below would recompute the signatures twice
    cand = (
        bands.alias("a")
        .join(bands.alias("b"), (F.col("a.band") == F.col("b.band")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sa = sh.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash_fingerprint(
    df: DataFrame, id_col: str, text_col: str, n: int = 2, bits: int = 32, salt: str = "sh"
) -> DataFrame:
    """32-bit SimHash per document: sign of the per-bit vote over shingle
    hashes.  One explode + `bits` conditional sums; integer arithmetic
    only, so it is bit-identical across engines."""
    ex = _shingled(df, id_col, text_col, n).select(
        F.col(id_col).alias("id"), F.explode("shingles").alias("g")
    )
    h = md5_long(F.concat_ws("\x01", F.lit(salt), F.col("g")))
    votes = ex.groupBy("id").agg(
        *[
            F.sum(F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(
                f"b{j}"
            )
            for j in range(bits)
        ]
    )
    fp = None
    for j in range(bits):
        term = F.when(F.col(f"b{j}") > 0, F.lit(2**j).cast("long")).otherwise(F.lit(0).cast("long"))
        fp = term if fp is None else fp + term
    return votes.select(F.col("id").alias(id_col), fp.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    max_hamming: int = 6,
) -> DataFrame:
    """Document pairs whose SimHash fingerprints are within max_hamming
    bits.  The self-join runs on the compact fingerprint table; at scale,
    pre-bucket by fingerprint bytes (pigeonhole) before joining.
    Output: (id_a, id_b, hamming)."""
    fp = simhash_fingerprint(df, id_col, text_col, n=n)
    a = fp.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("fp_a"))
    b = fp.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("fp_b"))
    ham = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
