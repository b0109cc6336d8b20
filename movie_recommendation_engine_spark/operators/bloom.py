"""Bloom-filter semi-join reduction.

The pattern Spark's own runtime row-level filtering (InjectRuntimeFilter)
applies under AQE, exposed as an explicit operator: aggregate the small
side's join keys into a compact bit array, inject it into the plan as a
literal, and pre-filter the large side *before* its shuffle.  At 100 TB
the win is shuffle volume: a semi join must still exchange every probe
row, but a bloom with ~1% false positives drops ~99% of non-matching
rows at the scan, so only matches (plus a sliver of false positives)
ever hit the wire.  The final exact semi join over the survivors makes
the result identical to the plain semi join — the bloom only prunes.

Build cost and driver traffic are bounded by the bitmap, not the data:
the distributed build OR-folds bit positions into 64-bit words map-side
and ships at most ``num_bits/64`` (word_idx, word) rows to the driver —
32 KB for the default 2^18 bits, the same order as any broadcast-join
build.  Hashing is seeded xxhash64 — deterministic and
partitioning-independent, and (unlike the md5 family the sampling
operators use for DuckDB parity) fully inside whole-stage codegen; the
bloom needs no cross-engine reproducibility because the bitmap never
leaves the plan and the trailing semi join restores exactness.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

def _positions(key: Column | str, num_bits: int, num_hashes: int, salt: str) -> list[Column]:
    """k bit positions per key from seeded xxhash64.

    Unlike the engine's sampling/split operators, the bloom does NOT
    need the cross-engine md5 family: the bitmap never leaves the plan
    and the trailing semi join restores exactness, so the only
    requirements are determinism, partition-independence, and build/
    probe self-consistency.  xxhash64 runs in whole-stage codegen at a
    fraction of md5's per-row cost (measured ~4 s -> ~0.5 s for the
    probe pass over sf0.1 lineitem)."""
    key = F.col(key) if isinstance(key, str) else key
    return [
        F.pmod(F.xxhash64(F.lit(salt), key, F.lit(i)), F.lit(num_bits))
        for i in range(num_hashes)
    ]


def build_bloom(
    small: DataFrame,
    key_col: str,
    num_bits: int = 1 << 18,
    num_hashes: int = 5,
    salt: str = "bf",
) -> list[int]:
    """Distributed bloom build: k bit positions per key, OR-folded into
    64-bit words by a partial-aggregating groupBy; only populated words
    reach the driver.  Returns the bitmap as a list of longs.

    ``num_bits`` is rounded UP to a multiple of 64: the probe side
    (``bloom_might_contain``) can only recover the modulus as
    ``len(bitmap) * 64``, and a build/probe modulus mismatch turns the
    filter's false positives into FALSE NEGATIVES — rows silently
    dropped before the exact semi join (round-5 review finding)."""
    num_bits = ((num_bits + 63) // 64) * 64
    pos = F.explode(F.array(*_positions(key_col, num_bits, num_hashes, salt))).alias(
        "pos"
    )
    words = (
        small.select(pos)
        .select(
            (F.col("pos") / 64).cast("int").alias("word_idx"),
            (F.col("pos") % 64).cast("int").alias("bit"),
        )
        .select("word_idx", F.expr("shiftleft(CAST(1 AS BIGINT), bit)").alias("bitval"))
        .groupBy("word_idx")
        .agg(F.expr("bit_or(bitval)").alias("word"))
        .collect()
    )
    bitmap = [0] * ((num_bits + 63) // 64)
    for r in words:
        bitmap[r.word_idx] = r.word
    return bitmap


def bloom_might_contain(
    bitmap: list[int],
    key: Column | str,
    num_hashes: int = 5,
    salt: str = "bf",
) -> Column:
    """Membership-test column: true iff all k hashed bits are set.  The
    bitmap enters the plan as an array literal (shipped to executors
    with the serialized plan — no extra job, no Python workers)."""
    num_bits = len(bitmap) * 64
    # one true array LITERAL: F.array(4096 x F.lit) builds a CreateArray
    # expression evaluated per row (measured 3.5x slower at sf0.1);
    # F.lit(list) folds to a single constant.  The long cast keeps small
    # words from becoming 32-bit ints getbit would reject positions on.
    arr = F.lit([int(w) for w in bitmap]).cast("array<long>")
    cond = None
    for p in _positions(key, num_bits, num_hashes, salt):
        word = F.element_at(arr, (p / 64).cast("int") + 1)
        hit = F.getbit(word, (p % 64).cast("int")) == 1
        cond = hit if cond is None else cond & hit
    return cond


def bloom_semi_join(
    large: DataFrame,
    small: DataFrame,
    large_key: str,
    small_key: str,
    num_bits: int = 1 << 18,
    num_hashes: int = 5,
    exact: bool = True,
) -> DataFrame:
    """Rows of ``large`` whose key appears in ``small``: a left-semi
    join with a bloom pre-filter on the probe side.

    With ``exact=True`` (default) survivors still pass a real semi join,
    so the output is exactly the plain semi join — the bloom only cuts
    what the shuffle has to carry.  ``exact=False`` keeps just the bloom
    pass (false positives possible, no shuffle at all — for pipelines
    that tolerate ``expected_fpr`` slack).
    """
    bitmap = build_bloom(small, small_key, num_bits, num_hashes)
    pruned = large.filter(bloom_might_contain(bitmap, large_key, num_hashes))
    if not exact:
        return pruned
    return pruned.join(
        small.select(F.col(small_key).alias(large_key)).distinct(),
        large_key,
        "left_semi",
    )


def expected_fpr(n_keys: int, num_bits: int, num_hashes: int) -> float:
    """Textbook bloom false-positive rate (1 - e^{-kn/m})^k."""
    return (1.0 - math.exp(-num_hashes * n_keys / num_bits)) ** num_hashes
