"""Bloom-filter semi-join reduction: exactness, pruning, degenerate cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from movie_recommendation_engine_spark.operators.bloom import (
    bloom_might_contain,
    bloom_semi_join,
    build_bloom,
    expected_fpr,
)


def _tables(spark):
    large = spark.createDataFrame(
        [(i, f"v{i}") for i in range(1000)], "k long, payload string"
    )
    small = spark.createDataFrame([(i * 100,) for i in range(5)], "j long")
    return large, small


def test_bloom_no_false_negatives_and_exactness(spark):
    large, small = _tables(spark)
    want = sorted(
        r.k
        for r in large.join(
            small.select(F.col("j").alias("k")), "k", "left_semi"
        ).collect()
    )
    got = sorted(r.k for r in bloom_semi_join(large, small, "k", "j").collect())
    assert got == want == [0, 100, 200, 300, 400]


def test_bloom_pass_is_superset_and_prunes(spark):
    large, small = _tables(spark)
    loose = bloom_semi_join(large, small, "k", "j", exact=False)
    n_loose = loose.count()
    # no false negatives ...
    assert n_loose >= 5
    # ... and a well-sized bloom prunes nearly everything that can't match
    assert n_loose <= 5 + 20, f"bloom passed {n_loose} of 1000 rows"


def test_tiny_bloom_still_exact(spark):
    """With 64 bits the filter saturates (false positives everywhere) —
    the trailing semi join must still deliver the exact answer."""
    large, small = _tables(spark)
    got = sorted(
        r.k
        for r in bloom_semi_join(
            large, small, "k", "j", num_bits=64, num_hashes=2
        ).collect()
    )
    assert got == [0, 100, 200, 300, 400]
    assert expected_fpr(5, 64, 2) > 0.01


def test_empty_build_side_filters_all(spark):
    large, small = _tables(spark)
    empty = small.filter(F.lit(False))
    bm = build_bloom(empty, "j", num_bits=1 << 10)
    assert all(w == 0 for w in bm)
    assert large.filter(bloom_might_contain(bm, "k")).count() == 0


def test_non_word_multiple_num_bits_stays_exact(spark):
    """Build/probe modulus parity (round-5 review): num_bits not a
    multiple of 64 is rounded UP at build so the probe's
    len(bitmap)*64 derivation equals the build modulus — a mismatch
    turned false positives into FALSE NEGATIVES (silently dropped
    matching rows, even with exact=True)."""
    large, small = _tables(spark)
    want = sorted(
        r.k
        for r in large.join(
            small.select(F.col("j").alias("k")), "k", "left_semi"
        ).collect()
    )
    for bits in (1000, 65, 127):  # all non-multiples of 64
        got = sorted(
            r.k for r in bloom_semi_join(large, small, "k", "j", num_bits=bits).collect()
        )
        assert got == want, f"num_bits={bits} lost rows"
