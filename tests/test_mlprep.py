"""Round-3 ML-prep operators: Pareto frontier / strict prefix max,
snapshot-diff CDC, vocabulary encoding, bigram LM."""

from __future__ import annotations

import math

from pyspark.sql import Window, functions as F

from movie_recommendation_engine_spark.operators.relational import (
    global_cummax_strict,
    pareto_frontier_2d,
)
from movie_recommendation_engine_spark.operators.scd import snapshot_diff
from movie_recommendation_engine_spark.operators.text import (
    bigram_logprob,
    vocab_coverage,
)


def test_global_cummax_strict_matches_window(spark):
    """The distributed strict-prefix max must equal the semantic spec
    max() OVER (ORDER BY k DESC ROWS BETWEEN UNBOUNDED PRECEDING AND 1
    PRECEDING), across skewed partition boundaries."""
    rows = [(i, (i * 37) % 101) for i in range(500)]
    df = spark.createDataFrame(rows, "k int, v int").repartition(13)
    got = {
        r.k: r.m
        for r in global_cummax_strict(
            df, "k", "v", out_col="m", descending=True, num_partitions=5
        ).collect()
    }
    w = Window.orderBy(F.col("k").desc()).rowsBetween(Window.unboundedPreceding, -1)
    want = {r.k: r.m for r in df.withColumn("m", F.max("v").over(w)).collect()}
    assert got == want
    assert got[499] is None  # global first row has no strict prefix


def _brute_skyline(pts):
    out = []
    for p in pts:
        dominated = any(
            q[0] >= p[0] and q[1] >= p[1] and (q[0] > p[0] or q[1] > p[1])
            for q in pts
        )
        if not dominated:
            out.append(p)
    return sorted(out)


def test_pareto_frontier_matches_bruteforce(spark):
    """Staircase plan == O(n^2) dominance definition, on data with x
    ties, y ties, exact duplicate points, and anti-correlated runs."""
    pts = [((i * 17) % 23, (i * 29) % 19) for i in range(200)]
    pts += [(23, 0), (0, 19), (23, 0)]  # extremes + an exact duplicate pair
    df = spark.createDataFrame(pts, "x int, y int").repartition(7)
    got = sorted(
        (r.x, r.y) for r in pareto_frontier_2d(df, "x", "y", num_partitions=4).collect()
    )
    assert got == _brute_skyline(pts)


def test_pareto_duplicate_frontier_points_both_survive(spark):
    df = spark.createDataFrame([(5, 5), (5, 5), (1, 9)], "x int, y int")
    got = sorted((r.x, r.y) for r in pareto_frontier_2d(df, "x", "y").collect())
    assert got == [(1, 9), (5, 5), (5, 5)]


def test_snapshot_diff_classification(spark):
    old = spark.createDataFrame(
        [(1, "x", 10.0), (2, "y", None), (3, "z", 3.0), (4, "w", 4.0)],
        "k int, s string, v double",
    )
    new = spark.createDataFrame(
        [(2, "y", 5.0), (3, "z", 3.0), (5, "v", 1.0), (4, None, 4.0)],
        "k int, s string, v double",
    )
    got = {
        r.k: r.change_type
        for r in snapshot_diff(old, new, ["k"], ["s", "v"]).collect()
    }
    # NULL -> value and value -> NULL both count as updates (null-safe)
    assert got == {1: "D", 2: "U", 3: "N", 4: "U", 5: "I"}
    row4 = {
        r.k: r for r in snapshot_diff(old, new, ["k"], ["s", "v"]).collect()
    }[4]
    assert row4.old_s == "w" and row4.new_s is None


def test_vocab_coverage_hand_computed(spark):
    import hashlib

    docs = spark.createDataFrame(
        [(1, "b b a c"), (2, "a a b d")], "doc_id int, text string"
    )
    got = {r.doc_id: r for r in vocab_coverage(docs, "doc_id", "text", 2).collect()}
    # counts: a=3, b=3, c=1, d=1 -> vocab (n DESC, tok ASC): a->1, b->2
    assert got[1].n_tokens == 4 and got[1].n_oov == 1 and got[1].oov_rate == 0.25
    assert got[1].ids_fp == hashlib.md5(b"2,2,1,0").hexdigest()
    assert got[2].ids_fp == hashlib.md5(b"1,1,2,0").hexdigest()


def test_bigram_logprob_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a a"), (3, "solo")], "doc_id int, text string"
    )
    got = {r.doc_id: r for r in bigram_logprob(docs, "doc_id", "text", k=0.5).collect()}
    # vocab {a, b, solo} V=3; c(a,b)=2 c(b,a)=1 c(a,a)=1; c_a=3, c_b=1
    p_ab = (2 + 0.5) / (3 + 0.5 * 3)
    p_ba = (1 + 0.5) / (1 + 0.5 * 3)
    p_aa = (1 + 0.5) / (3 + 0.5 * 3)

    def micro(p):  # per-bigram integer micro-unit weight (model-table)
        return math.floor(math.log(p) * 1_000_000)

    def det6(x):  # functions.rounding.det_round mirror
        return math.floor(x * 1_000_000 + 0.5) / 1_000_000

    assert got[1].n_bigrams == 3
    assert got[1].avg_logprob == det6(
        (2 * micro(p_ab) + micro(p_ba)) / 3 / 1_000_000
    )
    assert got[2].avg_logprob == det6(micro(p_aa) / 1 / 1_000_000)
    assert 3 not in got  # single-token doc has no bigrams
