"""M9 Spark-first extension harness (reference extension.py:34-181):
binary interactions, split disjointness, implicit-ALS WARP stand-in,
per-split precision@k with LightFM's full-catalog ranking semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from movie_recommendation_engine_spark.plans.extension import (
    assert_split_disjoint,
    binary_interactions,
    fit_warp_style_ranker,
    precision_at_k_by_split,
    warp_style_comparison,
)

# Two taste blocks: users 1-3 like items 10-13, users 4-6 like items
# 20-23.  One item per user held out into val/test; block structure is
# strong enough that implicit ALS ranks the held-out item highly.
_BLOCK_A = [(u, i) for u in (1, 2, 3) for i in (10, 11, 12, 13)]
_BLOCK_B = [(u, i) for u in (4, 5, 6) for i in (20, 21, 22, 23)]


def _splits(spark):
    all_pairs = _BLOCK_A + _BLOCK_B
    held_val = {(1, 13), (4, 23)}
    held_test = {(2, 13), (5, 23)}
    mk = lambda pairs: spark.createDataFrame(
        [(u, i, 4.0) for u, i in pairs], "userId int, movieId int, rating float"
    )
    train = mk([p for p in all_pairs if p not in held_val | held_test])
    return {"train": train, "val": mk(sorted(held_val)), "test": mk(sorted(held_test))}


def test_binary_interactions_collapses_duplicates_and_drops_rating(spark):
    df = spark.createDataFrame(
        [(1, 10, 5.0), (1, 10, 1.0), (2, 11, 3.0)],
        "userId int, movieId int, rating float",
    )
    out = binary_interactions(df)
    assert out.columns == ["userId", "movieId", "weight"]
    rows = sorted(tuple(r) for r in out.collect())
    assert rows == [(1, 10, 1.0), (2, 11, 1.0)]


def test_assert_split_disjoint_raises_on_overlap(spark):
    s = _splits(spark)
    assert_split_disjoint(s, ["userId", "movieId"])  # clean splits pass
    s["val"] = s["val"].unionByName(s["train"].limit(1))
    with pytest.raises(AssertionError, match="share 1 interactions"):
        assert_split_disjoint(s, ["userId", "movieId"])


def test_warp_style_comparison_contract(spark):
    s = _splits(spark)
    out = warp_style_comparison(
        s, k=4, rank=4, max_iter=5, alpha=10.0, seed=7
    ).collect()
    by_split = {r["split"]: r for r in out}
    # one row per split, dict order preserved
    assert [r["split"] for r in out] == ["train", "val", "test"]
    for r in out:
        assert 0.0 <= r["precision_at_k"] <= 1.0
        assert 0.0 <= r["map_at_k"] <= 1.0
    # every user has train positives -> all 6 evaluated on train
    assert by_split["train"]["n_users"] == 6
    # val/test hold one user-item each from 2 users
    assert by_split["val"]["n_users"] == 2
    assert by_split["test"]["n_users"] == 2
    # block structure: train positives dominate the full-catalog top-4
    assert by_split["train"]["precision_at_k"] >= 0.5


def test_full_catalog_ranking_does_not_exclude_train_positives(spark):
    """LightFM parity (reference never passes train_interactions):
    a user's top-k may — and with k = catalog size, must — contain
    their own train items."""
    s = _splits(spark)
    ranker = fit_warp_style_ranker(s["train"], rank=4, max_iter=5, seed=7)
    recs = ranker.recommendation_lists(8)
    train_hits = (
        recs.join(
            s["train"].groupBy("userId").agg(F.collect_set("movieId").alias("seen")),
            "userId",
        )
        .select(F.size(F.array_intersect("recs", "seen")).alias("n"))
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert train_hits > 0


def test_cold_user_scored_zero_not_dropped(spark):
    """LightFM parity: a split user absent from train has no ALS factors
    (recommendForAllUsers omits them) but MUST still be averaged into
    precision@k — as a zero, via the truth-side left join — or the
    cross-engine mean is inflated and n_users undercounted."""
    s = _splits(spark)
    cold = spark.createDataFrame(
        [(7, 10, 4.0)], "userId int, movieId int, rating float"
    )
    s["val"] = s["val"].unionByName(cold)
    out = warp_style_comparison(s, k=4, rank=4, max_iter=5, alpha=10.0, seed=7)
    by_split = {r["split"]: r for r in out.collect()}
    assert by_split["val"]["n_users"] == 3  # 2 warm + 1 cold, not 2
    # the cold user contributes 0 hits: mean precision <= warm-only mean
    warm = warp_style_comparison(
        _splits(spark), k=4, rank=4, max_iter=5, alpha=10.0, seed=7
    )
    warm_val = {r["split"]: r for r in warm.collect()}["val"]
    assert by_split["val"]["precision_at_k"] <= warm_val["precision_at_k"]


def test_precision_at_k_by_split_requires_splits(spark):
    s = _splits(spark)
    ranker = fit_warp_style_ranker(s["train"], rank=2, max_iter=2, seed=7)
    with pytest.raises(AssertionError, match="no splits"):
        precision_at_k_by_split(ranker, {})
