"""Ranking/regression metrics vs hand-computed fixtures (SURVEY §5:
'metric parity tests ... on 3-user fixtures')."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from movie_recommendation_engine_spark.plans.metrics import (
    global_hit_ratio,
    per_user_ranking_metrics,
    rmse,
    summarize_ranking,
)


@pytest.fixture(scope="module")
def recs_truth(spark):
    recs = spark.createDataFrame(
        [(1, [1, 2, 3, 4]), (2, [1, 2]), (3, [7, 8, 9])],
        "userId int, recs array<int>",
    )
    truth = spark.createDataFrame(
        [(1, [2, 4]), (2, [5]), (3, [7])],
        "userId int, truth array<int>",
    )
    return recs, truth


def test_per_user_metrics_hand_computed(spark, recs_truth):
    recs, truth = recs_truth
    rows = {
        r.userId: r
        for r in per_user_ranking_metrics(recs, truth, k=4, round_to=None).collect()
    }
    # user 1: hits at ranks 2 and 4 -> AP = (1/2 + 2/4)/min(4,2) = 0.5
    assert abs(rows[1].ap - 0.5) < 1e-12
    assert abs(rows[1].precision - 0.5) < 1e-12  # 2 hits / k=4
    assert abs(rows[1].recall - 1.0) < 1e-12
    assert rows[1].hit == 1.0
    # ref formula: (1+1/2)/4/2 + (1+1/4)/4/2 = 0.34375
    assert abs(rows[1].ref_ap - 0.34375) < 1e-12
    # user 2: no hits
    assert rows[2].ap == 0.0 and rows[2].hit == 0.0 and rows[2].ref_ap == 0.0
    # user 3: hit at rank 1 -> AP = 1/min(4,1) = 1
    assert abs(rows[3].ap - 1.0) < 1e-12


def test_summarize(spark, recs_truth):
    recs, truth = recs_truth
    s = summarize_ranking(per_user_ranking_metrics(recs, truth, k=4)).collect()[0]
    assert s.n_users == 3
    assert abs(s.map_at_k - round((0.5 + 0.0 + 1.0) / 3, 6)) < 1e-9
    assert abs(s.hit_rate - round(2 / 3, 6)) < 1e-9


def test_global_hit_ratio(spark):
    interactions = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (2, 99)], "userId int, movieId int"
    )
    recs_list = spark.createDataFrame([([10, 11],)], "recs array<int>")
    out = global_hit_ratio(interactions, recs_list).collect()[0]
    assert out.n_rows == 4 and abs(out.hit_ratio - 0.75) < 1e-9


def test_rmse(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0), (3.0, 3.0), (5.0, 4.0)], "rating double, prediction double"
    )
    got = rmse(df).collect()[0].rmse
    # errors 1,0,1 -> rmse = sqrt(2/3)
    assert abs(got - (2 / 3) ** 0.5) < 1e-12


def test_ndcg_hand_computed(spark, recs_truth):
    """User 1: hits at positions 2 and 4 of 4 recs, |truth|=2 ->
    DCG = 1/log2(3) + 1/log2(5); IDCG = 1/log2(2) + 1/log2(3).
    User 2: no hits -> 0.  User 3: hit at position 1, |truth|=1 -> 1."""
    import math

    recs, truth = recs_truth
    out = {r.userId: r.ndcg for r in per_user_ranking_metrics(recs, truth, k=4).collect()}
    dcg1 = 1 / math.log2(3) + 1 / math.log2(5)
    idcg1 = 1 / math.log2(2) + 1 / math.log2(3)
    assert abs(out[1] - round(dcg1 / idcg1, 6)) < 1e-6
    assert out[2] == 0.0
    assert out[3] == 1.0


def test_mrr_hand_computed(spark, recs_truth):
    """User 1: first hit at position 2 -> 0.5; user 2: no hit -> 0;
    user 3: first hit at position 1 -> 1."""
    recs, truth = recs_truth
    out = {r.userId: r.rr for r in per_user_ranking_metrics(recs, truth, k=4).collect()}
    assert out == {1: 0.5, 2: 0.0, 3: 1.0}


def test_empty_recs_scores_zero_never_raises(spark):
    """Cold-user serving shape (round-5 review): an EMPTY recs array
    must score 0 across every metric, not crash — sequence(1, 0)
    auto-descends to [1, 0] and element_at(recs, 1) on an empty array
    is an ANSI INVALID_ARRAY_INDEX abort; the bug stayed latent because
    column pruning usually drops the crashing ndcg/rr columns."""
    recs = spark.createDataFrame(
        [(1, []), (2, [5, 9])], "userId int, recs array<int>"
    )
    truth = spark.createDataFrame(
        [(1, [5, 6]), (2, [5])], "userId int, truth array<int>"
    )
    out = {
        r.userId: r
        for r in per_user_ranking_metrics(recs, truth, k=3).collect()
    }
    cold = out[1]
    assert (cold.ap, cold.precision, cold.recall, cold.hit) == (0.0, 0.0, 0.0, 0.0)
    assert (cold.ndcg, cold.rr, cold.ref_ap) == (0.0, 0.0, 0.0)
    warm = out[2]
    assert warm.hit == 1.0 and warm.rr == 1.0  # untouched by the guard


def test_empty_truth_yields_null_metrics_never_raises(spark):
    """Degenerate no-relevants truth: NULL ratio metrics (try_divide),
    zero hit/rr — never an ANSI divide-by-zero abort."""
    recs = spark.createDataFrame([(1, [5])], "userId int, recs array<int>")
    truth = spark.createDataFrame([(1, [])], "userId int, truth array<int>")
    [r] = per_user_ranking_metrics(recs, truth, k=3).collect()
    assert r.ap is None and r.recall is None and r.ndcg is None and r.ref_ap is None
    assert (r.precision, r.hit, r.rr) == (0.0, 0.0, 0.0)
