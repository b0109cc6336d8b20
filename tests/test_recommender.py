"""ALS recommender wrapper (reference E2) — structural checks on a tiny
ratings fixture; numeric quality asserted loosely (ALS is iterative)."""

from __future__ import annotations

from pyspark.sql import functions as F

from movie_recommendation_engine_spark.plans.recommender import AlsRecommender


def _fit(ratings):
    return AlsRecommender(rank=4, max_iter=5, reg_param=0.1, seed=7).fit(ratings)


def test_fit_transform_rmse(spark, ratings):
    rec = _fit(ratings)
    preds = rec.transform(ratings)
    assert set(preds.columns) == {"userId", "movieId", "rating", "timestamp", "prediction"}
    val = rec.evaluate_rmse(ratings).collect()[0].rmse
    assert 0.0 <= val < 3.0  # fits its own training data reasonably


def test_recommend_shapes(spark, ratings):
    rec = _fit(ratings)
    flat = rec.recommend_top_k(k=3, flat=True)
    n_users = ratings.select("userId").distinct().count()
    assert flat.count() == 3 * n_users
    assert set(flat.columns) == {"userId", "movieId", "score", "rank"}
    # rank is 1..3 per user, scores non-increasing within user
    per = flat.groupBy("userId").agg(
        F.min("rank").alias("lo"), F.max("rank").alias("hi"), F.count("*").alias("n")
    )
    assert all(r.lo == 1 and r.hi == 3 and r.n == 3 for r in per.collect())

    nested = rec.recommend_top_k(k=3, flat=False)
    assert "recommendations" in nested.columns
    lists = rec.recommendation_lists(k=3)
    assert lists.schema["recs"].dataType.simpleString() == "array<int>"


def test_factors(spark, ratings):
    rec = _fit(ratings)
    uf = rec.user_factors()
    assert uf.count() == ratings.select("userId").distinct().count()
    assert len(uf.first().features) == 4


def test_recommend_for_user_subset(spark, ratings):
    rec = _fit(ratings)
    some = ratings.select("userId").distinct().limit(2)
    flat = rec.recommend_for_users(some, k=3)
    assert flat.count() == 3 * 2
    assert set(flat.columns) == {"userId", "movieId", "score", "rank"}
    # subset recs agree with the all-users recs for those users
    all_flat = rec.recommend_top_k(k=3, flat=True)
    uids = [r.userId for r in some.collect()]
    want = {
        (r.userId, r.movieId, r.rank)
        for r in all_flat.filter(F.col("userId").isin(uids)).collect()
    }
    got = {(r.userId, r.movieId, r.rank) for r in flat.collect()}
    assert got == want


def test_item_neighbors_shape_and_self_exclusion(spark, ratings):
    rec = _fit(ratings)
    probe = ratings.select("movieId").distinct().limit(3)
    nb = rec.item_neighbors(k=2, items=probe).collect()
    assert len(nb) == 3 * 2
    for r in nb:
        assert r.movieId != r.neighbor_movieId
        assert -1.0 - 1e-9 <= r.cosine <= 1.0 + 1e-9
