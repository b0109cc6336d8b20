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
