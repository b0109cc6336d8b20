"""Skew operators equal their unsalted formulations; ALS CV grid tuning
(reference als.py:53-84, M5-M6) returns best params via public getters."""

from __future__ import annotations

from pyspark.sql import functions as F

from movie_recommendation_engine_spark.operators.skew import (
    salted_agg,
    salted_broadcast_join,
)
from movie_recommendation_engine_spark.plans.recommender import AlsRecommender


def test_salted_agg_equals_plain(spark, ratings):
    got = salted_agg(
        ratings,
        key_cols=["movieId"],
        salt_cols=["userId", "movieId"],
        aggs={"n": ("rating", "count"), "s": ("rating", "sum"), "mx": ("rating", "max")},
        n_salts=4,
    )
    want = ratings.groupBy("movieId").agg(
        F.count("rating").alias("n"), F.sum("rating").alias("s"), F.max("rating").alias("mx")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_salted_join_equals_plain(spark, ratings):
    dim = ratings.select("movieId").distinct().withColumn(
        "flag", (F.col("movieId") % 2 == 0).cast("int")
    )
    got = salted_broadcast_join(ratings, dim, ["movieId"], n_salts=4)
    want = ratings.join(dim, ["movieId"])
    key = lambda rows: sorted(tuple(r) for r in rows)
    assert key(got.select(*want.columns).collect()) == key(want.collect())


def test_als_cv_tuning_small_grid(spark, ratings):
    rec = AlsRecommender(rank=2, max_iter=2, reg_param=0.1, seed=7)
    result = rec.tune(ratings, ranks=[2, 4], reg_params=[0.1], num_folds=2)
    assert result["rank"] in (2, 4)
    assert len(result["avg_metrics"]) == 2  # one per grid point
    assert rec.model is not None  # best model installed
    # the tuned model is usable downstream
    assert rec.recommend_top_k(k=2).count() > 0
