"""End-to-end MovieLens pipeline (the reference-user migration path) and
CSV source round-trips (SURVEY §2.1)."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from movie_recommendation_engine_spark.operators.relational import is_disjoint
from movie_recommendation_engine_spark.functions.arrays import split_genres, title_year
from movie_recommendation_engine_spark.plans.movielens import MovieLensPipeline
from movie_recommendation_engine_spark.sources.readers import read_ratings_csv
from movie_recommendation_engine_spark.sources.writers import write_csv


def test_pipeline_end_to_end(spark, ratings):
    p = MovieLensPipeline(ratings)
    labeled = p.split()
    # disjoint & exhaustive
    assert labeled.count() == ratings.count()
    val = labeled.filter("split = 'validation'").drop("split")
    tr = labeled.filter("split = 'train'").drop("split")
    assert is_disjoint(val, tr, ["userId", "movieId"])

    pop = p.popularity_top_k(5)
    assert pop.count() <= 5 and "score" in pop.columns

    p.fit_als(rank=4, max_iter=3, reg_param=0.1, seed=7)
    out = p.evaluate(k=5)
    r = out["rmse"].collect()[0].rmse
    s = out["ranking"].collect()[0]
    assert r >= 0.0 and s.n_users > 0
    assert 0.0 <= s.hit_rate <= 1.0

    hr = p.popularity_hit_ratio(k=5).collect()[0]
    assert 0.0 <= hr.hit_ratio <= 1.0


def test_ratings_csv_roundtrip(spark, ratings):
    d = tempfile.mkdtemp(prefix="ratings_csv_")
    try:
        write_csv(ratings, d)
        back = read_ratings_csv(spark, d)
        assert back.schema["userId"].dataType.simpleString() == "int"
        assert back.schema["rating"].dataType.simpleString() == "float"
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, ratings.collect()))
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_headerless_csv(spark, ratings):
    d = tempfile.mkdtemp(prefix="ratings_csv_nh_")
    try:
        write_csv(ratings, d, header=False)
        back = read_ratings_csv(spark, d, header=False)
        assert back.count() == ratings.count()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_genres_and_title_year(spark):
    movies = spark.createDataFrame(
        [
            (1, "Toy Story (1995)", "Adventure|Animation|Children"),
            (2, "Title Without Year", "(no genres listed)"),
        ],
        "movieId int, title string, genres string",
    )
    out = movies.select(
        "movieId",
        split_genres("genres").alias("g"),
        title_year("title").alias("y"),
    ).collect()
    by_id = {r.movieId: r for r in out}
    assert by_id[1].g == ["Adventure", "Animation", "Children"] and by_id[1].y == 1995
    assert by_id[2].g == ["(no genres listed)"] and by_id[2].y is None
