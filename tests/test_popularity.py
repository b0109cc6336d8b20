"""Popularity baseline (reference E1) unit tests against tiny fixtures
plus a DuckDB cross-check at sf0.001."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from movie_recommendation_engine_spark.plans.popularity import (
    popularity_scores,
    popularity_top_k,
)

from conftest import SF_SMALL


def test_scores_match_hand_computation(spark):
    # 2 items: item 1 rated [4,4,4] by 3 users; item 2 rated [2] by 1 user.
    df = spark.createDataFrame(
        [(1, 1, 4.0), (2, 1, 4.0), (3, 1, 4.0), (1, 2, 2.0)],
        "userId int, movieId int, rating float",
    )
    out = popularity_scores(df, count_quantile=0.0, round_to=None).orderBy("movieId").collect()
    # global mean of per-item means = (4+2)/2 = 3; floor = percentile(counts,0)=1
    # item1: v=3, r=4 -> 3/4*4 + 1/4*3 = 3.75 ; item2: v=1, r=2 -> 1/2*2 + 1/2*3 = 2.5
    assert out[0].movieId == 1 and abs(out[0].score - 3.75) < 1e-9
    assert out[1].movieId == 2 and abs(out[1].score - 2.5) < 1e-9


def test_count_floor_filters(spark):
    df = spark.createDataFrame(
        [(u, m, 3.0) for m in range(10) for u in range(m + 1)],
        "userId int, movieId int, rating float",
    )
    out = popularity_scores(df, count_quantile=0.9)
    # counts are 1..10; 90th percentile (exact, interpolated) = 9.1 -> only count-10 item
    assert out.count() == 1


def test_topk_matches_duckdb(spark, lineitem):
    got = popularity_top_k(
        lineitem, k=20, item_col="l_partkey", user_col="l_orderkey", rating_col="l_quantity"
    ).collect()
    want = duckdb.sql(
        f"""
        WITH per_item AS (
          SELECT l_partkey, avg(l_quantity) avg_rating, count(l_orderkey) num_ratings
          FROM '{SF_SMALL}/lineitem.parquet' GROUP BY l_partkey),
        s AS (SELECT avg(avg_rating) gm, quantile_cont(num_ratings, 0.9) f FROM per_item)
        SELECT l_partkey, round(avg_rating,6), num_ratings,
               round((num_ratings/(num_ratings+f))*avg_rating + (f/(f+num_ratings))*gm, 6)
        FROM per_item, s WHERE num_ratings >= f
        ORDER BY 4 DESC, 1 LIMIT 20
        """
    ).fetchall()
    assert [(r.l_partkey, r.avg_rating, r.num_ratings, r.score) for r in got] == [
        tuple(w) for w in want
    ]


def test_plan_has_no_python_udf_and_broadcasts_scalars(spark, lineitem):
    df = popularity_top_k(lineitem, item_col="l_partkey", user_col="l_orderkey", rating_col="l_quantity")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan
    assert "TakeOrderedAndProject" in plan
