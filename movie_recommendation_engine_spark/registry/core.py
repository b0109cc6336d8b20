"""Flagship query: the reference's popularity baseline (E1) on lineitem.

movieId≅l_partkey, userId≅l_orderkey, rating≅l_quantity (FIXTURES.md §1).
Exercises scan → hash agg → exact percentile → scalar re-entry →
native weighted-score expr → TakeOrderedAndProject top-k
(reference popularity_model.py:43-59, SURVEY §7.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..plans.popularity import popularity_top_k
from . import _t, register


@register(
    "popularity_top100",
    oracle="""
WITH per_item AS (
  SELECT l_partkey,
         avg(l_quantity) AS avg_rating,
         count(l_orderkey) AS num_ratings
  FROM lineitem GROUP BY l_partkey
), scalars AS (
  SELECT CAST(sum(CAST(avg_rating AS DECIMAL(28,18))) AS DOUBLE) / count(*) AS gm,
         quantile_cont(num_ratings, 0.9) AS floor_
  FROM per_item
)
SELECT l_partkey,
       (floor((avg_rating) * 1000000 + 0.5) / 1000000) AS avg_rating,
       num_ratings,
       (floor(((num_ratings / (num_ratings + floor_)) * avg_rating
            + (floor_ / (floor_ + num_ratings)) * gm) * 1000000 + 0.5) / 1000000) AS score
FROM per_item, scalars
WHERE num_ratings >= floor_
ORDER BY score DESC, l_partkey
LIMIT 100
""",
)
def q_popularity_top100(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return popularity_top_k(
        li, k=100, item_col="l_partkey", user_col="l_orderkey", rating_col="l_quantity"
    )


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    return q_popularity_top100(spark, sf_dir)
