"""Query registry: every implemented operator from SURVEY §2 as a
(spark_query, duckdb_oracle_sql) pair over the driver testdata star
schema (TESTDATA.md).

Conventions that make the driver's order-insensitive value-hash robust:
- every computed double is ``round(x, 6)`` on BOTH sides (float sums
  accumulate in different orders across engines; 6 decimals absorbs the
  ulp noise while keeping full semantic precision);
- every aggregate/computed column is aliased identically on both sides;
- every query ends in a deterministic total order or is a pure set
  (the driver hashes order-insensitively, so only content matters);
- timestamps in outputs are formatted to 'yyyy-MM-dd HH:mm:ss' strings
  on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from .plans.popularity import popularity_top_k
from .sources.readers import read_testdata

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a (spark, sf_dir) -> DataFrame query; optionally its
    DuckDB oracle SQL (omitted => driver runs the weaker rows-only check)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_testdata(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Flagship: popularity baseline (reference E1, popularity_model.py:43-59)
# on lineitem: movieId≅l_partkey, userId≅l_orderkey, rating≅l_quantity.
# Exercises scan → hash agg → exact percentile → scalar re-entry →
# native weighted-score expr → TakeOrderedAndProject top-k.
# --------------------------------------------------------------------------


@register(
    "popularity_top100",
    oracle="""
WITH per_item AS (
  SELECT l_partkey,
         avg(l_quantity) AS avg_rating,
         count(l_orderkey) AS num_ratings
  FROM lineitem GROUP BY l_partkey
), scalars AS (
  SELECT avg(avg_rating) AS gm,
         quantile_cont(num_ratings, 0.9) AS floor_
  FROM per_item
)
SELECT l_partkey,
       round(avg_rating, 6) AS avg_rating,
       num_ratings,
       round( (num_ratings / (num_ratings + floor_)) * avg_rating
            + (floor_ / (floor_ + num_ratings)) * gm, 6) AS score
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
