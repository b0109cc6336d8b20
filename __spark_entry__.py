"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship popularity query on sf0.001.
``queries()`` maps every implemented SURVEY §2 operator to a callable
``(spark, sf_dir) -> DataFrame``; ``oracle_sql()`` holds the DuckDB
equivalent for the correctness gate.  The registry itself lives in
``movie_recommendation_engine_spark.registry`` so it is unit-testable;
this module is just the driver-facing shim.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from movie_recommendation_engine_spark.registry import ORACLES, QUERIES, flagship


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
