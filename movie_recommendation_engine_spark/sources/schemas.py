"""Explicit StructType schemas for every table the engine touches.

The reference reads CSV **without** a schema and casts columns afterwards
(reference als.py:24-26, popularity_model.py:43-45) — an extra pass of
string shuffling that Catalyst cannot prune.  The engine declares schemas
at read time (SURVEY §1.4): types reach the scan, casts disappear from the
plan, and Parquet readers get exact column pruning.
"""

from __future__ import annotations

from pyspark.sql import types as T

# MovieLens interaction table (reference ml-latest-small_readme:74-85).
# `timestamp` is epoch seconds; the reference never parses it — we type it
# long and expose ts_to_timestamp() for callers who want a real timestamp.
RATINGS_SCHEMA = T.StructType(
    [
        T.StructField("userId", T.IntegerType(), False),
        T.StructField("movieId", T.IntegerType(), False),
        T.StructField("rating", T.FloatType(), False),
        T.StructField("timestamp", T.LongType(), True),
    ]
)

# movies.csv (reference ml-latest-small_readme:102-131); genres stays a
# pipe-string at read, split to array<string> by functions.arrays.split_genres.
MOVIES_SCHEMA = T.StructType(
    [
        T.StructField("movieId", T.IntegerType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("genres", T.StringType(), True),
    ]
)

TAGS_SCHEMA = T.StructType(
    [
        T.StructField("userId", T.IntegerType(), False),
        T.StructField("movieId", T.IntegerType(), False),
        T.StructField("tag", T.StringType(), True),
        T.StructField("timestamp", T.LongType(), True),
    ]
)

LINKS_SCHEMA = T.StructType(
    [
        T.StructField("movieId", T.IntegerType(), False),
        T.StructField("imdbId", T.StringType(), True),
        T.StructField("tmdbId", T.IntegerType(), True),
    ]
)

# Legacy 5-column split layout written by the deprecated splitter
# (reference popularity_model.py:44: userId, movieId, rating, unknown, split).
SPLIT_5COL_SCHEMA = T.StructType(
    [
        T.StructField("userId", T.IntegerType(), False),
        T.StructField("movieId", T.IntegerType(), False),
        T.StructField("rating", T.FloatType(), False),
        T.StructField("unknown", T.StringType(), True),
        T.StructField("split", T.StringType(), True),
    ]
)

# Driver-provided star schema (TESTDATA.md) — parquet carries its own
# schema; this list is the canonical table inventory.
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
