"""S5 pandas-interop source: output must be indistinguishable from the
native CSV scan (SURVEY §2.1 S5; reference new_split_script.py:4,
extension.py:129-132)."""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pytest
from pyspark.sql import types as T

from movie_recommendation_engine_spark.sources import read_csv
from movie_recommendation_engine_spark.sources.pandas_compat import (
    from_pandas,
    read_csv_pandas,
    to_pandas,
)
from movie_recommendation_engine_spark.sources.schemas import RATINGS_SCHEMA

CSV_HEADER = "userId,movieId,rating,timestamp\n"
CSV_ROWS = "1,10,4.5,964982703\n2,20,3.0,964982931\n3,30,5.0,\n"


def _write(tmpdir: str, name: str, text: str) -> str:
    path = os.path.join(tmpdir, name)
    with open(path, "w") as f:
        f.write(text)
    return path


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_read_csv_pandas_matches_native_scan(spark):
    with tempfile.TemporaryDirectory() as d:
        path = _write(d, "ratings.csv", CSV_HEADER + CSV_ROWS)
        native = read_csv(spark, path, RATINGS_SCHEMA, header=True)
        compat = read_csv_pandas(spark, path, RATINGS_SCHEMA, header=True)
        assert compat.schema == native.schema
        assert _sorted_rows(compat) == _sorted_rows(native)
        # the empty timestamp cell must land as SQL NULL on both paths
        assert compat.filter("timestamp IS NULL").count() == 1


def test_read_csv_pandas_headerless_positional_names(spark):
    with tempfile.TemporaryDirectory() as d:
        path = _write(d, "ratings_nohdr.csv", CSV_ROWS)
        native = read_csv(spark, path, RATINGS_SCHEMA, header=False)
        compat = read_csv_pandas(spark, path, RATINGS_SCHEMA, header=False)
        assert compat.schema == native.schema
        assert _sorted_rows(compat) == _sorted_rows(native)


def test_read_csv_pandas_extra_columns_match_native_scan(spark):
    """A file WIDER than the schema must bind positionally like the
    native scan (first len(schema) tokens), not shift values left —
    pandas' names= on a wider file silently promotes leading columns to
    the index (round-5 review finding)."""
    wide = "1,10,4.5,964982703,777\n2,20,3.0,964982931,778\n"
    with tempfile.TemporaryDirectory() as d:
        for header, text in (
            (True, CSV_HEADER.rstrip("\n") + ",extra\n" + wide),
            (False, wide),
        ):
            path = _write(d, f"wide_{header}.csv", text)
            native = read_csv(spark, path, RATINGS_SCHEMA, header=header)
            compat = read_csv_pandas(spark, path, RATINGS_SCHEMA, header=header)
            assert compat.schema == native.schema
            assert _sorted_rows(compat) == _sorted_rows(native)
            # sanity: userId really is the FIRST file column
            assert compat.filter("userId = 1").count() == 1


def test_read_csv_pandas_missing_columns_null_fill_like_native(spark):
    """A file NARROWER than the schema null-fills trailing fields, same
    as Spark's PERMISSIVE scan."""
    narrow = "1,10,4.5\n2,20,3.0\n"
    with tempfile.TemporaryDirectory() as d:
        path = _write(d, "narrow.csv", narrow)
        native = read_csv(spark, path, RATINGS_SCHEMA, header=False)
        compat = read_csv_pandas(spark, path, RATINGS_SCHEMA, header=False)
        assert compat.schema == native.schema
        assert _sorted_rows(compat) == _sorted_rows(native)
        assert compat.filter("timestamp IS NULL").count() == 2


def test_read_csv_pandas_binds_positionally_not_by_header_name(spark):
    """Spark's CSV source with a user schema IGNORES header names
    (enforceSchema default — the header row is only skipped); the
    interop path must do the same, or a reordered header would silently
    produce different frames on the two claimed-identical paths."""
    reordered = "movieId,userId,rating,timestamp\n1,10,4.5,964982703\n"
    with tempfile.TemporaryDirectory() as d:
        path = _write(d, "reordered.csv", reordered)
        native = read_csv(spark, path, RATINGS_SCHEMA, header=True)
        compat = read_csv_pandas(spark, path, RATINGS_SCHEMA, header=True)
        assert _sorted_rows(compat) == _sorted_rows(native)
        # positional: first column binds to userId regardless of header
        assert compat.collect()[0]["userId"] == 1


def test_read_csv_pandas_header_only_file_is_empty(spark):
    with tempfile.TemporaryDirectory() as d:
        path = _write(d, "empty.csv", CSV_HEADER)
        native = read_csv(spark, path, RATINGS_SCHEMA, header=True)
        compat = read_csv_pandas(spark, path, RATINGS_SCHEMA, header=True)
        assert compat.schema == native.schema
        assert compat.count() == native.count() == 0


def test_from_pandas_declared_types_override_inference(spark):
    pdf = pd.DataFrame({"userId": [1, 2], "rating": [4, 5]})  # ints in a float col
    schema = T.StructType(
        [
            T.StructField("userId", T.IntegerType(), False),
            T.StructField("rating", T.FloatType(), False),
        ]
    )
    df = from_pandas(spark, pdf, schema)
    assert df.schema == schema
    assert _sorted_rows(df) == [(1, 4.0), (2, 5.0)]


def test_from_pandas_rejects_missing_column_and_exotic_type(spark):
    pdf = pd.DataFrame({"a": [1]})
    with pytest.raises(ValueError, match="missing column"):
        from_pandas(
            spark, pdf, T.StructType([T.StructField("b", T.IntegerType())])
        )
    with pytest.raises(TypeError, match="unsupported interop type"):
        from_pandas(
            spark,
            pd.DataFrame({"a": [[1]]}),
            T.StructType([T.StructField("a", T.ArrayType(T.IntegerType()))]),
        )


def test_to_pandas_roundtrip_and_guard(spark):
    pdf = pd.DataFrame({"userId": pd.array([1, 2, 3], dtype="Int32")})
    schema = T.StructType([T.StructField("userId", T.IntegerType(), False)])
    df = from_pandas(spark, pdf, schema)
    back = to_pandas(df, max_rows=10).sort_values("userId").reset_index(drop=True)
    assert list(back["userId"]) == [1, 2, 3]
    with pytest.raises(ValueError, match="max_rows=2"):
        to_pandas(df, max_rows=2)


def test_read_csv_pandas_string_column_keeps_raw_text(spark):
    """No pandas dtype inference: a StringType column holding numeric-
    looking text ('007', '1.50') must land the raw text exactly like
    the native scan (round-5 review: inference rendered 7 / 1.5)."""
    schema = T.StructType(
        [
            T.StructField("code", T.StringType()),
            T.StructField("qty", T.IntegerType()),
        ]
    )
    with tempfile.TemporaryDirectory() as d:
        path = _write(d, "codes.csv", "code,qty\n007,1\n1.50,2\nabc,\n")
        native = read_csv(spark, path, schema, header=True)
        compat = read_csv_pandas(spark, path, schema, header=True)
        assert _sorted_rows(compat) == _sorted_rows(native)
        assert {r.code for r in compat.collect()} == {"007", "1.50", "abc"}


def test_read_csv_pandas_boolean_column(spark):
    schema = T.StructType(
        [
            T.StructField("k", T.IntegerType()),
            T.StructField("flag", T.BooleanType()),
        ]
    )
    with tempfile.TemporaryDirectory() as d:
        path = _write(d, "flags.csv", "1,true\n2,false\n3,\n")
        native = read_csv(spark, path, schema, header=False)
        compat = read_csv_pandas(spark, path, schema, header=False)
        assert _sorted_rows(compat) == _sorted_rows(native)


def test_read_csv_pandas_malformed_numeric_nulls_like_native(spark):
    """PERMISSIVE null-on-malformed parity (round-5 advice): 'abc' in an
    int column, fractional text in an int column, and an out-of-range
    integer all land NULL under the native scan — the pandas path must
    coerce to the same NULLs instead of raising."""
    with tempfile.TemporaryDirectory() as d:
        path = _write(
            d,
            "bad.csv",
            CSV_HEADER
            + "1,10,4.5,964982703\n"      # clean row
            + "abc,20,3.0,964982931\n"    # text in int column
            + "4.5,30,2.0,964982931\n"    # fractional in int column
            + "3,99999999999,1.0,5\n"     # > 2^31-1 in Int32 column
            + "4,40,xyz,6\n",             # text in float column
        )
        native = read_csv(spark, path, RATINGS_SCHEMA, header=True)
        compat = read_csv_pandas(spark, path, RATINGS_SCHEMA, header=True)
        from collections import Counter

        # multiset compare (rows contain NULLs, which don't sort)
        assert Counter(map(tuple, compat.collect())) == Counter(
            map(tuple, native.collect())
        )
        by_movie = {r.movieId: r for r in compat.collect()}
        assert by_movie[20].userId is None and by_movie[30].userId is None
        assert by_movie[40].rating is None
        assert any(r.movieId is None for r in compat.collect())  # overflow row
