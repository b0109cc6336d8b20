"""Malformed-record policy of the schema'd sources: quarantine
(PERMISSIVE + _corrupt_record), drop (DROPMALFORMED), fail (FAILFAST)."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F, types as T

from movie_recommendation_engine_spark.sources.readers import read_csv, read_json


@pytest.fixture(scope="module")
def bad_json_dir():
    d = tempfile.mkdtemp(prefix="badjson_")
    with open(os.path.join(d, "part-0.json"), "w") as f:
        f.write('{"id": 1, "v": 10.5}\n')
        f.write('{"id": 2 "v": broken\n')          # malformed
        f.write('{"id": 3, "v": 7.0}\n')
    return d


def test_json_permissive_quarantines_corrupt_rows(spark, bad_json_dir):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("v", T.DoubleType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    df = read_json(spark, bad_json_dir, schema).cache()  # corrupt-col query needs cache
    assert df.count() == 3
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert bad.count() == 1
    assert "broken" in bad.collect()[0]._corrupt_record
    good = df.filter(F.col("_corrupt_record").isNull())
    assert {r.id for r in good.collect()} == {1, 3}


def test_json_dropmalformed_drops(spark, bad_json_dir):
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.DoubleType())]
    )
    df = read_json(spark, bad_json_dir, schema, mode="DROPMALFORMED")
    assert {r.id for r in df.collect()} == {1, 3}


def test_csv_failfast_aborts(spark):
    d = tempfile.mkdtemp(prefix="badcsv_")
    with open(os.path.join(d, "part-0.csv"), "w") as f:
        f.write("id,v\n1,2.5\nnot_an_int,xyz\n")
    schema = T.StructType(
        [T.StructField("id", T.IntegerType()), T.StructField("v", T.DoubleType())]
    )
    with pytest.raises(Exception):
        read_csv(spark, d, schema, header=True, mode="FAILFAST").collect()
