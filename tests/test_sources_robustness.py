"""Malformed-record policy of the schema'd sources: quarantine
(PERMISSIVE + _corrupt_record), drop (DROPMALFORMED), fail (FAILFAST)."""

from __future__ import annotations

import glob
import os
import shutil
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


def test_write_sorted_produces_skippable_row_groups(spark):
    """Range-clustered parquet must have narrow, mostly non-overlapping
    row-group [min, max] stats on the sort key — the physical property
    zone-map skipping depends on — while a random layout spans nearly
    the full range in every row group."""
    import glob

    import pyarrow.parquet as pq

    from movie_recommendation_engine_spark.sources.writers import write_parquet, write_sorted

    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet").select(
        "l_partkey", "l_quantity"
    )
    lo, hi = li.agg(F.min("l_partkey"), F.max("l_partkey")).collect()[0]
    span = hi - lo

    def rowgroup_spans(d):
        spans = []
        for f in glob.glob(os.path.join(d, "*.parquet")):
            md = pq.read_metadata(f)
            idx = md.schema.names.index("l_partkey")
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                spans.append((st.min, st.max))
        return spans

    d_sorted = tempfile.mkdtemp(prefix="sorted_") + "/t"
    d_plain = tempfile.mkdtemp(prefix="plain_") + "/t"
    try:
        write_sorted(li, d_sorted, ["l_partkey"], n_files=8)
        write_parquet(li.repartition(8), d_plain)
        sorted_spans = rowgroup_spans(d_sorted)
        plain_spans = rowgroup_spans(d_plain)
        assert len(sorted_spans) >= 8
        # each clustered row group covers a small slice; random covers ~all
        avg_sorted = sum(b - a for a, b in sorted_spans) / len(sorted_spans)
        avg_plain = sum(b - a for a, b in plain_spans) / len(plain_spans)
        assert avg_sorted < span * 0.25
        assert avg_plain > span * 0.9
        # and the data survives intact
        assert spark.read.parquet(d_sorted).count() == li.count()
    finally:
        shutil.rmtree(os.path.dirname(d_sorted), ignore_errors=True)
        shutil.rmtree(os.path.dirname(d_plain), ignore_errors=True)


def test_write_zorder_clusters_both_dimensions(spark):
    """Morton-interleaved layout must give narrow row-group zone maps on
    BOTH z-ordered columns at once (~sqrt(1/n_files) of the span each),
    where single-key range clustering helps only its leading key."""
    import glob

    import pyarrow.parquet as pq

    from movie_recommendation_engine_spark.sources.writers import write_parquet, write_zorder

    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )

    def avg_span_frac(d, col):
        lo, hi = li.agg(F.min(col), F.max(col)).collect()[0]
        spans = []
        for f in glob.glob(os.path.join(d, "*.parquet")):
            md = pq.read_metadata(f)
            idx = md.schema.names.index(col)
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                spans.append(st.max - st.min)
        return sum(spans) / len(spans) / (hi - lo)

    d_z = tempfile.mkdtemp(prefix="zorder_") + "/t"
    d_plain = tempfile.mkdtemp(prefix="zplain_") + "/t"
    try:
        write_zorder(li, d_z, ["l_partkey", "l_suppkey"], bits=16, n_files=16)
        write_parquet(li.repartition(16), d_plain)
        for col in ("l_partkey", "l_suppkey"):
            assert avg_span_frac(d_z, col) < 0.5, col
            assert avg_span_frac(d_plain, col) > 0.9, col
        assert spark.read.parquet(d_z).count() == li.count()
        # schema untouched: no helper columns leak into the layout
        assert set(spark.read.parquet(d_z).columns) == set(li.columns)
    finally:
        shutil.rmtree(os.path.dirname(d_z), ignore_errors=True)
        shutil.rmtree(os.path.dirname(d_plain), ignore_errors=True)


def test_zorder_key_validation(spark):
    import pytest as _pytest

    from movie_recommendation_engine_spark.sources.writers import zorder_key

    li = spark.range(10).withColumn("a", F.col("id")).withColumn("b", F.col("id"))
    with _pytest.raises(ValueError):
        zorder_key(li, ["a"])
    with _pytest.raises(ValueError):
        zorder_key(li, ["a", "b"], bits=32)


def test_merge_schema_reads_evolved_parquet(spark):
    """Schema evolution: a table whose later files carry an extra column
    must be readable with mergeSchema — old rows surface NULL for the
    new column, and the union schema is stable."""
    d = tempfile.mkdtemp(prefix="evolve_") + "/t"
    try:
        spark.createDataFrame([(1, "a")], "id long, v string").write.parquet(d)
        spark.createDataFrame(
            [(2, "b", 9.5)], "id long, v string, score double"
        ).write.mode("append").parquet(d)
        got = spark.read.option("mergeSchema", "true").parquet(d)
        assert set(got.columns) == {"id", "v", "score"}
        rows = {r.id: r.score for r in got.collect()}
        assert rows == {1: None, 2: 9.5}
    finally:
        shutil.rmtree(os.path.dirname(d), ignore_errors=True)


def test_compact_parquet_reduces_files_preserving_rows(spark):
    from movie_recommendation_engine_spark.sources.writers import compact_parquet

    import glob

    src = tempfile.mkdtemp(prefix="frag_") + "/t"
    dst = tempfile.mkdtemp(prefix="compact_") + "/t"
    try:
        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        li.repartition(16).write.parquet(src)  # fragment: 16 small files
        assert len(glob.glob(os.path.join(src, "*.parquet"))) == 16
        n = compact_parquet(spark, src, dst, target_file_mb=512)
        assert n == 1  # tiny table: everything fits one target file
        assert len(glob.glob(os.path.join(dst, "*.parquet"))) == 1
        a = sorted(map(tuple, spark.read.parquet(src).collect()))
        b = sorted(map(tuple, spark.read.parquet(dst).collect()))
        assert a == b
    finally:
        shutil.rmtree(os.path.dirname(src), ignore_errors=True)
        shutil.rmtree(os.path.dirname(dst), ignore_errors=True)


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    """ORC sink/scan: values survive the round trip and a scan-level
    predicate reaches the ORC reader as a pushed filter."""
    from movie_recommendation_engine_spark.sources.readers import read_orc
    from movie_recommendation_engine_spark.sources.writers import write_orc

    df = spark.createDataFrame(
        [(i, f"name{i}", float(i) * 1.5) for i in range(100)],
        "id long, name string, score double",
    )
    path = str(tmp_path / "orc")
    write_orc(df, path)
    back = read_orc(spark, path)
    assert back.count() == 100
    assert sorted(r.id for r in back.filter("id < 5").collect()) == [0, 1, 2, 3, 4]
    plan = back.filter("id >= 90")._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "id" in plan.split("PushedFilters", 1)[1][:120]
