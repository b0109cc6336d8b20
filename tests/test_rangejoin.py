"""Bucketed range join: equality with the naive theta join, including
points exactly on interval and bucket boundaries."""

from __future__ import annotations

from pyspark.sql import functions as F

from movie_recommendation_engine_spark.operators.rangejoin import bucketed_range_join


def _naive(points, intervals, point_col, lo, hi):
    return points.join(
        intervals, (F.col(lo) <= F.col(point_col)) & (F.col(point_col) <= F.col(hi))
    )


def test_bucketed_equals_naive_with_boundaries(spark):
    points = spark.createDataFrame(
        [(i, x) for i, x in enumerate([0.0, 0.5, 1.0, 1.5, 2.0, 2.5, 10.0, -1.3])],
        "pid int, x double",
    )
    intervals = spark.createDataFrame(
        [
            (100, 0.0, 1.0),    # closed both ends
            (101, 0.9, 2.1),    # spans several buckets
            (102, 2.5, 2.5),    # degenerate single point
            (103, -2.0, -1.0),  # negative range
            (104, 5.0, 6.0),    # matches nothing
        ],
        "iid int, lo double, hi double",
    )
    for w in (0.1, 0.5, 1.0, 3.0):
        got = {
            (r.pid, r.iid)
            for r in bucketed_range_join(points, intervals, "x", "lo", "hi", w).collect()
        }
        want = {
            (r.pid, r.iid)
            for r in _naive(points, intervals, "x", "lo", "hi").collect()
        }
        assert got == want, f"width={w}: {got ^ want}"
    assert (0, 100) in want and (2, 100) in want   # both closed ends
    assert (5, 102) in want                         # degenerate interval
    assert (7, 103) in want                         # negative bucket floor
    assert not any(i == 104 for _, i in want)


def test_upsert_semantics(spark):
    """Update-wins on collision, new keys append, duplicate updates
    resolve to the greatest order_col."""
    from movie_recommendation_engine_spark.operators.upsert import upsert

    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k int, name string, v int"
    )
    updates = spark.createDataFrame(
        [(2, "b2", 21), (4, "d", 40), (4, "d_newer", 41)], "k int, name string, v int"
    )
    out = {r.k: (r.name, r.v) for r in upsert(base, updates, ["k"], order_col="v").collect()}
    assert out == {1: ("a", 10), 2: ("b2", 21), 3: ("c", 30), 4: ("d_newer", 41)}


def test_null_safe_join_semantics(spark):
    """eqNullSafe treats NULL keys as equal (IS NOT DISTINCT FROM);
    a plain equi-join silently drops NULL-keyed rows — the classic
    silent-data-loss trap in dimension joins."""
    left = spark.createDataFrame([(1, "a"), (None, "b")], "k int, lv string")
    right = spark.createDataFrame([(1, "x"), (None, "y")], "k int, rv string")
    plain = left.join(right, left.k == right.k).count()
    safe = left.join(right, left.k.eqNullSafe(right.k))
    assert plain == 1
    assert safe.count() == 2
    pairs = {(r.lv, r.rv) for r in safe.collect()}
    assert ("b", "y") in pairs


def test_interval_overlap_join_matches_naive_theta(spark):
    """Bucketed overlap join == naive theta join on adversarial
    intervals: touching endpoints (closed semantics), one interval
    spanning many buckets, disjoint pairs, and exactly one emission per
    overlapping pair (no bucket-duplicate rows)."""
    from movie_recommendation_engine_spark.operators.rangejoin import (
        bucketed_interval_overlap_join,
    )

    left = spark.createDataFrame(
        [(1, 0.0, 10.0), (2, 35.0, 36.0), (3, 5.0, 95.0), (4, 200.0, 201.0)],
        "lid int, alo double, ahi double",
    )
    right = spark.createDataFrame(
        [(10, 10.0, 12.0), (11, 30.0, 40.0), (12, 96.0, 99.0), (13, -5.0, 0.0)],
        "rid int, blo double, bhi double",
    )
    got = sorted(
        (r.lid, r.rid)
        for r in bucketed_interval_overlap_join(
            left, right, "alo", "ahi", "blo", "bhi", bucket_width=7.0
        ).collect()
    )
    naive = sorted(
        (r.lid, r.rid)
        for r in left.crossJoin(right)
        .filter("alo <= bhi AND blo <= ahi")
        .collect()
    )
    assert got == naive
    # touching endpoints included (closed), and pair (3,11) emitted once
    # even though both intervals span bucket 5
    assert (1, 10) in got and (1, 13) in got and (3, 11) in got
    assert len(got) == len(set(got))
