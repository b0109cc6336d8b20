"""Range (interval-containment) join — points joined to intervals that
contain them, without an equi key (prompt §"Custom operators").

Spark plans a bare ``lo <= x AND x <= hi`` join as
BroadcastNestedLoopJoin — O(|points| x |intervals|) and a full
broadcast of one side.  The scalable spelling is **bucketing**: pick a
bucket width, explode every interval onto the buckets it overlaps,
hash each point into its single bucket, equi-join on the bucket id and
re-check exact containment.  Each (interval, point) pair can meet in at
most one bucket (the point's), so no dedup pass is needed.

Cost: a shuffle of |points| + |intervals| x avg_buckets_per_interval
rows on an integer key — a plain hash join.  Bucket width is the dial:
~ the median interval width is a good default (1-2 buckets per
interval, 1 per point); too small explodes intervals, too large packs
unrelated rows into the same bucket and pushes work into the residual
filter.  Buckets also compose with AQE skew splitting when interval
density is non-uniform.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Inner join: every (point row, interval row) with
    ``lo_col <= point_col <= hi_col``.  All columns of both inputs are
    kept (names must not collide, except the bucket key is internal).
    """
    w = float(bucket_width)
    pts = points.withColumn("__bkt", F.floor(F.col(point_col) / w))
    ivls = intervals.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w).cast("long"),
                F.floor(F.col(hi_col) / w).cast("long"),
            )
        ),
    )
    return (
        pts.join(ivls, "__bkt")
        .filter((F.col(lo_col) <= F.col(point_col)) & (F.col(point_col) <= F.col(hi_col)))
        .drop("__bkt")
    )
