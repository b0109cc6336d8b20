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


def bucketed_interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
) -> DataFrame:
    """Interval-interval OVERLAP join: every (left row, right row) with
    ``left_lo <= right_hi AND right_lo <= left_hi`` (closed intervals).

    Same bucketing idea as the point-in-interval join, with one twist:
    both sides explode onto every bucket they span, so an overlapping
    pair can meet in SEVERAL buckets.  Rather than paying a distinct
    shuffle to dedup, each pair is emitted only from its canonical
    bucket — ``max(floor(lo_l/w), floor(lo_r/w))``, the first bucket
    where both intervals are live, which every overlapping pair has
    exactly one of (it is where the later-starting interval begins, and
    overlap guarantees the other interval spans it).  The join stays a
    plain hash equi-join of exploded rows; no dedup pass, no
    BroadcastNestedLoopJoin.
    """
    w = float(bucket_width)

    def burst(df: DataFrame, lo: str, hi: str) -> DataFrame:
        return df.withColumn(
            "__bkt",
            F.explode(
                F.sequence(
                    F.floor(F.col(lo) / w).cast("long"),
                    F.floor(F.col(hi) / w).cast("long"),
                )
            ),
        )

    pairs = burst(left, left_lo, left_hi).join(
        burst(right, right_lo, right_hi), "__bkt"
    )
    canonical = F.greatest(
        F.floor(F.col(left_lo) / w).cast("long"),
        F.floor(F.col(right_lo) / w).cast("long"),
    )
    return (
        pairs.filter(
            (F.col(left_lo) <= F.col(right_hi))
            & (F.col(right_lo) <= F.col(left_hi))
            & (F.col("__bkt") == canonical)
        )
        .drop("__bkt")
    )
