"""Top-k operators (SURVEY §2.5, §2.6).

The reference gets per-user top-k only through MLlib's
``recommendForAllUsers`` (als.py:96) and gets its global ranked list by
collecting the full sort to the driver (popularity_model.py:59).  The
engine keeps both distributed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_by: list[Column],
    k: int,
    rank_col: str = "rank",
    keep_rank: bool = False,
) -> DataFrame:
    """row_number window rank <= k within each group.

    ``order_by`` must be a *total* order (add a key tiebreaker) for
    deterministic output.  Physical plan: one hash exchange on
    ``group_cols`` + per-partition sort — no global sort, no driver.

    With ``keep_rank=False`` the rank is computed under a collision-proof
    internal name, so an input column that happens to be called ``rank``
    passes through untouched (the old withColumn/drop pair silently
    destroyed it — round-5 review).  With ``keep_rank=True`` the output
    column ``rank_col`` intentionally replaces any same-named input.
    """
    col = rank_col if keep_rank else "__tkpg_rank"
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    out = df.withColumn(col, F.row_number().over(w)).filter(F.col(col) <= k)
    return out if keep_rank else out.drop(col)


def top_k_global(df: DataFrame, order_by: list[Column], k: int) -> DataFrame:
    """Global top-k without a full range-partitioned sort.

    ``orderBy().limit(k)`` lets Spark run TakeOrderedAndProject — each
    partition keeps a k-heap and the driver merges k*numPartitions rows,
    instead of a full shuffle sort (the reference's collect-then-slice at
    popularity_model.py:56-59).
    """
    return df.orderBy(*order_by).limit(k)
