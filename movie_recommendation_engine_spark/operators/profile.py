"""Table profiling — per-column data-quality stats in ONE pass
(prompt §"Text analysis" / pipeline QA: completeness, cardinality,
range checks before training data ships).

Everything is computed in a single Aggregate over the table —
n/nulls/ndv/min/max for every requested column at once — then reshaped
to one row per column with ``stack`` (an Expand node: rows, not a
shuffle per column).  Profiling a 100 TB table is one scan; never one
job per column (the naive loop is #cols scans).

Exact ``countDistinct`` over many columns plans as one Expand +
aggregate; at extreme widths switch ``approx=True`` for HLL++ sketches
(one pass, mergeable, no expand).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def table_profile(df: DataFrame, cols: list[str], approx: bool = False) -> DataFrame:
    """One row per column: (column, n, n_null, n_distinct, min_value,
    max_value) — min/max rendered as strings so heterogeneous column
    types stack into one result."""
    ndv = F.approx_count_distinct if approx else F.countDistinct
    aggs = []
    for c in cols:
        aggs += [
            F.count(c).alias(f"__{c}_n"),
            # coalesce: sum over ZERO rows is NULL, but an empty table
            # has 0 nulls, not unknown-many (degenerate-input contract)
            F.coalesce(
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)), F.lit(0)
            ).alias(f"__{c}_nulls"),
            ndv(c).alias(f"__{c}_ndv"),
            F.min(c).cast("string").alias(f"__{c}_min"),
            F.max(c).cast("string").alias(f"__{c}_max"),
        ]
    one = df.agg(*aggs)
    stack_args = []
    for c in cols:
        stack_args += [
            f"'{c}'",
            f"__{c}_n",
            f"__{c}_nulls",
            f"__{c}_ndv",
            f"__{c}_min",
            f"__{c}_max",
        ]
    return one.selectExpr(
        f"stack({len(cols)}, {', '.join(stack_args)}) AS "
        "(column, n, n_null, n_distinct, min_value, max_value)"
    )


def value_histogram(df: DataFrame, col: str, n_bins: int = 20) -> DataFrame:
    """Fixed-width histogram of a numeric column: (bin, bin_lo, bin_hi,
    n) for every non-empty bin.

    The [min, max] bounds ride in as a broadcast one-row aggregate (no
    driver collect — the with_scalars pattern), the bin id is pure
    column arithmetic, and the groupBy partial-aggregates map-side, so
    the shuffle carries at most n_bins rows per task regardless of data
    volume.  The top edge folds into the last bin (least(...)), matching
    the usual closed-right histogram convention.
    """
    from .relational import with_scalars

    bounds = df.agg(F.min(col).alias("__lo"), F.max(col).alias("__hi"))
    width = (F.col("__hi") - F.col("__lo")) / n_bins
    bin_id = F.when(width > 0, F.least(
        F.floor((F.col(col) - F.col("__lo")) / width).cast("int"), F.lit(n_bins - 1)
    )).otherwise(F.lit(0))  # all-equal column: one bin, no 0/0
    # NULLs are excluded, the standard SQL-histogram convention (min/max
    # already ignore them).  Without the filter they'd land in the TOP
    # bin: floor(NULL/width) is NULL and least(NULL, n-1) skips nulls,
    # returning n-1 (round-5 review finding).
    return (
        with_scalars(df.select(col).filter(F.col(col).isNotNull()), bounds)
        .select(bin_id.alias("bin"), "__lo", "__hi")
        .groupBy("bin", "__lo", "__hi")
        .agg(F.count("*").alias("n"))
        .select(
            "bin",
            F.round(F.col("__lo") + F.col("bin") * width, 6).alias("bin_lo"),
            F.round(F.col("__lo") + (F.col("bin") + 1) * width, 6).alias("bin_hi"),
            "n",
        )
    )


def partition_sizes(df: DataFrame) -> DataFrame:
    """Physical-partition row counts: (partition_id, n_rows) — the skew
    diagnostic.  A healthy distribution has max/median near 1; a hot
    partition (skewed key, bad repartition) jumps out immediately.
    Uses spark_partition_id() — one narrow pass, aggregates map-side."""
    return (
        df.select(F.spark_partition_id().alias("partition_id"))
        .groupBy("partition_id")
        .agg(F.count("*").alias("n_rows"))
        .orderBy("partition_id")
    )
