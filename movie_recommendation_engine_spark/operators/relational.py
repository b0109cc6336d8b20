"""Relational core operators (SURVEY §2.2-2.4, §2.7).

Each wrapper exists for one of two reasons: the reference realized the
semantics with an anti-scale pattern (driver collect, pandas merge) and
the engine replaces it with the distributed equivalent, or the operator
deserves a named, tested home because multiple pipelines use it.
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping

from pyspark.sql import Column, DataFrame, Window, functions as F


def with_scalars(df: DataFrame, scalars: DataFrame) -> DataFrame:
    """Attach a one-row aggregate to every row without a driver collect.

    The reference computes global scalars (global mean, 90th-percentile
    count floor) with two eager ``collect()`` jobs and re-injects them as
    literals (reference popularity_model.py:49-51,55).  That is two extra
    driver round-trips per scalar and breaks plan fusion.  A crossJoin
    against a broadcast one-row aggregate keeps the whole thing lazy: one
    job, no driver in the loop (SURVEY §4.2 "scalar re-entry").
    """
    return df.crossJoin(F.broadcast(scalars))


def case_when_in(
    col: Column | str,
    mapping: Mapping[str, Iterable],
    default: str | None = None,
) -> Column:
    """CASE WHEN col IN (...) THEN label chain (reference split_script.py:40)."""
    c = F.col(col) if isinstance(col, str) else col
    expr: Column | None = None
    for label, values in mapping.items():
        cond = c.isin(list(values))
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    assert expr is not None, "mapping must be non-empty"
    return expr.otherwise(F.lit(default))


def anti_join(left: DataFrame, right: DataFrame, on: list[str]) -> DataFrame:
    """left ∖ right by key — replaces the reference's pandas outer-merge +
    `_merge == 'left_only'` mask (new_split_script.py:8-9,13-14)."""
    return left.join(right, on, "left_anti")


def semi_join(left: DataFrame, right: DataFrame, on: list[str]) -> DataFrame:
    """Rows of left whose key exists in right (disjointness checks, X2)."""
    return left.join(right, on, "left_semi")


def except_all(left: DataFrame, right: DataFrame) -> DataFrame:
    """Multiset difference (reference split_script.py:46)."""
    return left.exceptAll(right)


def is_disjoint(a: DataFrame, b: DataFrame, on: list[str]) -> bool:
    """True when a and b share no key — the distributed version of the
    reference's sparse elementwise-product nnz==0 assert
    (extension.py:150-152).  Executes one semi-join count."""
    return semi_join(a, b, on).limit(1).count() == 0


def distinct_values(df: DataFrame, col: str) -> DataFrame:
    """Distinct values of one column, kept distributed (the reference
    pulled these to the driver via toPandas, split_script.py:24,27)."""
    return df.select(col).distinct()


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """1-based global rank over a TOTAL order without a single-partition
    window.

    A bare ``row_number() OVER (ORDER BY ...)`` funnels the whole table
    through ONE WindowExec partition — the classic scale cliff.  Here
    the rank is assembled from pieces that all scale out:

    1. ``repartitionByRange`` on the order key (the same exchange a
       global sort uses) + ``sortWithinPartitions``;
    2. ``monotonically_increasing_id`` over the sorted partitions — its
       value is (partition id << 33) | local row index, so partition id
       and the dense local index come out of one narrow projection,
       no per-partition window needed;
    3. per-partition row counts (one row per partition) turned into
       cumulative offsets with a triangular self-join — bounded
       #partitions^2 rows, so the plan contains NO WindowExec at all;
    4. broadcast-join the offsets back: rank = offset + local_idx + 1.

    The id-stamped frame is localCheckpointed so the nondeterministic id
    assignment is materialized once and both consumers (offset aggregate,
    final join) read the same values.  ``order_cols`` must be a total
    order (append a unique tiebreak column); otherwise ranks inside a tie
    group depend on partition-internal order.
    """
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    base = (
        df.repartitionByRange(n, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("__mid", F.monotonically_increasing_id())
        .localCheckpoint(eager=False)
    )
    pid = F.shiftright("__mid", 33)
    idx = F.col("__mid").bitwiseAND(F.lit((1 << 33) - 1))
    counts = base.groupBy(pid.alias("__pid")).agg(F.count("*").alias("__cnt"))
    offsets = (
        counts.alias("x")
        .join(counts.alias("y"), F.col("y.__pid") < F.col("x.__pid"), "left")
        .groupBy(F.col("x.__pid").alias("__pid"))
        .agg(F.sum(F.coalesce(F.col("y.__cnt"), F.lit(0))).alias("__off"))
    )
    return (
        base.withColumn("__pid", pid)
        .join(F.broadcast(offsets), "__pid")
        .withColumn(rank_col, (F.col("__off") + idx + 1).cast("long"))
        .drop("__pid", "__mid", "__off")
    )


def global_cumsum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    cumsum_col: str = "cumsum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global running sum over a TOTAL order without a single-partition
    window — the prefix-sum twin of ``global_rank`` (same three scale-out
    pieces):

    1. range-partition + sort on the order key;
    2. the intra-partition running sum IS parallel: a window partitioned
       by the physical partition id runs one task per partition, exactly
       the layout the sort already produced;
    3. per-partition TOTALS fold to cumulative offsets via the bounded
       triangular self-join (#partitions^2 rows, no WindowExec over
       data), broadcast back, and
       ``cumsum = partition_offset + local_running_sum``.

    ``order_cols`` must be a total order.  This is the sequence-packing
    primitive: token offsets over a corpus ordered by doc id, at any
    corpus size.
    """
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    base = (
        df.repartitionByRange(n, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("__mid", F.monotonically_increasing_id())
        .localCheckpoint(eager=False)
    )
    pid = F.shiftright("__mid", 33)
    totals = base.groupBy(pid.alias("__pid")).agg(
        F.sum(value_col).alias("__tot")
    )
    offsets = (
        totals.alias("x")
        .join(totals.alias("y"), F.col("y.__pid") < F.col("x.__pid"), "left")
        .groupBy(F.col("x.__pid").alias("__pid"))
        .agg(F.sum(F.coalesce(F.col("y.__tot"), F.lit(0))).alias("__off"))
    )
    w = (
        Window.partitionBy(pid)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        base.withColumn("__run", F.sum(value_col).over(w))
        .withColumn("__pid", pid)
        .join(F.broadcast(offsets), "__pid")
        .withColumn(cumsum_col, (F.col("__off") + F.col("__run")).cast("long"))
        .drop("__pid", "__mid", "__run", "__off")
    )
