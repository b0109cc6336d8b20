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

    The output column keeps integral inputs as BIGINT and everything
    else (double/decimal) in its window-sum type — the old
    unconditional long cast silently truncated fractional running sums
    (round-5 review).
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
    from pyspark.sql import types as T

    total = F.col("__off") + F.col("__run")
    if isinstance(
        df.schema[value_col].dataType,
        (T.ByteType, T.ShortType, T.IntegerType, T.LongType),
    ):
        total = total.cast("long")
    return (
        base.withColumn("__run", F.sum(value_col).over(w))
        .withColumn("__pid", pid)
        .join(F.broadcast(offsets), "__pid")
        .withColumn(cumsum_col, total)
        .drop("__pid", "__mid", "__run", "__off")
    )


def global_cummax_strict(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "strict_cummax",
    descending: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Strict-prefix running max over a global order without a
    single-partition window — the max-monoid sibling of
    ``global_cumsum`` (same three scale-out pieces: range partition,
    per-partition window keyed by the physical partition id, bounded
    triangular offset join).

    For each row, ``out_col`` = max(value_col) over all rows STRICTLY
    before it in the global order (NULL for the global first row) — the
    primitive behind staircase/skyline computations, where "before"
    means "strictly better on the sort dimension".

    ``order_col`` must be a total order (callers pre-aggregate to one
    row per key, e.g. max(value) per distinct order value).  The frame
    excludes the current row, so equal-order peers never see each other
    — callers handle peer semantics in their own aggregate.
    """
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    key = F.col(order_col).desc() if descending else F.col(order_col).asc()
    base = (
        df.repartitionByRange(n, key)
        .sortWithinPartitions(key)
        .withColumn("__mid", F.monotonically_increasing_id())
        .localCheckpoint(eager=False)
    )
    pid = F.shiftright("__mid", 33)
    # per-partition maxima -> strict offsets: partition p's offset is the
    # max over all EARLIER partitions (NULL for the first) — a
    # #partitions^2 triangular join, never a data-sized window
    totals = base.groupBy(pid.alias("__pid")).agg(F.max(value_col).alias("__tot"))
    offsets = (
        totals.alias("x")
        .join(totals.alias("y"), F.col("y.__pid") < F.col("x.__pid"), "left")
        .groupBy(F.col("x.__pid").alias("__pid"))
        .agg(F.max(F.col("y.__tot")).alias("__off"))
    )
    w = (
        Window.partitionBy(pid)
        .orderBy(key)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    run = F.max(value_col).over(w)
    return (
        base.withColumn("__run", run)
        .withColumn("__pid", pid)
        .join(F.broadcast(offsets), "__pid")
        # greatest() skips NULLs: NULL only when both prefix pieces are
        # empty, i.e. the global first row
        .withColumn(out_col, F.greatest(F.col("__run"), F.col("__off")))
        .drop("__pid", "__mid", "__run", "__off")
    )


def pareto_frontier_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Skyline (Pareto-frontier) of a 2-D maximize/maximize objective:
    rows not dominated by any other row (q dominates p iff q >= p on
    both dimensions and > on at least one).

    The naive definition is an O(n^2) NOT EXISTS self-join (what the
    DuckDB oracle runs); the 2-D structure admits a staircase plan that
    is three shuffles total and survives any n:

    1. ``max(y)`` per distinct x — one hash aggregate;
    2. strict-prefix running max of that over x DESC via
       ``global_cummax_strict`` (range partition + bounded offsets — no
       single-partition WindowExec);
    3. a row survives iff  y == max(y among its x-peers)  AND
       y > max(y over all strictly-greater x)  (exact-duplicate points
       all survive: neither dominates the other).
    """
    sm = df.groupBy(F.col(x_col).alias("__x")).agg(F.max(y_col).alias("__peer_mx"))
    sm = global_cummax_strict(
        sm, "__x", "__peer_mx", out_col="__strict_mx",
        descending=True, num_partitions=num_partitions,
    )
    # the distinct-x table can approach data size (continuous x), so this
    # is a plain shuffle join on x, not a broadcast
    j = df.join(sm, F.col(x_col) == F.col("__x"))
    return (
        j.filter(
            (F.col(y_col) == F.col("__peer_mx"))
            & (F.col("__strict_mx").isNull() | (F.col(y_col) > F.col("__strict_mx")))
        )
        .drop("__x", "__peer_mx", "__strict_mx")
    )
