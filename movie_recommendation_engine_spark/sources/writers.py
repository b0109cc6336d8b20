"""Sinks (SURVEY §2.1 S4, S6).

The reference wrote splits as headered CSV from pandas
(new_split_script.py:16-18); at 100 TB the engine's default sink is
partitioned Parquet.  CSV remains for interchange parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink (one object per line — the splittable layout;
    never write one giant JSON array, it cannot be read in parallel)."""
    df.write.mode(mode).json(path)


def write_text(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Plain-text sink: one line per row from a single string column —
    the log/flat-file interchange format.  Lines are schema-free, so
    the writer demands the caller has already serialized the row."""
    df.write.mode(mode).text(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (zlib default): the second columnar interchange format —
    same predicate-pushdown/column-pruning story as parquet (ORC stripe
    + row-group indexes), natively supported by Spark's vectorized
    reader, common when landing data for Hive/Trino consumers."""
    df.write.mode(mode).orc(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Partition-pruned layout: one directory per partition value.

    This is how the split tables should land at scale — a single write
    with ``partitionBy('split')`` instead of three separate jobs, and
    readers filtering on the split column get partition pruning for free.
    """
    df.write.mode(mode).partitionBy(*partition_by).format(fmt).save(path)


def write_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Range-clustered parquet: rows range-partitioned THEN sorted
    within each file, so every row group's min/max statistics cover a
    narrow, non-overlapping slice of the sort key.

    Parquet readers (Spark included) skip whole row groups whose
    [min, max] cannot satisfy a pushed predicate — on a randomly-laid
    table every row group spans the full key range and nothing skips;
    on a range-clustered table a selective range predicate touches only
    the few row groups that overlap it.  At 100 TB this zone-map
    skipping is the difference between scanning terabytes and scanning
    gigabytes for time-range / id-range queries on the cluster key.

    ``repartitionByRange`` samples the key to build balanced ranges —
    one shuffle, same cost class as any global sort.
    """
    out = (
        df.repartitionByRange(n_files, *sort_cols)
        if n_files
        else df.repartitionByRange(*sort_cols)
    )
    out.sortWithinPartitions(*sort_cols).write.mode(mode).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table — the co-located-join layout.

    Two tables bucketed by the same key into the same bucket count join
    WITHOUT a shuffle (Exchange disappears from the plan; at 100 TB the
    fact⋈fact shuffle is usually the single largest cost in the job).
    Requires saveAsTable (bucket metadata lives in the catalog).
    """
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def zorder_key(df: DataFrame, cols: list[str], bits: int = 16):
    """Z-order (Morton) key column over 2+ numeric columns.

    Each column is min-max scaled to ``bits`` bits with a broadcast
    one-row aggregate (no driver collect), then the bit strings are
    interleaved: bit b of column i lands at position b*n_cols + i.  The
    result is a single long whose ordering clusters rows that are close
    in EVERY dimension — the multi-column generalization of the
    single-key range clustering in :func:`write_sorted`.  Min-max
    scaling assumes roughly uniform keys; for heavily skewed columns
    substitute a rank (ntile) per column before calling.

    Returns (df_with_bounds, key_column) — the caller attaches the key
    and drops the bound columns after layout.
    """
    from pyspark.sql import functions as F

    from ..operators.relational import with_scalars

    if len(cols) < 2:
        raise ValueError("z-ordering needs at least two columns")
    if bits * len(cols) > 62:
        raise ValueError("bits * n_cols must fit in a signed long")
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__zmin_{c}"), F.max(c).alias(f"__zmax_{c}")]
    bounded = with_scalars(df, df.agg(*aggs))
    top = (1 << bits) - 1
    key = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        lo, hi = F.col(f"__zmin_{c}"), F.col(f"__zmax_{c}")
        span = (hi - lo).cast("double")
        scaled = F.when(span > 0, ((F.col(c) - lo) / span * top).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        for b in range(bits):
            key = key + F.shiftleft(
                F.getbit(scaled, F.lit(b)).cast("long"), b * len(cols) + i
            )
    return bounded, key


def write_zorder(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered parquet: rows range-partitioned and sorted by
    the interleaved Morton key, so row-group [min, max] zone maps are
    narrow on EVERY z-ordered column at once.

    ``write_sorted`` gives perfect skipping on its leading key and none
    on the others; z-ordering trades a little per-column locality for
    locality on all dimensions — the standard layout for tables queried
    by several independent selective predicates (at 100 TB: cuts both
    "by part" and "by supplier" scans without storing the table twice).
    """
    bounded, key = zorder_key(df, cols, bits)
    out = bounded.withColumn("__zkey", key)
    out = (
        out.repartitionByRange(n_files, "__zkey")
        if n_files
        else out.repartitionByRange("__zkey")
    )
    out.sortWithinPartitions("__zkey").drop(
        "__zkey", *[f"__zmin_{c}" for c in cols], *[f"__zmax_{c}" for c in cols]
    ).write.mode(mode).parquet(path)


def compact_parquet(
    spark,
    src: str,
    dst: str,
    target_file_mb: int = 512,
    mode: str = "overwrite",
) -> int:
    """Compact a small-files parquet table into ~target-sized files.

    The small-file problem is an operational fact of incremental
    ingestion (every micro-batch lands a file; a year of 5-minute
    batches is 100k files whose footers alone slow planning).  Sizing
    from the actual on-disk bytes, the data is rewritten through
    ``coalesce`` — a narrow dependency, no shuffle: each output file
    concatenates whole input partitions.  Use ``repartition`` instead
    when the table also needs re-clustering (write_sorted /
    write_zorder already cover that).  Returns the file count written.
    """
    import math
    import os

    total = 0
    for root, _dirs, files in os.walk(src):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    n_files = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    spark.read.parquet(src).coalesce(n_files).write.mode(mode).parquet(dst)
    return n_files
