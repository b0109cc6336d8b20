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
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__{c}_nulls"),
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
