"""Incremental aggregate maintenance — partial-aggregate state tables.

At 100 TB you do not recompute a rollup from scratch when a day of data
lands: you keep a STATE table of mergeable partials (count / sum / min /
max — the commutative-monoid slice of SQL aggregates) keyed by the
rollup dimensions, persist it, and fold each arriving partition into it.
The daily cost is then O(delta + |state|), independent of history size;
the naive recompute is O(history) every day and loses by the ratio of
corpus to delta (~1000x for a daily increment on a 3-year table).

The algebra here is the same one Spark itself uses inside partial
aggregation (map-side combine): each state column is a monoid

    n   : (+, 0)        sum : (+, 0)       min/max : (least/greatest)

so ``merge(state(A), state(B)) == state(A union B)`` exactly — which is
what the gated query proves, by recomputing from the full table in the
oracle while the engine answers from persisted-history-state + delta.

Sums go through DECIMAL so the partial/merge reassociation is exact
(float sums are order-dependent and would hash-diverge); averages and
other non-monoid finals are DERIVED at finalize time from the monoid
columns, never stored.

Reference parity: the reference recomputes its per-movie (mean, count)
popularity aggregate from the full ratings file on every run
(popularity_model.py:43-50); this operator is the architecture that
run would need at production scale.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

#: state columns appended to the key columns, in schema order
STATE_COLS = ("st_n", "st_sum", "st_min", "st_max")


def rollup_state(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    sum_type: str = "decimal(38,2)",
) -> DataFrame:
    """Partial-aggregate state for one batch of rows: one row per key
    group holding the mergeable partials.  ``sum_type`` must be a
    DECIMAL wide enough for the GLOBAL sum (state from this batch will
    be merged with arbitrarily many others — sizing it for the batch
    would overflow at merge time)."""
    v = F.col(value_col)
    return df.groupBy(*keys).agg(
        F.count(v).alias("st_n"),
        F.sum(v.cast(sum_type)).cast(sum_type).alias("st_sum"),
        F.min(v).alias("st_min"),
        F.max(v).alias("st_max"),
    )


def merge_states(states: list[DataFrame], keys: list[str]) -> DataFrame:
    """Fold any number of state tables into one: the monoid ops applied
    per key group.  Exactly equals ``rollup_state`` over the union of
    the underlying row sets (the pytest property), so states can be
    merged in any order/grouping — tree-merge across days, regions,
    or recovery reruns.  One shuffle keyed by the rollup dimensions;
    each input is already one row per (key, batch), so the shuffle
    carries state rows, never raw data."""
    stacked = reduce(lambda a, b: a.unionByName(b), states)
    sum_type = dict(stacked.dtypes)["st_sum"]
    return stacked.groupBy(*keys).agg(
        F.sum("st_n").alias("st_n"),
        F.sum("st_sum").cast(sum_type).alias("st_sum"),
        F.min("st_min").alias("st_min"),
        F.max("st_max").alias("st_max"),
    )


def finalize_state(state: DataFrame, keys: list[str]) -> DataFrame:
    """Derive the user-facing aggregate row from the monoid columns:
    count, exact sum, min, max, and the non-monoid mean (sum/n) that is
    only ever computed here, from exact partials."""
    return state.select(
        *keys,
        F.col("st_n").alias("n_rows"),
        F.col("st_sum").alias("total"),
        F.col("st_min").alias("vmin"),
        F.col("st_max").alias("vmax"),
        (F.col("st_sum").cast("double") / F.col("st_n")).alias("mean"),
    )
