"""Relational core operators (SURVEY §2.2-2.4, §2.7).

Each wrapper exists for one of two reasons: the reference realized the
semantics with an anti-scale pattern (driver collect, pandas merge) and
the engine replaces it with the distributed equivalent, or the operator
deserves a named, tested home because multiple pipelines use it.
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping

from pyspark.sql import Column, DataFrame, functions as F


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
