"""Declarative data-quality audit (constraint checking over a table).

The reference's only correctness tooling is ad-hoc asserts and show()
inspection (SURVEY §5); production pipelines need table-level contracts
— this module compiles a rule list into the *minimum* number of Spark
jobs:

- all row-level rules (not_null / accepted_values / in_range / custom
  predicate) fuse into ONE aggregate pass over the scan — a single
  projection of conditional sums, so auditing 50 rules costs the same
  scan as auditing one;
- ``is_unique`` needs a shuffle on the key (duplicate groups);
- ``refers_to`` is a broadcast-able anti-join against the parent keys.

Output: (rule, violations) — one row per rule, 0 = contract holds.
At 100 TB the fused row-level pass dominates everything else, and it is
pure column arithmetic inside whole-stage codegen.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable

from pyspark.sql import Column, DataFrame, functions as F


@dataclass(frozen=True)
class Rule:
    name: str
    kind: str  # "row" | "unique" | "ref"
    predicate: Column | None = None  # row kind: TRUE means VIOLATION
    cols: tuple[str, ...] = ()
    parent: DataFrame | None = None
    parent_col: str | None = None


def not_null(col: str) -> Rule:
    return Rule(f"not_null({col})", "row", F.col(col).isNull())


def accepted_values(col: str, values: Iterable[str]) -> Rule:
    vals = list(values)
    return Rule(
        f"accepted_values({col})", "row", ~F.col(col).isin(vals) | F.col(col).isNull()
    )


def in_range(col: str, lo, hi) -> Rule:
    return Rule(
        f"in_range({col},{lo},{hi})",
        "row",
        F.col(col).isNull() | (F.col(col) < lo) | (F.col(col) > hi),
    )


def satisfies(name: str, ok: Column) -> Rule:
    """Custom row contract: ``ok`` is the column that must hold."""
    return Rule(f"satisfies({name})", "row", ~F.coalesce(ok, F.lit(False)))


def is_unique(*cols: str) -> Rule:
    return Rule(f"unique({','.join(cols)})", "unique", None, tuple(cols))


def refers_to(col: str, parent: DataFrame, parent_col: str) -> Rule:
    """Referential integrity: every child key exists in the parent."""
    return Rule(f"refers_to({col})", "ref", None, (col,), parent, parent_col)


def audit(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate every rule; returns (rule, violations) with one row per
    rule.  Row-level rules share a single aggregate job."""
    parts: list[DataFrame] = []

    row_rules = [r for r in rules if r.kind == "row"]
    if row_rules:
        agg = df.agg(
            *[
                F.sum(F.when(r.predicate, 1).otherwise(0)).alias(f"v{i}")
                for i, r in enumerate(row_rules)
            ]
        )
        melted = agg.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r.name).alias("rule"),
                            F.coalesce(F.col(f"v{i}"), F.lit(0))
                            .cast("long")
                            .alias("violations"),
                        )
                        for i, r in enumerate(row_rules)
                    ]
                )
            ).alias("r")
        ).select("r.rule", "r.violations")
        parts.append(melted)

    for r in rules:
        if r.kind == "unique":
            # violations = extra copies beyond the first per duplicated key
            dup = (
                df.groupBy(*r.cols)
                .agg(F.count("*").alias("cnt"))
                .filter(F.col("cnt") > 1)
                .agg(
                    F.coalesce(F.sum(F.col("cnt") - 1), F.lit(0))
                    .cast("long")
                    .alias("violations")
                )
                .select(F.lit(r.name).alias("rule"), "violations")
            )
            parts.append(dup)
        elif r.kind == "ref":
            orphans = (
                df.join(
                    r.parent.select(F.col(r.parent_col).alias(r.cols[0])).distinct(),
                    list(r.cols),
                    "left_anti",
                )
                .agg(F.count("*").cast("long").alias("violations"))
                .select(F.lit(r.name).alias("rule"), "violations")
            )
            parts.append(orphans)

    if not parts:
        # degenerate-input contract: an empty (or fully filtered) rule
        # list yields an empty (rule, violations) frame, never IndexError
        return df.sparkSession.createDataFrame(
            [], "rule string, violations long"
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
