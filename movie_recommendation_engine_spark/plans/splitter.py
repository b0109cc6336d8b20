"""Train/validation/test splitter — reference E3 at cluster scale.

The reference's working splitter is pandas-on-one-machine
(new_split_script.py): per-user 25% -> validation, 25% of remainder ->
test, remainder -> train, written as three CSVs.  Its deprecated Spark
predecessor (split_script.py) was broken (lexicographic userId sort —
SURVEY §2.13.4).

Engine version (SURVEY §7.2 M1): one window pass assigns every row a
split label from its content hash (operators.sampling.split_assign) —
deterministic across partitionings, disjoint & exhaustive by
construction, every user in every split.  Writing uses
``partitionBy(split)`` so downstream readers get partition pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.sampling import split_assign
from ..sources.writers import write_partitioned


def split_ratings(
    ratings: DataFrame,
    user_col: str = "userId",
    key_cols: list[str] | None = None,
    fractions: dict[str, float] | None = None,
    split_col: str = "split",
) -> DataFrame:
    """Label every rating train/validation/test, 25/25/50 per user."""
    key_cols = key_cols or [user_col, "movieId"]
    return split_assign(
        ratings,
        group_col=user_col,
        key_cols=key_cols,
        fractions=fractions,
        split_col=split_col,
    )


def split_and_write(ratings: DataFrame, path: str, **kwargs) -> DataFrame:
    """Assign splits and persist a single partitioned dataset (one job —
    not the reference's three separate CSV writes)."""
    labeled = split_ratings(ratings, **kwargs)
    write_partitioned(labeled, path, partition_by=[kwargs.get("split_col", "split")])
    return labeled
