"""Keyed upsert (batch MERGE) — updates override base rows, new keys
append; last-writer-wins within the update set.

Plain open-source Spark has no MERGE INTO (that's a table-format
feature); the engine expresses the same semantics relationally:

1. tag base rows priority 0, update rows priority 1 (and an optional
   ``order_col`` orders writers *within* the update set);
2. one window per key ordered by (priority desc, order_col desc) keeps
   exactly the winning row.

Cost: one hash exchange on the key over |base| + |updates| rows — the
same as the join a MERGE would run, with no table-format dependency.
At scale, partition the base by key range and only rewrite partitions
that received updates (partition pruning on the update key range).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    order_col: str | None = None,
) -> DataFrame:
    """Merge ``updates`` into ``base`` by ``keys`` (schemas must match).

    A key present in both keeps the update row; duplicate keys inside
    ``updates`` resolve to the greatest ``order_col`` (tie: arbitrary
    but deterministic only with order_col — pass one when updates can
    collide).  Output schema = input schema.

    PRECONDITION: ``base`` is a KEYED table — at most one row per key.
    The per-key window keeps exactly one winner, so duplicate-key base
    rows would be collapsed even for keys no update touches (a MERGE
    over such a base is ill-defined; Delta/Iceberg MERGE errors on it).
    """
    cols = base.columns
    assert set(cols) == set(updates.columns), "upsert requires matching schemas"
    tagged = base.select(*cols).withColumn("__pri", F.lit(0)).unionByName(
        updates.select(*cols).withColumn("__pri", F.lit(1))
    )
    order = [F.col("__pri").desc()]
    if order_col is not None:
        order.append(F.col(order_col).desc())
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__pri", "__rn")
    )
