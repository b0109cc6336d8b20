"""Slowly-changing-dimension type 2 merge (warehouse dimension history).

The upsert operator (operators/upsert.py) OVERWRITES matching rows;
SCD2 instead preserves history: an incoming change CLOSES the current
row (stamps its ``valid_to``) and INSERTS a new current row.  This is
the standard dimension-table pattern a batch pipeline applies per load.

Scale shape: one shuffle join of the current slice against the update
batch on the business key (broadcast when the batch is small), plus
null-safe column comparison to detect real changes — no-op updates
must NOT spawn history rows.  Historical (already-closed) rows pass
through untouched, so at 100 TB the closed majority of the dimension
is never joined at all — filter pushdown keeps the join input to the
current slice.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    batch_ts: str,
    eff_col: str = "valid_from",
    end_col: str = "valid_to",
) -> DataFrame:
    """Apply an update batch to an SCD2 dimension table.

    ``dim`` has columns key_cols + attr_cols + eff_col + end_col
    (``end_col`` NULL marks the current row per key); ``updates`` has
    key_cols + attr_cols.  Returns the merged table:

    - closed history rows: unchanged, passed through;
    - current rows whose update differs in ANY attr (null-safe):
      closed with ``end_col = batch_ts`` plus a new current row with
      ``eff_col = batch_ts``;
    - current rows with no update or a no-op update: unchanged;
    - brand-new keys: inserted as current rows effective ``batch_ts``.

    ``batch_ts`` stamps are cast to the dimension's OWN eff/end column
    types — a timestamp/date-typed dimension must not have its history
    columns silently widened to string by the union (round-5 review).

    One row per key per batch: exact duplicate update rows (a retried
    message) are collapsed; CONFLICTING updates for the same key in one
    batch raise — applying them in one merge would fan the current row
    out into multiple concurrently-open rows, breaking the one-NULL-
    ``end_col``-row-per-key invariant every consumer depends on.  Order
    the batches (or pre-aggregate to last-write-wins) upstream instead.
    """
    eff_t = dim.schema[eff_col].dataType
    end_t = dim.schema[end_col].dataType
    hist = dim.filter(F.col(end_col).isNotNull())
    cur = dim.filter(F.col(end_col).isNull())
    # localCheckpoint BEFORE the eager conflict-count action: the merge
    # below reuses `updates`, and without the checkpoint an expensive
    # upstream updates frame would be computed twice per batch (round-5
    # advice) — same reused-frame discipline as the rest of the module
    updates = updates.select(*key_cols, *attr_cols).dropDuplicates().localCheckpoint()
    n_conflict = (
        updates.groupBy(*key_cols).count().filter(F.col("count") > 1).count()
    )
    if n_conflict:
        raise ValueError(
            f"scd2_apply: {n_conflict} key(s) have conflicting updates in one "
            "batch — split the batch into ordered loads or pre-aggregate to "
            "one row per key"
        )
    upd = updates.select(
        *key_cols,
        *[F.col(a).alias(f"__u_{a}") for a in attr_cols],
        F.lit(True).alias("__u_present"),  # robust even if every attr is NULL
    )
    joined = cur.join(upd, key_cols, "left")
    has_upd = F.col("__u_present").isNotNull()
    differs = reduce(
        lambda x, y: x | y,
        [~F.col(a).eqNullSafe(F.col(f"__u_{a}")) for a in attr_cols],
    )
    changed = joined.filter(has_upd & differs)
    unchanged = joined.filter(~(has_upd & differs)).select(*dim.columns)
    closed = changed.select(
        *key_cols,
        *attr_cols,
        F.col(eff_col),
        F.lit(batch_ts).cast(end_t).alias(end_col),
    )
    reopened = changed.select(
        *key_cols,
        *[F.col(f"__u_{a}").alias(a) for a in attr_cols],
        F.lit(batch_ts).cast(eff_t).alias(eff_col),
        F.lit(None).cast(end_t).alias(end_col),
    )
    new_keys = upd.join(cur.select(*key_cols), key_cols, "left_anti").select(
        *key_cols,
        *[F.col(f"__u_{a}").alias(a) for a in attr_cols],
        F.lit(batch_ts).cast(eff_t).alias(eff_col),
        F.lit(None).cast(end_t).alias(end_col),
    )
    return hist.unionByName(unchanged).unionByName(closed).unionByName(
        reopened
    ).unionByName(new_keys)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Change-data-capture between two table snapshots: classify every
    key as inserted / deleted / updated / unchanged — the diff step of a
    snapshot-based CDC pipeline (no change log available, only two
    loads).

    Returns key_cols + ``change_type`` ('I'|'D'|'U'|'N') + the old and
    new values of every compare column (``old_<c>`` / ``new_<c>``).

    Scale shape: ONE full-outer shuffle join on the key — both snapshots
    hash-partition by key, the comparison itself is a null-safe column
    expression inside the join's project (no second pass, no window).
    Column comparison uses ``eqNullSafe`` so NULL -> value and
    value -> NULL both count as updates.
    """
    o = old.select(*key_cols, *compare_cols).alias("o")
    n = new.select(*key_cols, *compare_cols).alias("n")
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}")) for k in key_cols],
    )
    # full-outer on eqNullSafe keys: a key present on either side yields
    # exactly one row; presence is detected with per-side marker columns
    # (key columns themselves can be NULL-valued in theory)
    oj = o.withColumn("__in_old", F.lit(True))
    nj = n.withColumn("__in_new", F.lit(True))
    j = oj.join(nj, cond, "full_outer")
    changed = reduce(
        lambda a, b: a | b,
        [~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}")) for c in compare_cols],
    )
    change_type = (
        F.when(F.col("__in_old").isNull(), F.lit("I"))
        .when(F.col("__in_new").isNull(), F.lit("D"))
        .when(changed, F.lit("U"))
        .otherwise(F.lit("N"))
    )
    keys = [
        F.coalesce(F.col(f"o.{k}"), F.col(f"n.{k}")).alias(k) for k in key_cols
    ]
    vals = [c for cc in compare_cols for c in (
        F.col(f"o.{cc}").alias(f"old_{cc}"),
        F.col(f"n.{cc}").alias(f"new_{cc}"),
    )]
    return j.select(*keys, change_type.alias("change_type"), *vals)
