"""SCD2 dimension-merge semantics on a hand-made fixture."""

from __future__ import annotations

from movie_recommendation_engine_spark.operators.scd import scd2_apply


def test_scd2_close_insert_noop_and_new_keys(spark):
    dim = spark.createDataFrame(
        [
            # key 1: already has history + a current row
            (1, "gold", 10.0, "2020-01-01", "2022-01-01"),
            (1, "plat", 20.0, "2022-01-01", None),
            # key 2: current only, will receive a NO-OP update
            (2, "base", 5.0, "2020-01-01", None),
            # key 3: current only, no update at all
            (3, "base", 7.0, "2020-01-01", None),
        ],
        "k int, tier string, bal double, valid_from string, valid_to string",
    )
    updates = spark.createDataFrame(
        [
            (1, "diamond", 25.0),  # real change -> close + insert
            (2, "base", 5.0),      # no-op -> nothing happens
            (9, "new", 1.0),       # new key -> insert current
        ],
        "k int, tier string, bal double",
    )
    out = scd2_apply(dim, updates, ["k"], ["tier", "bal"], "2024-06-01")
    rows = {(r.k, r.valid_from): r for r in out.collect()}
    assert len(rows) == 6
    # history untouched
    assert rows[(1, "2020-01-01")].valid_to == "2022-01-01"
    # changed: old current closed at batch ts, new current inserted
    assert rows[(1, "2022-01-01")].valid_to == "2024-06-01"
    r1 = rows[(1, "2024-06-01")]
    assert (r1.tier, r1.bal, r1.valid_to) == ("diamond", 25.0, None)
    # no-op update and un-updated key: single open row each, unchanged
    assert rows[(2, "2020-01-01")].valid_to is None
    assert rows[(3, "2020-01-01")].valid_to is None
    # brand-new key inserted as current
    r9 = rows[(9, "2024-06-01")]
    assert (r9.tier, r9.bal, r9.valid_to) == ("new", 1.0, None)


def test_scd2_preserves_timestamp_history_column_types(spark):
    """A date/timestamp-typed dimension must keep its eff/end column
    types through the merge — the old string-literal stamps silently
    widened them to string via unionByName (round-5 review)."""
    from pyspark.sql import functions as F

    dim = spark.createDataFrame(
        [(1, "gold", "2022-01-01", None)],
        "k int, tier string, valid_from string, valid_to string",
    ).select(
        "k",
        "tier",
        F.col("valid_from").cast("date").alias("valid_from"),
        F.col("valid_to").cast("date").alias("valid_to"),
    )
    updates = spark.createDataFrame([(1, "plat"), (2, "new")], "k int, tier string")
    out = scd2_apply(dim, updates, ["k"], ["tier"], "2024-06-01")
    assert dict(out.dtypes)["valid_from"] == "date"
    assert dict(out.dtypes)["valid_to"] == "date"
    import datetime

    rows = {(r.k, r.valid_from): r for r in out.collect()}
    assert rows[(1, datetime.date(2022, 1, 1))].valid_to == datetime.date(2024, 6, 1)
    assert rows[(1, datetime.date(2024, 6, 1))].valid_to is None
    assert rows[(2, datetime.date(2024, 6, 1))].tier == "new"
    # a second apply on the result keeps the schema stable
    out2 = scd2_apply(out, updates.filter("k = 1").withColumn(
        "tier", F.lit("diamond")), ["k"], ["tier"], "2025-01-01")
    assert out2.schema == out.schema


def test_scd2_duplicate_updates_collapse_conflicts_raise(spark):
    """Exact duplicate update rows (retried message) collapse to one;
    CONFLICTING same-key updates in one batch raise instead of fanning
    the current row into multiple concurrently-open rows (round-5
    review: the one-NULL-valid_to-row-per-key invariant)."""
    import pytest

    dim = spark.createDataFrame(
        [(1, "gold", "2022-01-01", None)],
        "k int, tier string, valid_from string, valid_to string",
    )
    retried = spark.createDataFrame(
        [(1, "plat"), (1, "plat")], "k int, tier string"
    )
    out = scd2_apply(dim, retried, ["k"], ["tier"], "2024-06-01")
    open_rows = out.filter("valid_to IS NULL").collect()
    assert len(open_rows) == 1 and open_rows[0].tier == "plat"
    conflicting = spark.createDataFrame(
        [(1, "plat"), (1, "diamond")], "k int, tier string"
    )
    with pytest.raises(ValueError, match="conflicting updates"):
        scd2_apply(dim, conflicting, ["k"], ["tier"], "2024-06-01")
