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
