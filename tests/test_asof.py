"""As-of join semantics on hand fixtures: backward match, exact-ts
inclusion, tie-breaking, no-match nulls, atomic payload carry."""

from __future__ import annotations

from movie_recommendation_engine_spark.operators.asof import asof_join


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        [(1, "u1", 100), (2, "u1", 200), (3, "u1", 50), (4, "u2", 100)],
        "id int, k string, t long",
    )
    right = spark.createDataFrame(
        [("u1", 100, 11, 1.0), ("u1", 150, 12, 2.0), ("u3", 10, 13, 3.0)],
        "k string, t long, rid int, rv double",
    )
    out = {
        r.id: (r.rid_right, r.rv_right)
        for r in asof_join(left, right, on="t", by=["k"], right_cols=["rid", "rv"]).collect()
    }
    assert out[1] == (11, 1.0)      # exact-ts right row matches (<=)
    assert out[2] == (12, 2.0)      # latest of the two prior rows
    assert out[3] == (None, None)   # before any right row
    assert out[4] == (None, None)   # key with no right rows at all


def test_asof_tie_break_max_wins(spark):
    left = spark.createDataFrame([(1, "u", 100)], "id int, k string, t long")
    right = spark.createDataFrame(
        [("u", 100, 5, 1.0), ("u", 100, 9, 2.0), ("u", 100, 7, 3.0)],
        "k string, t long, rid int, rv double",
    )
    row = asof_join(
        left, right, on="t", by=["k"], right_cols=["rid", "rv"], tiebreak="rid"
    ).collect()[0]
    assert (row.rid_right, row.rv_right) == (9, 2.0)


def test_asof_payload_carried_atomically(spark):
    """A right row with a null field must not donate its other fields:
    the payload struct is carried as one unit."""
    left = spark.createDataFrame([(1, "u", 300)], "id int, k string, t long")
    right = spark.createDataFrame(
        [("u", 100, 11, 1.0), ("u", 200, None, 2.0)],
        "k string, t long, rid int, rv double",
    )
    row = asof_join(left, right, on="t", by=["k"], right_cols=["rid", "rv"]).collect()[0]
    # latest right row wins wholesale — rid is its null, not 11
    assert (row.rid_right, row.rv_right) == (None, 2.0)


def test_asof_null_right_on_never_matches(spark):
    """A right row with NULL `on` sorted first ascending and used to be
    carried forward as a phantom prior match (round-5 review); it can
    never satisfy right.on <= left.on, so it is dropped up front."""
    from movie_recommendation_engine_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 5)], "k int, ts int")
    right = spark.createDataFrame(
        [(1, None, 99.0)], "k int, ts int, px double"
    )
    [r] = asof_join(left, right, on="ts", by=["k"], right_cols=["px"]).collect()
    assert r.px_right is None
