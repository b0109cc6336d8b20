"""Property-based tests (hypothesis) for the invariants SURVEY §5 calls
out: split disjointness/exhaustiveness/determinism on arbitrary
interaction tables, and weighted-rating shrinkage bounds."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from movie_recommendation_engine_spark.functions.weighted import weighted_rating
from movie_recommendation_engine_spark.operators.sampling import split_assign

pairs_strategy = st.lists(
    st.tuples(st.integers(1, 5), st.integers(1, 60)),
    min_size=4,
    max_size=40,
    unique=True,
)


@settings(max_examples=8, deadline=None)
@given(pairs=pairs_strategy)
def test_split_invariants_hold_for_any_table(spark_global, pairs):
    spark = spark_global
    df = spark.createDataFrame(pairs, "userId int, movieId int")
    labeled = split_assign(df, group_col="userId", key_cols=["userId", "movieId"])
    rows = labeled.collect()
    # exhaustive + disjoint: every input row appears exactly once, labeled
    assert sorted((r.userId, r.movieId) for r in rows) == sorted(pairs)
    assert all(r.split in ("validation", "test", "train") for r in rows)
    # per-group counts respect the cumulative ceil boundaries
    by_user: dict[int, dict[str, int]] = {}
    totals: dict[int, int] = {}
    for r in rows:
        by_user.setdefault(r.userId, {}).setdefault(r.split, 0)
        by_user[r.userId][r.split] += 1
        totals[r.userId] = totals.get(r.userId, 0) + 1
    for u, n in totals.items():
        got_val = by_user[u].get("validation", 0)
        got_test = by_user[u].get("test", 0)
        assert got_val == math.ceil(0.25 * n)
        assert got_val + got_test == math.ceil(0.50 * n)
    # deterministic under repartitioning
    again = split_assign(
        df.repartition(7), group_col="userId", key_cols=["userId", "movieId"]
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


@settings(max_examples=8, deadline=None)
@given(
    v=st.integers(1, 1000),
    r=st.floats(0.5, 5.0),
    floor=st.integers(1, 500),
    gm=st.floats(0.5, 5.0),
)
def test_weighted_rating_is_convex_combination(spark_global, v, r, floor, gm):
    """score = w*r + (1-w)*gm with w = v/(v+floor) in (0,1) — so the
    score always lies between the item mean and the global mean."""
    spark = spark_global
    df = spark.range(1).select(
        weighted_rating(
            F.lit(v), F.lit(r), F.lit(float(floor)), F.lit(gm)
        ).alias("s")
    )
    s = df.collect()[0].s
    lo, hi = min(r, gm), max(r, gm)
    assert lo - 1e-9 <= s <= hi + 1e-9


@settings(max_examples=6, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1,
        max_size=40,
    )
)
def test_connected_components_matches_union_find(spark_global, edges):
    """Join-based min-label propagation must agree with a driver-side
    union-find on arbitrary small graphs (self-loops and duplicate
    edges included)."""
    from movie_recommendation_engine_spark.operators.graph import connected_components

    spark = spark_global
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    want = {x: find(x) for x in parent}

    df = spark.createDataFrame(edges, "id_a int, id_b int")
    # threshold 0 forces the distributed propagation path — the point of
    # this property is propagation vs union-find, not the small-graph
    # shortcut (which IS a union-find)
    got = {r.id: r.comp for r in connected_components(df, small_graph_threshold=0).collect()}
    assert got == want
