"""Second batch of randomized brute-force-equivalence properties:
degree-oriented triangle counting, SCD2 update-stream history, the
bucketed range/interval joins (including the canonical-bucket no-dup
claim), and the Count-Min never-undercount guarantee over arbitrary
key multisets."""

from __future__ import annotations

import itertools
from collections import Counter

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F, types as T

edges_strategy = st.lists(
    st.tuples(st.integers(1, 8), st.integers(1, 8)),
    min_size=1,
    max_size=24,
)


@settings(max_examples=8, deadline=None)
@given(edges=edges_strategy)
def test_triangle_count_equals_bruteforce_any_graph(spark_global, edges):
    """triangle_count == itertools enumeration on any multigraph input:
    self-loops dropped, duplicate/reversed edges collapsed, wedges =
    sum(d choose 2), each triangle counted exactly once."""
    from movie_recommendation_engine_spark.operators.graph import triangle_count

    spark = spark_global
    df = spark.createDataFrame(edges, "src int, dst int")
    row = triangle_count(df).collect()[0]

    clean = {(min(u, v), max(u, v)) for u, v in edges if u != v}
    verts = {x for e in clean for x in e}
    deg = Counter(x for e in clean for x in e)
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    triangles = sum(
        1
        for a, b, c in itertools.combinations(sorted(verts), 3)
        if (a, b) in clean and (a, c) in clean and (b, c) in clean
    )
    assert (
        row.n_vertices,
        row.n_edges,
        row.n_wedges,
        row.n_triangles,
    ) == (len(verts), len(clean), wedges, triangles)


# per-batch updates: {key -> attr value}; applied in sequence at t01..t0N
batches_strategy = st.lists(
    st.dictionaries(
        st.integers(1, 4), st.sampled_from(["a", "b", "c", None]), min_size=0, max_size=4
    ),
    min_size=1,
    max_size=5,
)


@settings(max_examples=8, deadline=None)
@given(batches=batches_strategy)
def test_scd2_update_stream_replays_history(spark_global, batches):
    """Folding any update-batch stream through scd2_apply yields a
    dimension whose point-in-time reconstruction at every batch time
    equals a dict replay: exactly one current row per ever-seen key,
    per-key intervals tile [first_seen, NULL) without overlap, and the
    active attr at each time t is the value of the last batch <= t that
    mentioned the key (no-op updates leave rows untouched)."""
    from movie_recommendation_engine_spark.operators.scd import scd2_apply

    spark = spark_global
    schema = T.StructType(
        [
            T.StructField("k", T.IntegerType()),
            T.StructField("attr", T.StringType()),
            T.StructField("valid_from", T.StringType()),
            T.StructField("valid_to", T.StringType()),
        ]
    )
    dim = spark.createDataFrame([], schema)
    times = [f"t{i + 1:02d}" for i in range(len(batches))]
    for ts, batch in zip(times, batches):
        if not batch:
            continue
        upd = spark.createDataFrame(
            [(k, v) for k, v in batch.items()], "k int, attr string"
        )
        dim = scd2_apply(dim, upd, ["k"], ["attr"], batch_ts=ts)
    rows = dim.collect()

    # dict replay of the same stream
    state: dict[int, str | None] = {}
    history: list[tuple[str, dict[int, str | None]]] = []
    for ts, batch in zip(times, batches):
        state.update(batch)
        history.append((ts, dict(state)))

    seen_keys = {k for b in batches for k in b}
    current = [r for r in rows if r.valid_to is None]
    assert sorted(r.k for r in current) == sorted(seen_keys)

    for k in seen_keys:
        spans = sorted(
            (r.valid_from, r.valid_to) for r in rows if r.k == k
        )
        # tiling: consecutive spans abut exactly; final span is open
        for (lo_a, hi_a), (lo_b, _) in zip(spans, spans[1:]):
            assert hi_a == lo_b, (k, spans)
        assert spans[-1][1] is None

    for ts, snap in history:
        active = {
            r.k: r.attr
            for r in rows
            if r.valid_from <= ts and (r.valid_to is None or r.valid_to > ts)
        }
        assert active == snap, (ts, active, snap)


intervals_strategy = st.lists(
    st.tuples(st.integers(0, 6), st.integers(0, 9)).map(
        lambda p: (min(p), max(p))
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=8, deadline=None)
@given(
    points=st.lists(st.integers(0, 10), min_size=1, max_size=12),
    intervals=intervals_strategy,
    width=st.sampled_from([1.0, 2.5, 7.0]),
)
def test_point_range_join_equals_bruteforce(spark_global, points, intervals, width):
    """bucketed_range_join == the naive theta filter for any points /
    intervals / bucket width (multiplicity preserved per input row)."""
    from movie_recommendation_engine_spark.operators.rangejoin import (
        bucketed_range_join,
    )

    spark = spark_global
    p = spark.createDataFrame(
        [(i, float(x)) for i, x in enumerate(points)], "pid int, x double"
    )
    iv = spark.createDataFrame(
        [(j, float(lo), float(hi)) for j, (lo, hi) in enumerate(intervals)],
        "iid int, lo double, hi double",
    )
    got = sorted(
        (r.pid, r.iid)
        for r in bucketed_range_join(p, iv, "x", "lo", "hi", width).collect()
    )
    want = sorted(
        (i, j)
        for i, x in enumerate(points)
        for j, (lo, hi) in enumerate(intervals)
        if lo <= x <= hi
    )
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    left=intervals_strategy,
    right=intervals_strategy,
    width=st.sampled_from([1.0, 2.5, 7.0]),
)
def test_interval_overlap_join_equals_bruteforce(spark_global, left, right, width):
    """bucketed_interval_overlap_join == the naive overlap filter, with
    each overlapping pair emitted EXACTLY once (the canonical-bucket
    dedup claim) at any bucket width."""
    from movie_recommendation_engine_spark.operators.rangejoin import (
        bucketed_interval_overlap_join,
    )

    spark = spark_global
    l = spark.createDataFrame(
        [(i, float(lo), float(hi)) for i, (lo, hi) in enumerate(left)],
        "lid int, llo double, lhi double",
    )
    r = spark.createDataFrame(
        [(j, float(lo), float(hi)) for j, (lo, hi) in enumerate(right)],
        "rid int, rlo double, rhi double",
    )
    pairs = [
        (row.lid, row.rid)
        for row in bucketed_interval_overlap_join(
            l, r, "llo", "lhi", "rlo", "rhi", width
        ).collect()
    ]
    want = sorted(
        (i, j)
        for i, (llo, lhi) in enumerate(left)
        for j, (rlo, rhi) in enumerate(right)
        if llo <= rhi and rlo <= lhi
    )
    assert len(pairs) == len(set(pairs)), "pair emitted from more than one bucket"
    assert sorted(pairs) == want


@settings(max_examples=6, deadline=None)
@given(
    keys=st.lists(st.integers(0, 30), min_size=1, max_size=60),
    width=st.sampled_from([4, 16]),
)
def test_cms_never_undercounts_any_multiset(spark_global, keys, width):
    """Count-Min one-sided error on arbitrary multisets: every
    estimate >= the true count, and with a width comfortably above the
    number of distinct keys the estimate is exact."""
    from movie_recommendation_engine_spark.operators.sketch import (
        cms_build,
        cms_estimate,
    )

    spark = spark_global
    df = spark.createDataFrame([(k,) for k in keys], "k int")
    sketch = cms_build(df, "k", depth=3, width=width)
    est = {
        r.k: r.cms_n
        for r in cms_estimate(
            sketch, df.select("k").distinct(), "k", depth=3, width=width
        ).collect()
    }
    true = Counter(keys)
    for k, n in true.items():
        assert est[k] >= n, (k, est[k], n)
    if width >= 2 * len(true):
        exact = sum(1 for k, n in true.items() if est[k] == n)
        assert exact >= len(true) - 1  # chance collisions only
