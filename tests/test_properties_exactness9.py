"""Ninth batch: the state-maintenance and shuffle-shape operators vs
sequential references on arbitrary inputs — incremental rollup state
(merge of any batch partitioning == one-shot rollup, in any merge
order), keyed upsert (== last-writer-wins dict replay), top-k per
group / global (== sorted-slice reference under a total order), and
salted aggregation (== the plain unsalted groupBy it decomposes).

These are the operators whose correctness claims are ALGEBRAIC
("merge(state(A), state(B)) == state(A ∪ B)", "salting never changes
an algebraic aggregate") — exactly the claims a randomized partition /
replay reference can falsify where a fixed example cannot.
"""

from __future__ import annotations

from decimal import Decimal

from hypothesis import given, settings, strategies as st

rows_strategy = st.lists(
    st.tuples(st.integers(1, 4), st.integers(-10_000, 10_000)),  # (key, cents)
    min_size=1,
    max_size=40,
)


@settings(max_examples=8, deadline=None)
@given(
    rows=rows_strategy,
    cuts=st.lists(st.integers(0, 39), min_size=0, max_size=3),
    order=st.randoms(use_true_random=False),
)
def test_merge_states_equals_one_shot_rollup(spark_global, rows, cuts, order):
    """Split the row set at arbitrary points into 1-4 batches, build a
    state table per batch, merge in a random order — finalize must equal
    the one-shot rollup over all rows (the monoid contract the module
    docstring stakes, including exact DECIMAL sums and derived mean)."""
    from movie_recommendation_engine_spark.operators.incremental import (
        finalize_state,
        merge_states,
        rollup_state,
    )

    spark = spark_global
    data = [(k, Decimal(c) / 100) for k, c in rows]
    schema = "k long, v decimal(9,2)"

    bounds = sorted({c for c in cuts if c < len(rows)})
    pieces, prev = [], 0
    for b in [*bounds, len(rows)]:
        if b > prev:
            pieces.append(data[prev:b])
            prev = b
    order.shuffle(pieces)

    states = [
        rollup_state(spark.createDataFrame(p, schema), ["k"], "v") for p in pieces
    ]
    merged = finalize_state(merge_states(states, ["k"]), ["k"])
    oneshot = finalize_state(
        rollup_state(spark.createDataFrame(data, schema), ["k"], "v"), ["k"]
    )

    def canon(df):
        return {
            r.k: (r.n_rows, r.total, r.vmin, r.vmax, r.mean) for r in df.collect()
        }

    assert canon(merged) == canon(oneshot)


@settings(max_examples=8, deadline=None)
@given(
    base=st.lists(
        st.tuples(st.integers(1, 6), st.integers(0, 100)), min_size=0, max_size=12
    ),
    updates=st.lists(
        st.tuples(st.integers(1, 6), st.integers(0, 100)), min_size=0, max_size=12
    ),
)
def test_upsert_matches_last_writer_wins_replay(spark_global, base, updates):
    """upsert == dict replay: base keys deduped to one row each (made
    unique by construction), every update key overrides, collisions
    within updates resolve to the greatest order_col value."""
    from movie_recommendation_engine_spark.operators.upsert import upsert

    spark = spark_global
    # make base keys unique (an upsert base is a keyed table) and give
    # updates a strict writer order via their list position
    base_rows = list({k: (k, v, -1) for k, v in base}.values())
    upd_rows = [(k, v, i) for i, (k, v) in enumerate(updates)]
    schema = "k long, v long, ord long"

    if not base_rows and not upd_rows:
        return
    got = {
        (r.k): (r.v, r.ord)
        for r in upsert(
            spark.createDataFrame(base_rows or [], schema)
            if base_rows
            else spark.createDataFrame([], schema),
            spark.createDataFrame(upd_rows or [], schema)
            if upd_rows
            else spark.createDataFrame([], schema),
            ["k"],
            order_col="ord",
        ).collect()
    }

    want = {k: (v, o) for k, v, o in base_rows}
    for k, v, o in upd_rows:  # ascending ord: later wins, == greatest ord
        want[k] = (v, o)
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(1, 3), st.integers(-50, 50)),
        min_size=1,
        max_size=30,
    ),
    k=st.integers(1, 5),
)
def test_top_k_per_group_matches_sorted_slice(spark_global, rows, k):
    """Under a total order (v desc, id asc), top_k_per_group == the
    first k of each group's sorted list — exactly, including ranks."""
    from pyspark.sql import functions as F

    from movie_recommendation_engine_spark.operators.topk import top_k_per_group

    spark = spark_global
    data = [(g, v, i) for i, (g, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "g long, v long, id long")
    got = sorted(
        (r.g, r.rank, r.v, r.id)
        for r in top_k_per_group(
            df, ["g"], [F.col("v").desc(), F.col("id").asc()], k, keep_rank=True
        ).collect()
    )

    by_g: dict[int, list[tuple[int, int]]] = {}
    for g, v, i in data:
        by_g.setdefault(g, []).append((v, i))
    want = sorted(
        (g, rank + 1, v, i)
        for g, vs in by_g.items()
        for rank, (v, i) in enumerate(sorted(vs, key=lambda t: (-t[0], t[1]))[:k])
    )
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(-50, 50), st.integers(0, 10**6)),
        min_size=1,
        max_size=30,
    ),
    k=st.integers(1, 7),
)
def test_top_k_global_matches_sorted_slice(spark_global, rows, k):
    from pyspark.sql import functions as F

    from movie_recommendation_engine_spark.operators.topk import top_k_global

    spark = spark_global
    data = [(v, i) for i, (v, _) in enumerate(rows)]
    df = spark.createDataFrame(data, "v long, id long")
    got = [
        (r.v, r.id)
        for r in top_k_global(df, [F.col("v").desc(), F.col("id").asc()], k).collect()
    ]
    want = sorted(data, key=lambda t: (-t[0], t[1]))[:k]
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 9), st.integers(-1000, 1000)),
        min_size=1,
        max_size=40,
    ),
    n_salts=st.sampled_from([1, 2, 16]),
)
def test_salted_agg_equals_plain_agg(spark_global, rows, n_salts):
    """The salting decomposition is invisible: for every algebraic
    aggregate and any salt width (including the degenerate n_salts=1),
    salted_agg == plain groupBy on the same rows."""
    from pyspark.sql import functions as F

    from movie_recommendation_engine_spark.operators.skew import salted_agg

    spark = spark_global
    df = spark.createDataFrame(rows, "k long, s long, v long")
    aggs = {
        "n": ("v", "count"),
        "total": ("v", "sum"),
        "vmin": ("v", "min"),
        "vmax": ("v", "max"),
    }
    got = {
        r.k: (r.n, r.total, r.vmin, r.vmax)
        for r in salted_agg(df, ["k"], ["s"], aggs, n_salts=n_salts).collect()
    }
    want = {
        r.k: (r.n, r.total, r.vmin, r.vmax)
        for r in df.groupBy("k")
        .agg(
            F.count("v").alias("n"),
            F.sum("v").alias("total"),
            F.min("v").alias("vmin"),
            F.max("v").alias("vmax"),
        )
        .collect()
    }
    assert got == want
