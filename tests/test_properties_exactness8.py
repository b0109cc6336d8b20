"""Eighth batch: the Arrow grouped-map operators vs sequential
references on arbitrary groups — the per-group median (multiset
function, (a+b)/2 even-size rule) and the trimmed mean's exactness
contract (integer cents, total-order trim cut, exact int64 sum, one
division, det-round)."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st

groups_strategy = st.lists(
    st.tuples(st.integers(1, 3), st.integers(0, 10_000)),  # (group, cents)
    min_size=1,
    max_size=40,
)


@settings(max_examples=8, deadline=None)
@given(rows=groups_strategy)
def test_arrow_grouped_median_matches_reference(spark_global, rows):
    from movie_recommendation_engine_spark.operators.arrowops import (
        grouped_value_stats_arrow,
    )

    spark = spark_global
    df = spark.createDataFrame(
        [(g, c / 100.0) for g, c in rows], "g long, v double"
    )
    got = {
        r.g: (r.n, r.median_value, r.min_value, r.max_value)
        for r in grouped_value_stats_arrow(df, "g", "v").collect()
    }

    by_g: dict[int, list[float]] = {}
    for g, c in rows:
        by_g.setdefault(g, []).append(c / 100.0)
    def r6(x: float) -> float:  # the operator half-up-rounds to 6 dp
        return math.floor(x * 1e6 + 0.5) / 1e6

    for g, vs in by_g.items():
        vs.sort()
        n = len(vs)
        mid = n // 2
        med = vs[mid] if n % 2 else (vs[mid - 1] + vs[mid]) / 2.0
        assert got[g] == (n, r6(med), r6(vs[0]), r6(vs[-1])), (g, got[g], vs)
    assert set(got) == set(by_g)


@settings(max_examples=8, deadline=None)
@given(rows=groups_strategy, trim=st.sampled_from([0.1, 0.25]))
def test_arrow_trimmed_mean_matches_reference(spark_global, rows, trim):
    from movie_recommendation_engine_spark.operators.arrowops import (
        grouped_trimmed_mean_arrow,
    )

    spark = spark_global
    df = spark.createDataFrame(
        [(g, c / 100.0) for g, c in rows], "g long, v double"
    )
    got = {
        r.g: (r.n, r.n_trimmed_each, r.trimmed_mean_r6)
        for r in grouped_trimmed_mean_arrow(df, "g", "v", trim=trim).collect()
    }

    by_g: dict[int, list[int]] = {}
    for g, c in rows:
        by_g.setdefault(g, []).append(c)
    for g, cents in by_g.items():
        cents.sort()
        n = len(cents)
        k = math.floor(trim * n)
        kept = cents[k : n - k] if n - 2 * k > 0 else []
        if kept:
            m = float(sum(kept)) / len(kept) / 100.0
            r6 = math.floor(m * 1e6 + 0.5) / 1e6
        else:
            r6 = 0.0
        assert got[str(g)] == (n, k, r6), (g, got[str(g)], (n, k, r6))
    assert set(got) == {str(g) for g in by_g}
