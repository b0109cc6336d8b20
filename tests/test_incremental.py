"""Incremental rollup state (operators/incremental.py) and Misra-Gries
heavy hitters (operators/sketch.py): the algebra both 100-TB
architectures rest on, checked on adversarial small data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from movie_recommendation_engine_spark.operators.incremental import (
    finalize_state,
    merge_states,
    rollup_state,
)
from movie_recommendation_engine_spark.operators.sketch import (
    mg_merge,
    mg_partition_summaries,
)


def _rows(df):
    return {tuple(r) for r in df.collect()}


@pytest.fixture(scope="module")
def batches(spark):
    rows = [
        ("a", "x", 1.25),
        ("a", "x", -3.50),
        ("a", "y", 10.00),
        ("b", "x", 0.01),
        ("b", "x", 99.99),
        ("a", "x", 7.75),
        ("b", "y", -0.02),
    ]
    df = spark.createDataFrame(rows, "k1 string, k2 string, v double")
    return df, [df.filter(F.col("v") < 0), df.filter(F.col("v") >= 0)]


def test_merge_of_split_states_equals_full_rollup(batches):
    full, parts = batches
    keys = ["k1", "k2"]
    direct = rollup_state(full, keys, "v")
    merged = merge_states([rollup_state(p, keys, "v") for p in parts], keys)
    assert _rows(direct) == _rows(merged)
    # merge order must not matter (monoid commutativity)
    swapped = merge_states([rollup_state(p, keys, "v") for p in parts[::-1]], keys)
    assert _rows(merged) == _rows(swapped)


def test_merge_with_empty_delta_is_identity(batches):
    full, _ = batches
    keys = ["k1", "k2"]
    state = rollup_state(full, keys, "v")
    empty = rollup_state(full.filter(F.lit(False)), keys, "v")
    assert _rows(merge_states([state, empty], keys)) == _rows(state)


def test_finalize_derives_mean_from_partials(batches):
    full, _ = batches
    out = finalize_state(rollup_state(full, ["k1"], "v"), ["k1"])
    got = {r["k1"]: r for r in out.collect()}
    assert got["a"]["n_rows"] == 4
    assert float(got["a"]["total"]) == pytest.approx(15.50)
    assert got["a"]["mean"] == pytest.approx(15.50 / 4)
    assert got["b"]["vmin"] == -0.02 and got["b"]["vmax"] == 99.99


def _mg_invariants_hold(spark, toks, k, n_parts):
    df = spark.createDataFrame([(t,) for t in toks], "tok string").repartition(
        n_parts
    )
    merged = mg_merge(mg_partition_summaries(df, "tok", k=k), "tok", k=k)
    est = {r["tok"]: r["mg_n"] for r in merged.collect()}
    assert len(est) <= k
    exact: dict[str, int] = {}
    for t in toks:
        exact[t] = exact.get(t, 0) + 1
    bound = 2.0 * len(toks) / (k + 1)
    for t, c in exact.items():
        e = est.get(t, 0)
        assert e <= c, f"{t}: overcount {e} > {c}"
        assert c - e <= bound, f"{t}: undercount {c - e} > {bound}"
        if c > bound:
            assert e > 0, f"heavy hitter {t} missing"


@pytest.mark.parametrize("n_parts", [1, 7])
def test_mg_bound_and_coverage_zipf(spark, n_parts):
    # Zipf-ish stream: token i appears ~N/i times; k far below distinct count
    toks = [f"t{i}" for i in range(1, 120) for _ in range(360 // i)]
    _mg_invariants_hold(spark, toks, k=8, n_parts=n_parts)


def test_mg_exact_when_under_capacity(spark):
    # fewer distinct keys than k and one partition -> no trim ever fires,
    # so the sketch IS the exact count
    toks = ["a"] * 5 + ["b"] * 3 + ["c"] * 2
    df = spark.createDataFrame([(t,) for t in toks], "tok string").coalesce(1)
    merged = mg_merge(mg_partition_summaries(df, "tok", k=10), "tok", k=10)
    assert {(r["tok"], r["mg_n"]) for r in merged.collect()} == {
        ("a", 5),
        ("b", 3),
        ("c", 2),
    }


def test_triangle_count_known_graphs(spark):
    """Oriented wedge counting on hand-checkable graphs: K4 has 4
    triangles, a star has none, duplicate/reversed input edges collapse,
    and a closed 4-cycle with one chord has exactly 2."""
    from movie_recommendation_engine_spark.operators.graph import triangle_count

    def run(pairs):
        df = spark.createDataFrame(pairs, "src int, dst int")
        return triangle_count(df).collect()[0]

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    r = run(k4)
    assert (r.n_vertices, r.n_edges, r.n_triangles) == (4, 6, 4)
    assert r.n_wedges == 12  # 4 vertices of degree 3

    star = [(0, i) for i in range(1, 6)]
    assert run(star).n_triangles == 0

    # reversed + duplicated edges and a self-loop must not change counts
    noisy = k4 + [(b, a) for a, b in k4] + k4[:3] + [(2, 2)]
    assert run(noisy).n_triangles == 4

    chordal_cycle = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
    assert run(chordal_cycle).n_triangles == 2
