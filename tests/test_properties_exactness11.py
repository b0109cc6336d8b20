"""Eleventh batch: the deterministic samplers vs exact Python replays.

Every engine sampler derives its randomness from the md5 content hash
(partitioning-independent by construction), which makes the SELECTED
ROW SET itself — not just its size — exactly replayable in plain
Python: recompute each row's uniform hash with hashlib, sort, slice.
These properties pin the full selection contract: exact per-group
counts (ceil(f*n), every group represented), strict-< Bernoulli
acceptance per stratum, and the integer-weight mixture allocation
k_c = w_c * min_c(n_c div w_c) including the zero-row-weighted-class
collapse to an empty corpus.
"""

from __future__ import annotations

import hashlib
import math

from hypothesis import given, settings, strategies as st

# unique string row keys: the hash IS the randomness, so keys must be
# distinct for the replay's sort to be the engine's total order
keys_strategy = st.lists(
    st.tuples(st.integers(1, 3), st.integers(0, 10_000)),
    min_size=1,
    max_size=30,
    unique_by=lambda t: t[1],
)


def _u(key: str, salt: str) -> float:
    s = (salt + "\x01" + key) if salt else key
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) / float(2**32)


@settings(max_examples=8, deadline=None)
@given(rows=keys_strategy, frac=st.sampled_from([0.1, 0.5, 0.9]))
def test_per_group_fraction_selects_exact_replayable_set(spark_global, rows, frac):
    from movie_recommendation_engine_spark.operators.sampling import (
        per_group_fraction,
    )

    spark = spark_global
    data = [(g, f"k{k}") for g, k in rows]
    df = spark.createDataFrame(data, "g long, key string")
    got = sorted((r.g, r.key) for r in per_group_fraction(df, "g", frac, ["key"]).collect())

    by_g: dict[int, list[str]] = {}
    for g, k in data:
        by_g.setdefault(g, []).append(k)
    want = sorted(
        (g, k)
        for g, ks in by_g.items()
        for k in sorted(ks, key=lambda x: (_u(x, ""), x))[
            : math.ceil(len(ks) * frac)
        ]
    )
    assert got == want
    # every group is represented (the split-coverage requirement)
    assert {g for g, _ in got} == set(by_g)


@settings(max_examples=8, deadline=None)
@given(
    rows=keys_strategy,
    fracs=st.tuples(
        st.sampled_from([0.0, 0.3, 1.0]),
        st.sampled_from([0.2, 0.8]),
    ),
)
def test_stratified_sample_matches_bernoulli_replay(spark_global, rows, fracs):
    """Membership is exactly hash < stratum_fraction (strict), with
    unlisted strata dropped."""
    from movie_recommendation_engine_spark.operators.sampling import (
        stratified_sample,
    )

    spark = spark_global
    data = [(g, f"k{k}") for g, k in rows]
    df = spark.createDataFrame(data, "g long, key string")
    fmap = {1: fracs[0], 2: fracs[1]}  # stratum 3 unlisted -> dropped
    got = sorted(
        (r.g, r.key)
        for r in stratified_sample(df, "g", fmap, ["key"], salt="strat").collect()
    )
    want = sorted(
        (g, k) for g, k in data if _u(k, "strat") < fmap.get(g, 0.0)
    )
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    rows=keys_strategy,
    weights=st.tuples(st.integers(1, 3), st.integers(1, 3)),
    include_empty_class=st.booleans(),
)
def test_mixture_sample_exact_allocation_replay(
    spark_global, rows, weights, include_empty_class
):
    """Per-class output == the w_c * min(n_c DIV w_c) lowest-hash rows;
    a weighted class with zero rows collapses the whole sample to
    empty (the documented exact-ratio contract)."""
    from movie_recommendation_engine_spark.operators.sampling import mixture_sample

    spark = spark_global
    data = [(f"c{g}", f"k{k}") for g, k in rows]
    df = spark.createDataFrame(data, "cls string, key string")
    wmap = {"c1": weights[0], "c2": weights[1]}
    if include_empty_class:
        wmap["c9"] = 1  # never present in the data
    got = sorted(
        (r.cls, r.key)
        for r in mixture_sample(df, "cls", ["key"], wmap, salt="mix").collect()
    )

    by_c: dict[str, list[str]] = {}
    for c, k in data:
        if c in wmap:
            by_c.setdefault(c, []).append(k)
    m = min((len(by_c.get(c, [])) // w for c, w in wmap.items()), default=0)
    want = sorted(
        (c, k)
        for c, ks in by_c.items()
        for k in sorted(ks, key=lambda x: (_u(x, "mix"), x))[: wmap[c] * m]
    )
    assert got == want
    if include_empty_class:
        assert got == []


@settings(max_examples=6, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 10_000), st.integers(1, 50)),
        min_size=1,
        max_size=25,
        unique_by=lambda t: t[0],
    ),
    k=st.integers(1, 8),
    n_parts=st.sampled_from([1, 4]),
)
def test_weighted_sample_size_and_partition_independence(
    spark_global, rows, k, n_parts
):
    """Efraimidis-Spirakis reservoir invariants that do not depend on
    libm's ln rounding: exactly min(k, n) rows come back, the selection
    is identical at any partition count (content-hash randomness), and
    the emitted sample keys are non-increasing in output order."""
    from movie_recommendation_engine_spark.operators.sampling import weighted_sample

    spark = spark_global
    data = [(f"k{kk}", float(w)) for kk, w in rows]
    df = spark.createDataFrame(data, "key string, w double")
    sel1 = weighted_sample(df.repartition(1), k, "w", ["key"]).collect()
    seln = weighted_sample(df.repartition(n_parts), k, "w", ["key"]).collect()
    assert len(sel1) == min(k, len(data))
    assert [(r.key, r.sample_key) for r in sel1] == [
        (r.key, r.sample_key) for r in seln
    ]
    skeys = [r.sample_key for r in sel1]
    assert all(a >= b for a, b in zip(skeys, skeys[1:]))
