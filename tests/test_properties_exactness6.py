"""Sixth batch: the data-quality audit and the one-scan profile
operators vs per-rule / per-column Python references on random frames
with nulls — rule fusion must not change any count, and the histogram
binning must match the same IEEE arithmetic including the folded top
edge and the all-equal degenerate case."""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import given, settings, strategies as st

rows_strategy = st.lists(
    st.tuples(
        st.integers(0, 5),  # id (dup-prone)
        st.one_of(st.none(), st.sampled_from(["a", "b", "z"])),  # cat
        st.one_of(st.none(), st.integers(-5, 15)),  # x
    ),
    min_size=1,
    max_size=25,
)

parents_strategy = st.lists(st.integers(0, 5), min_size=0, max_size=4, unique=True)


@settings(max_examples=8, deadline=None)
@given(rows=rows_strategy, parents=parents_strategy)
def test_audit_counts_match_per_rule_reference(spark_global, rows, parents):
    """audit() == independent per-rule counting for every rule kind on
    any frame: fused row rules (not_null / accepted_values / in_range,
    with NULL counting as a violation for the latter two), uniqueness
    (extra copies beyond the first), and referential integrity (NULL
    child keys are orphans)."""
    from movie_recommendation_engine_spark.operators.quality import (
        accepted_values,
        audit,
        in_range,
        is_unique,
        not_null,
        refers_to,
    )

    spark = spark_global
    df = spark.createDataFrame(rows, "id int, cat string, x int")
    parent = spark.createDataFrame([(p,) for p in parents], "pid int")
    rules = [
        not_null("cat"),
        accepted_values("cat", ["a", "b"]),
        in_range("x", 0, 9),
        is_unique("id"),
        refers_to("id", parent, "pid"),
    ]
    got = {r.rule: r.violations for r in audit(df, rules).collect()}

    want = {
        "not_null(cat)": sum(1 for _, c, _ in rows if c is None),
        "accepted_values(cat)": sum(
            1 for _, c, _ in rows if c is None or c not in ("a", "b")
        ),
        "in_range(x,0,9)": sum(
            1 for _, _, x in rows if x is None or x < 0 or x > 9
        ),
        "unique(id)": sum(
            n - 1 for n in Counter(i for i, _, _ in rows).values() if n > 1
        ),
        "refers_to(id)": sum(1 for i, _, _ in rows if i not in set(parents)),
    }
    assert got == want


@settings(max_examples=8, deadline=None)
@given(rows=rows_strategy)
def test_table_profile_matches_per_column_reference(spark_global, rows):
    """table_profile == per-column pandas-style stats: non-null count,
    null count, distinct-ignoring-nulls, string-rendered min/max."""
    from movie_recommendation_engine_spark.operators.profile import table_profile

    spark = spark_global
    df = spark.createDataFrame(rows, "id int, cat string, x int")
    got = {
        r.column: (r.n, r.n_null, r.n_distinct, r.min_value, r.max_value)
        for r in table_profile(df, ["id", "cat", "x"]).collect()
    }

    cols = {
        "id": [i for i, _, _ in rows],
        "cat": [c for _, c, _ in rows],
        "x": [x for _, _, x in rows],
    }
    for name, vals in cols.items():
        nn = [v for v in vals if v is not None]
        want = (
            len(nn),
            len(vals) - len(nn),
            len(set(nn)),
            str(min(nn)) if nn else None,
            str(max(nn)) if nn else None,
        )
        assert got[name] == want, (name, got[name], want)


hist_values_strategy = st.lists(st.integers(0, 100), min_size=1, max_size=40)


@settings(max_examples=8, deadline=None)
@given(values=hist_values_strategy, n_bins=st.sampled_from([1, 4, 7]))
def test_value_histogram_matches_reference_binning(spark_global, values, n_bins):
    """value_histogram == the same floor((x-lo)/width) binning in
    Python float64, with the max value folded into the last bin and the
    all-equal column collapsing to a single bin 0."""
    from movie_recommendation_engine_spark.operators.profile import value_histogram

    spark = spark_global
    df = spark.createDataFrame([(float(v),) for v in values], "x double")
    got = {
        r.bin: (r.bin_lo, r.bin_hi, r.n)
        for r in value_histogram(df, "x", n_bins=n_bins).collect()
    }

    lo, hi = float(min(values)), float(max(values))
    width = (hi - lo) / n_bins
    want_counts: dict[int, int] = {}
    for v in values:
        b = min(math.floor((v - lo) / width), n_bins - 1) if width > 0 else 0
        want_counts[b] = want_counts.get(b, 0) + 1
    assert {b: n for b, (_, _, n) in got.items()} == want_counts
    for b, (blo, bhi, _) in got.items():
        # 5.1e-7 tolerance: the operator half-up-rounds edges to 6 dp
        assert abs(blo - (lo + b * width)) < 5.1e-7
        assert abs(bhi - (lo + (b + 1) * width)) < 5.1e-7
