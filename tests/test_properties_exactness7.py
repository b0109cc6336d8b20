"""Seventh batch: the z-order (Morton) layout key vs a Python
bit-interleave reference — the scaling (min-max to the bit budget,
truncating cast) and the interleave positions (bit b of column i at
b*n_cols + i) must match exactly for any point set, including
degenerate all-equal columns (span 0 -> scaled 0)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

points_strategy = st.lists(
    st.tuples(st.integers(0, 50), st.integers(-10, 10)),
    min_size=1,
    max_size=25,
)


@settings(max_examples=8, deadline=None)
@given(points=points_strategy, bits=st.sampled_from([2, 4, 8]))
def test_zorder_key_matches_bit_interleave_reference(spark_global, points, bits):
    from pyspark.sql import functions as F

    from movie_recommendation_engine_spark.sources.writers import zorder_key

    spark = spark_global
    data = [(i, x, y) for i, (x, y) in enumerate(points)]
    df = spark.createDataFrame(data, "id int, x int, y int")
    bounded, key = zorder_key(df, ["x", "y"], bits=bits)
    got = {r.id: r.z for r in bounded.select("id", key.alias("z")).collect()}

    top = (1 << bits) - 1
    xs = [x for _, x, _ in data]
    ys = [y for _, _, y in data]
    bounds = {"x": (min(xs), max(xs)), "y": (min(ys), max(ys))}
    for i, x, y in data:
        z = 0
        for ci, (c, v) in enumerate((("x", x), ("y", y))):
            lo, hi = bounds[c]
            span = float(hi - lo)
            scaled = int((v - lo) / span * top) if span > 0 else 0
            for b in range(bits):
                z += ((scaled >> b) & 1) << (b * 2 + ci)
        assert got[i] == z, (i, x, y, got[i], z)
