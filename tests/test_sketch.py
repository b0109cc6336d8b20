"""Count-Min Sketch: over-count guarantee, exactness without collisions,
unseen keys, bounded state."""

from __future__ import annotations

from pyspark.sql import functions as F

from movie_recommendation_engine_spark.operators.sketch import cms_build, cms_estimate


def test_cms_never_undercounts_and_bounds_state(spark):
    rows = [(f"k{i % 50}",) for i in range(2000)]
    keys = spark.createDataFrame(rows, "k string")
    sketch = cms_build(keys, "k", depth=4, width=64)
    assert sketch.count() <= 4 * 64
    exact = keys.groupBy("k").agg(F.count("*").alias("n"))
    est = cms_estimate(sketch, exact.select("k"), "k", depth=4, width=64)
    joined = {r.k: (r.n, r.cms_n) for r in exact.join(est, "k").collect()}
    assert len(joined) == 50
    assert all(cms >= n for n, cms in joined.values())


def test_cms_exact_when_wide(spark):
    """Width >> #keys: no collisions, estimates equal exact counts."""
    keys = spark.createDataFrame([("a",)] * 7 + [("b",)] * 3, "k string")
    exact = keys.groupBy("k").agg(F.count("*").alias("n"))
    est = cms_estimate(cms_build(keys, "k", 4, 4096), exact.select("k"), "k", 4, 4096)
    got = {r.k: r.cms_n for r in est.collect()}
    assert got == {"a": 7, "b": 3}


def test_cms_unseen_key_small_estimate(spark):
    keys = spark.createDataFrame([("a",)] * 10, "k string")
    probe = spark.createDataFrame([("zzz",)], "k string")
    est = cms_estimate(cms_build(keys, "k", 4, 4096), probe, "k", 4, 4096)
    [r] = est.collect()
    assert r.cms_n == 0  # wide sketch: unseen key hits empty cells
