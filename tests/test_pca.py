"""Power-iteration PCA: quality vs numpy SVD, partitioning
independence, quantization contract."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from movie_recommendation_engine_spark.operators.pca import (
    VSCALE,
    power_iteration_top_pc,
)


def _planted(spark, n=300, dim=16, parts=1):
    """Deterministic data with a strongly dominant direction: power
    iteration must actually find it (gap >> 0, unlike the flat-spectrum
    corpus the gated query documents)."""
    rng = np.random.default_rng(7)
    u = rng.standard_normal(dim)
    u /= np.linalg.norm(u)
    X = 0.05 * rng.standard_normal((n, dim)) + np.outer(
        rng.standard_normal(n) * 0.8, u
    )
    rows = [(i, [float(x) for x in X[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df.repartition(parts), X


def test_power_iteration_recovers_planted_direction(spark):
    df, X = _planted(spark)
    out = power_iteration_top_pc(df, dim=16, n_iter=8).orderBy("dim").collect()
    v = np.array([r.v_q for r in out], float)
    Xm = np.floor(np.array(X, np.float32).astype(float) * 1e6)
    top = np.linalg.svd(Xm, full_matrices=False)[2][0]
    cos = abs(v @ top) / np.linalg.norm(v) / np.linalg.norm(top)
    assert cos > 0.999, cos
    # Rayleigh quotient must capture essentially all top variance
    s = np.linalg.svd(Xm, full_matrices=False)[1]
    true_evr = s[0] ** 2 / (s**2).sum()
    assert abs(out[0].evr_r6 - true_evr) < 0.01


def test_power_iteration_partitioning_independent(spark):
    """Integer/exact-IEEE arithmetic means the result cannot depend on
    how rows are partitioned."""
    df1, _ = _planted(spark, parts=1)
    df7, _ = _planted(spark, parts=7)
    a = [tuple(r) for r in power_iteration_top_pc(df1, dim=16).orderBy("dim").collect()]
    b = [tuple(r) for r in power_iteration_top_pc(df7, dim=16).orderBy("dim").collect()]
    assert a == b


def test_power_iteration_quantization_grid(spark):
    df, _ = _planted(spark, n=50)
    out = power_iteration_top_pc(df, dim=16).collect()
    assert all(abs(r.v_q) <= VSCALE for r in out)
    assert max(abs(r.v_q) for r in out) == VSCALE  # max-normalized
    assert len(out) == 16
