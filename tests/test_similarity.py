"""Similarity-search operators: exactness of brute force, ANN recall
behavior, determinism of the hyperplanes."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from movie_recommendation_engine_spark.operators.similarity import (
    brute_force_topk,
    hyperplane,
    ivf_topk,
    lsh_bucketed_topk,
)


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),   # close to 1
        (3, [0.0, 1.0, 0.0]),
        (4, [0.0, 0.95, 0.05]), # close to 3
        (5, [-1.0, 0.0, 0.0]),  # opposite of 1
    ]
    return spark.createDataFrame(rows, "vec_id int, embedding array<float>")


def test_bruteforce_exact_neighbors(spark, vectors):
    out = brute_force_topk(vectors, vectors, k=2)
    by_q = {}
    for r in out.collect():
        by_q.setdefault(r.query_id, []).append((r.rank, r.neighbor_id, r.cosine))
    assert sorted(by_q[1])[0][1] == 2  # nearest to 1 is 2
    assert sorted(by_q[3])[0][1] == 4
    # cosine(1,2) = 0.9/sqrt(0.82)
    want = 0.9 / math.sqrt(0.82)
    assert abs(sorted(by_q[1])[0][2] - round(want, 6)) < 1e-6
    # every query gets exactly k neighbors, self excluded
    assert all(len(v) == 2 for v in by_q.values())
    assert all(q not in [n for _, n, _ in v] for q, v in by_q.items())


def test_hyperplanes_deterministic():
    a = hyperplane(3, 16)
    b = hyperplane(3, 16)
    assert a == b
    assert all(-0.5 <= x < 0.5 for x in a)
    assert hyperplane(4, 16) != a


def test_lsh_results_subset_of_bruteforce_candidates(spark, vectors):
    """ANN never invents neighbors: every (q, n) it returns must be a
    valid non-self pair, and its cosine must equal the exact cosine."""
    exact = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in brute_force_topk(vectors, vectors, k=4).collect()
    }
    ann = lsh_bucketed_topk(vectors, vectors, k=2, n_planes=4, dim=3)
    for r in ann.collect():
        assert (r.query_id, r.neighbor_id) in exact
        assert abs(exact[(r.query_id, r.neighbor_id)] - r.cosine) < 1e-9


def test_ivf_probes_enough_cells_for_full_recall(spark, vectors):
    """With nprobe = #cells the IVF path degenerates to exact search —
    its top-k must equal brute force.  Centroid stride 2 makes ids 1, 3,
    5 centroids (3 cells)."""
    exact = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in brute_force_topk(vectors, vectors, k=2).collect()
    }
    ivf = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in ivf_topk(vectors, vectors, k=2, stride=2, nprobe=3).collect()
    }
    assert ivf == exact


def test_ivf_recall_on_testdata(spark):
    """IVF with nprobe=2 on the sf0.001 embeddings: substantial recall
    vs exact kNN, and no invented neighbors (cosines must match exact)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact_all = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in brute_force_topk(emb, emb, k=20).collect()
    }
    ivf = ivf_topk(emb, emb, k=5, stride=7, nprobe=2).collect()
    assert len(ivf) > 0
    hits = {(r.query_id, r.neighbor_id) for r in ivf}
    exact_top5 = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, emb, k=5).collect()
    }
    recall = len(hits & exact_top5) / len(exact_top5)
    assert recall >= 0.2, f"IVF recall collapsed: {recall:.3f}"
    for r in ivf:
        if (r.query_id, r.neighbor_id) in exact_all:
            assert abs(exact_all[(r.query_id, r.neighbor_id)] - r.cosine) < 1e-9


def test_ann_recall_on_testdata(spark):
    """LSH recall vs exact kNN on the sf0.001 embeddings — with fewer
    planes (denser buckets) recall must be substantial, and every ANN
    hit must be a true neighbor pair (no invented results)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = brute_force_topk(emb, emb, k=5)
    ann = lsh_bucketed_topk(emb, emb, k=5, n_planes=3, dim=64)
    exact_pairs = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    ann_pairs = {(r.query_id, r.neighbor_id) for r in ann.collect()}
    recall = len(ann_pairs & exact_pairs) / len(exact_pairs)
    assert recall >= 0.2, f"ANN recall collapsed: {recall:.3f}"
    assert len(ann_pairs) > 0


def test_ivf_kmeans_recall_and_no_invented_neighbors(spark):
    """K-means-refined IVF: decent recall vs exact kNN on sf0.001, and
    every returned cosine equals the exact value (re-rank is exact)."""
    from movie_recommendation_engine_spark.operators.similarity import ivf_kmeans_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact_all = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in brute_force_topk(emb, emb, k=19).collect()
    }
    exact_top5 = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, emb, k=5).collect()
    }
    got = ivf_kmeans_topk(emb, emb, k=5, n_cells=4, nprobe=2).collect()
    assert len(got) > 0
    hits = {(r.query_id, r.neighbor_id) for r in got}
    recall = len(hits & exact_top5) / len(exact_top5)
    assert recall >= 0.2, f"k-means IVF recall collapsed: {recall:.3f}"
    for r in got:
        assert abs(exact_all[(r.query_id, r.neighbor_id)] - r.cosine) < 1e-9


def test_arrow_topk_equals_jvm_bruteforce(spark, vectors):
    """The Arrow/numpy matmul path must equal the JVM HOF path exactly
    (same round-6 total order) — on the fixture and on real testdata."""
    from movie_recommendation_engine_spark.operators.similarity import (
        arrow_brute_force_topk,
    )

    jvm = {tuple(r) for r in brute_force_topk(vectors, vectors, k=3).collect()}
    arw = {tuple(r) for r in arrow_brute_force_topk(vectors, vectors, k=3).collect()}
    assert arw == jvm

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") % 97 == 0)
    jvm2 = {tuple(r) for r in brute_force_topk(q, emb, k=5).collect()}
    arw2 = {tuple(r) for r in arrow_brute_force_topk(q, emb, k=5).collect()}
    assert arw2 == jvm2


def test_zero_norm_vectors_rank_last_never_raise(spark):
    """Degenerate-input contract on the SERVING path (round-5 review):
    an all-zero embedding must not abort the job under Spark 4's ANSI
    divide — both engines yield NULL cosine for 0-norm pairs, ranked
    LAST (cosine DESC = NULLS LAST), and the two paths stay equal."""
    from movie_recommendation_engine_spark.operators.similarity import (
        arrow_brute_force_topk,
        lsh_bucketed_topk,
    )

    vec = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [0.5, 0.5])],
        "vec_id long, embedding array<double>",
    )
    jvm = brute_force_topk(vec, vec, k=3).collect()
    by_q = {}
    for r in jvm:
        by_q.setdefault(r.query_id, []).append(r)
    # query 1: the real neighbor (3) outranks the zero-norm one (2)
    q1 = sorted(by_q[1], key=lambda r: r.rank)
    assert [r.neighbor_id for r in q1] == [3, 2]
    assert q1[0].cosine is not None and q1[1].cosine is None
    # query 2 (itself zero-norm): all cosines NULL, ties by id asc
    q2 = sorted(by_q[2], key=lambda r: r.rank)
    assert [r.neighbor_id for r in q2] == [1, 3]
    assert all(r.cosine is None for r in q2)
    # the Arrow path (NaN -> SQL NULL via the Arrow return) matches
    arw = {tuple(r) for r in arrow_brute_force_topk(vec, vec, k=3).collect()}
    assert arw == {tuple(r) for r in jvm}
    # the LSH serving path shares _cos — must not raise either
    lsh_bucketed_topk(vec, vec, k=3, n_planes=2, dim=2).collect()


def test_semdedup_drop_policy(spark):
    """Within a cluster, every cosine>=tau pair drops its HIGHER id; the
    lowest id of a duplicate chain always survives."""
    from movie_recommendation_engine_spark.operators.similarity import semdedup

    # centroids: ids 30 and 59 (% 29 == 1).  Cluster 30 holds three
    # identical vectors {2, 3, 30}; cluster 59 holds two distinct ones.
    rows = [
        (2, [1.0, 0.0, 0.0, 0.0]),
        (3, [1.0, 0.0, 0.0, 0.0]),
        (30, [1.0, 0.0, 0.0, 0.0]),
        (59, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 0.8, 0.6, 0.0]),
        (5, [0.0, 0.6, 0.8, 0.0]),  # cos(4,5)=0.96 < tau
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: r for r in semdedup(df, tau=0.99, cent_mod=29, cent_rem=1).collect()}
    assert len(out) == 6
    # lowest id of the identical trio survives; the other two drop
    assert not out[2].is_dup and out[3].is_dup and out[30].is_dup
    # sub-threshold cluster-mates all survive
    assert not out[4].is_dup and not out[5].is_dup and not out[59].is_dup
    # every vector is assigned to a real centroid id
    assert all(r.cent_id % 29 == 1 for r in out.values())


def test_sq8_reconstruction_error_bounded(spark):
    """SQ8 reconstruction is within half a quantization step per
    dimension, and constant dimensions reconstruct exactly."""
    from movie_recommendation_engine_spark.operators.similarity import sq8_reconstruct

    rows = [
        (1, [0.0, 5.0, -1.0]),
        (2, [1.0, 5.0, 2.0]),
        (3, [0.5, 5.0, 0.25]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    rec = {r.vec_id: r.v for r in sq8_reconstruct(df).collect()}
    orig = {i: v for i, v in rows}
    for vid, v in orig.items():
        for d, (x, xr) in enumerate(zip(v, rec[vid])):
            lo = min(o[d] for o in orig.values())
            hi = max(o[d] for o in orig.values())
            step = (hi - lo) / 255 if hi > lo else 0.0
            assert abs(x - xr) <= step / 2 + 1e-12, (vid, d, x, xr)
    assert all(rec[v][1] == 5.0 for v in rec)  # constant dim exact


def test_jl_project_matches_numpy(spark):
    """Projected coordinates are the exact integer signed micro-unit
    sums — bit-equal to the numpy replay of the same sign matrix."""
    import math

    import numpy as np

    from movie_recommendation_engine_spark.operators.similarity import (
        jl_project,
        jl_signs,
    )

    rows = [
        (7, [0.5, -1.25, 3.0, 0.1]),
        (8, [0.0, 0.0, 0.0, 0.0]),
        (9, [-2.5, 1e-7, 123.456, -0.333]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: list(r.jl) for r in jl_project(df, in_dim=4, out_dim=3).collect()}
    S = np.array(jl_signs(4, 3))
    for vid, vec in rows:
        u = np.array([math.floor(np.float64(np.float32(x)) * 1_000_000) for x in vec])
        assert out[vid] == list(S @ u), vid


def test_jl_projection_finds_planted_neighbors(spark):
    """On data with a REAL neighborhood (planted near-duplicates,
    cosine ~0.95 vs ~0 background), the 64->16 projection must surface
    the planted neighbor as top-1 for almost every query — the JL
    guarantee at the gap/distortion ratio it actually promises.
    (The sf testdata's exact top-5 sits a ~0.03 cosine gap above bulk,
    below 16-dim distortion, so recall there is meaningless.)"""
    import numpy as np

    from movie_recommendation_engine_spark.operators.similarity import (
        brute_force_topk,
        jl_project,
    )

    rng = np.random.default_rng(42)
    base = rng.standard_normal((40, 64))
    rows = []
    for i, v in enumerate(base):
        rows.append((2 * i, [float(x) for x in v]))
        twin = v + 0.3 * rng.standard_normal(64)  # cosine ~0.95
        rows.append((2 * i + 1, [float(x) for x in twin]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    p = jl_project(df)
    top1 = brute_force_topk(p, p, k=1, vec_col="jl")
    hits = sum(
        1
        for r in top1.collect()
        if r.neighbor_id == (r.query_id ^ 1)  # its planted twin
    )
    assert hits >= 72, f"planted-twin top-1 hits too low: {hits}/80"


def test_mmr_matches_bruteforce_greedy(spark):
    """The distributed 5-step MMR trajectory equals a numpy greedy
    recompute on the same micro-unit integers (including tiebreaks)."""
    import numpy as np

    from movie_recommendation_engine_spark.operators.similarity import mmr_select

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = [
        (r["step"], r["id"], r["rel"], r["score"])
        for r in mmr_select(emb, "vec_id", "embedding", query_id=0, k=5).collect()
    ]

    rows = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    mic = {
        i: np.floor(np.array(v, dtype=np.float64) * 1_000_000 + 0.5).astype(np.int64)
        for i, v in rows.items()
    }
    q = mic[0]
    rel = {i: int(m @ q) for i, m in mic.items() if i != 0}
    selected: list[int] = []
    want = []
    for step in range(1, 6):
        best = None
        for i, r in sorted(rel.items()):
            if i in selected:
                continue
            if selected:
                score = 2 * r - max(int(mic[i] @ mic[s]) for s in selected)
            else:
                score = 2 * r
            if best is None or score > best[1]:
                best = (i, score)
        selected.append(best[0])
        want.append((step, best[0], rel[best[0]], best[1]))
    assert got == want
    assert len({i for _, i, _, _ in got}) == 5 and 0 not in {i for _, i, _, _ in got}
