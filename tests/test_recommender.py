"""ALS recommender wrapper (reference E2) — structural checks on a tiny
ratings fixture; numeric quality asserted loosely (ALS is iterative)."""

from __future__ import annotations

from pyspark.sql import functions as F

from movie_recommendation_engine_spark.plans.recommender import AlsRecommender


def _fit(ratings):
    return AlsRecommender(rank=4, max_iter=5, reg_param=0.1, seed=7).fit(ratings)


def test_fit_transform_rmse(spark, ratings):
    rec = _fit(ratings)
    preds = rec.transform(ratings)
    assert set(preds.columns) == {"userId", "movieId", "rating", "timestamp", "prediction"}
    val = rec.evaluate_rmse(ratings).collect()[0].rmse
    assert 0.0 <= val < 3.0  # fits its own training data reasonably


def test_recommend_shapes(spark, ratings):
    rec = _fit(ratings)
    flat = rec.recommend_top_k(k=3, flat=True)
    n_users = ratings.select("userId").distinct().count()
    assert flat.count() == 3 * n_users
    assert set(flat.columns) == {"userId", "movieId", "score", "rank"}
    # rank is 1..3 per user, scores non-increasing within user
    per = flat.groupBy("userId").agg(
        F.min("rank").alias("lo"), F.max("rank").alias("hi"), F.count("*").alias("n")
    )
    assert all(r.lo == 1 and r.hi == 3 and r.n == 3 for r in per.collect())

    nested = rec.recommend_top_k(k=3, flat=False)
    assert "recommendations" in nested.columns
    lists = rec.recommendation_lists(k=3)
    assert lists.schema["recs"].dataType.simpleString() == "array<int>"


def test_factors(spark, ratings):
    rec = _fit(ratings)
    uf = rec.user_factors()
    assert uf.count() == ratings.select("userId").distinct().count()
    assert len(uf.first().features) == 4


def test_recommend_for_user_subset(spark, ratings):
    rec = _fit(ratings)
    some = ratings.select("userId").distinct().limit(2)
    flat = rec.recommend_for_users(some, k=3)
    assert flat.count() == 3 * 2
    assert set(flat.columns) == {"userId", "movieId", "score", "rank"}
    # subset recs agree with the all-users recs for those users
    all_flat = rec.recommend_top_k(k=3, flat=True)
    uids = [r.userId for r in some.collect()]
    want = {
        (r.userId, r.movieId, r.rank)
        for r in all_flat.filter(F.col("userId").isin(uids)).collect()
    }
    got = {(r.userId, r.movieId, r.rank) for r in flat.collect()}
    assert got == want


def test_transform_manual_matches_mllib(spark, ratings):
    """J2 mechanics: the spelled-out factor-join dot product equals
    MLlib's transform (reference als.py:93)."""
    rec = _fit(ratings)
    got = {
        (r.userId, r.movieId): r.prediction
        for r in rec.transform_manual(ratings).collect()
    }
    want = {
        (r.userId, r.movieId): r.prediction for r in rec.transform(ratings).collect()
    }
    assert got.keys() == want.keys()
    for k in want:
        assert abs(got[k] - want[k]) < 1e-4, k


def test_als_rank1_factors_closed_form(spark, ratings):
    """Rank-1 ALS sweeps equal a numpy replay of the closed-form ridge
    updates (round-6 at each half-sweep, ALS-WR count scaling)."""
    from collections import defaultdict

    from movie_recommendation_engine_spark.plans.recommender import als_rank1_factors

    lam, sweeps = 0.1, 2
    rows = [(r.userId, r.movieId, r.rating) for r in ratings.collect()]
    v = defaultdict(lambda: 1.0)
    u = {}
    for _ in range(sweeps):
        num, den = defaultdict(float), defaultdict(float)
        for uu, ii, rr in rows:
            num[uu] += rr * v[ii]
            den[uu] += lam + v[ii] * v[ii]
        u = {k: round(num[k] / den[k], 6) for k in num}
        num, den = defaultdict(float), defaultdict(float)
        for uu, ii, rr in rows:
            num[ii] += rr * u[uu]
            den[ii] += lam + u[uu] * u[uu]
        v = {k: round(num[k] / den[k], 6) for k in num}
    uf, vf = als_rank1_factors(
        ratings, "userId", "movieId", "rating", sweeps=sweeps, reg_param=lam
    )
    got_u = {r.u: r.f for r in uf.collect()}
    got_v = {r.i: r.f for r in vf.collect()}
    assert set(got_u) == set(u) and set(got_v) == set(v)
    for k in u:
        assert abs(got_u[k] - u[k]) <= 1e-6, ("u", k)
    for k in v:
        assert abs(got_v[k] - v[k]) <= 1e-6, ("v", k)


def test_item_neighbors_shape_and_self_exclusion(spark, ratings):
    rec = _fit(ratings)
    probe = ratings.select("movieId").distinct().limit(3)
    nb = rec.item_neighbors(k=2, items=probe).collect()
    assert len(nb) == 3 * 2
    for r in nb:
        assert r.movieId != r.neighbor_movieId
        assert -1.0 - 1e-9 <= r.cosine <= 1.0 + 1e-9


def test_loaded_model_serves_identically_via_arrow(spark, ratings, tmp_path):
    """The Arrow/BLAS serving kernel (round-7 verdict task 2) must
    reproduce MLlib's recommendForAllUsers output — same items per
    user (float factors make exact score ties measure-zero on this
    fixture), same ranks, scores equal to float tolerance — and a
    save/load round-trip must serve the identical result.  The MLlib
    reference comes through flat=False (the one shape still served by
    the blocked cross)."""
    rec = _fit(ratings)
    want = {
        (r.userId, rec_item["movieId"], rank0 + 1): rec_item["rating"]
        for r in rec.recommend_top_k(k=3, flat=False).collect()
        for rank0, rec_item in enumerate(r.recommendations)
    }

    path = str(tmp_path / "als_model")
    rec.save_model(path)
    loaded = AlsRecommender().load_model(path)
    assert loaded._loaded and loaded.rank == rec.rank
    got = {
        (r.userId, r.movieId, r.rank): r.score
        for r in loaded.recommend_top_k(k=3, flat=True).collect()
    }
    assert set(got) == set(want)
    for key, score in got.items():
        assert abs(score - want[key]) < 1e-4

    # the physical plan really is the Arrow kernel: no blocked cross,
    # a mapInPandas node instead
    plan = loaded.recommend_top_k(k=3, flat=True)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan

    # the lists shape comes straight out of the kernel, same order
    lists = {r[0]: list(r.recs) for r in loaded.recommendation_lists(k=3).collect()}
    for (u, m, rk) in want:
        assert lists[u][rk - 1] == m

    # subset serving through the same kernel matches the all-users slice
    some = ratings.select("userId").distinct().limit(2)
    uids = {r.userId for r in some.collect()}
    sub = {
        (r.userId, r.movieId, r.rank)
        for r in loaded.recommend_for_users(some, k=3).collect()
    }
    assert sub == {k3 for k3 in want if k3[0] in uids}


def test_loaded_model_refit_after_load_uses_mllib(spark, ratings, tmp_path):
    """fit() after load_model() must clear the loaded flag — a freshly
    fitted model serves through MLlib's cached block RDDs again."""
    rec = _fit(ratings)
    path = str(tmp_path / "als_model2")
    rec.save_model(path)
    loaded = AlsRecommender(rank=4, max_iter=2, reg_param=0.1, seed=7).load_model(path)
    assert loaded._loaded
    loaded.fit(ratings)
    assert not loaded._loaded


def test_arrow_dot_topk_empty_candidates(spark):
    from movie_recommendation_engine_spark.operators.similarity import arrow_dot_topk

    q = spark.createDataFrame(
        [(1, [0.1, 0.2])], "id int, features array<float>"
    )
    c = spark.createDataFrame([], "id int, features array<float>")
    assert arrow_dot_topk(q, c, k=3).count() == 0
    assert arrow_dot_topk(q, c, k=3, as_lists=True).count() == 0
