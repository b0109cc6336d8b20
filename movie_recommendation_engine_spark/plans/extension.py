"""Spark-first counterpart of the reference's LightFM WARP extension
(SURVEY §2 M9; reference extension.py:34-181).

The extension is a SINGLE-MACHINE comparison harness: binarize every
(user, movie) interaction into a scipy CSR matrix (extension.py:34-61,
ratings dropped at 139-148), mask it per split with a driver-side
lil_matrix loop (95-115) guarded by pairwise disjointness asserts
(149-151), fit ``LightFM(loss='warp')`` for 3 epochs (157-160), and
report ``precision_at_k(k=100).mean()`` per split (167-181).  LightFM
cannot run distributed — and does not even run in the reference
(SURVEY §2.13.7) — so the engine keeps the harness's *semantics* and
swaps the learner for implicit-feedback ALS (Hu/Koren/Volinsky 2008),
MLlib's native ranking-oriented MF and the standard WARP stand-in at
cluster scale.

Semantics mirrored exactly:

- interactions are BINARY positives — any (user, item) pair counts
  once, ratings are discarded (``binary_interactions``);
- splits are evaluated against their own positives, with the same
  pairwise-disjointness precondition (X2, here a distributed semi-join
  count instead of a ``.multiply().nnz`` over driver matrices);
- LightFM's ``precision_at_k`` ranks the FULL catalog without
  excluding train positives (the reference never passes
  ``train_interactions``), and averages over users that appear in the
  evaluated matrix — mirrored by ranking with
  ``recommendForAllUsers`` (which likewise never masks seen items) and
  inner-joining recs to each split's truth lists.  The engine's
  serve-only-new contract (anti-join on train before the top-k window)
  lives on the M1-M4 side — see ``registry/ml.py::
  q_als_rank1_recommend_top5`` — and is intentionally NOT applied here,
  same divergence-documentation policy as SURVEY §2.13.

Scale: the learner is block-partitioned MLlib ALS; the per-split masks
are plain DataFrames (no driver-side matrix mutation loop); precision@k
is the distributed per-user array metric (plans/metrics.py).  The whole
harness is the same shape as the M1-M4 pipeline and inherits its 100 TB
story — nothing here collects more than the final per-split scalar rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .metrics import per_user_ranking_metrics, summarize_ranking
from .recommender import AlsRecommender


def binary_interactions(
    df: DataFrame, user_col: str = "userId", item_col: str = "movieId"
) -> DataFrame:
    """(user, item, weight=1.0): the reference's ``df_to_matrix``
    binarization (extension.py:34-61) as a distinct projection —
    duplicate interactions collapse to one positive, exactly like
    repeated assignments into the same CSR cell."""
    return (
        df.select(user_col, item_col)
        .distinct()
        .withColumn("weight", F.lit(1.0).cast("float"))
    )


def assert_split_disjoint(
    splits: dict[str, DataFrame], on: list[str]
) -> None:
    """The extension's ``train.multiply(val).nnz == 0`` asserts
    (extension.py:149-151), distributed: pairwise semi-join must be
    empty."""
    names = list(splits)
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            overlap = (
                splits[a].select(on).join(splits[b].select(on), on, "semi").count()
            )
            if overlap:
                raise AssertionError(
                    f"splits {a!r} and {b!r} share {overlap} interactions"
                )


def fit_warp_style_ranker(
    train: DataFrame,
    user_col: str = "userId",
    item_col: str = "movieId",
    rank: int = 32,
    max_iter: int = 3,
    alpha: float = 40.0,
    reg_param: float = 0.05,
    seed: int = 42,
) -> AlsRecommender:
    """Implicit-feedback ALS over binarized train interactions — the
    distributed counterpart of ``LightFM(loss='warp').fit(train,
    epochs=3)`` (extension.py:157-160).  ``max_iter=3`` mirrors the
    3 epochs; ``alpha`` is the confidence scale c = 1 + alpha*r of the
    implicit formulation."""
    rec = AlsRecommender(
        user_col=user_col,
        item_col=item_col,
        rating_col="weight",
        rank=rank,
        max_iter=max_iter,
        reg_param=reg_param,
        nonnegative=False,
        implicit_prefs=True,
        alpha=alpha,
        seed=seed,
    )
    return rec.fit(binary_interactions(train, user_col, item_col))


def precision_at_k_by_split(
    ranker: AlsRecommender,
    splits: dict[str, DataFrame],
    k: int = 100,
    user_col: str = "userId",
    item_col: str = "movieId",
) -> DataFrame:
    """Per-split mean precision@k (extension.py:167-181): one output
    row per split, ``(split, precision_at_k, map_at_k, n_users)``,
    split order preserved from the dict.

    One ``recommendForAllUsers`` serves every split (the reference
    re-ranks per call; the model is identical, so sharing the ranking
    is a pure plan saving), and the recs frame is cached across the
    per-split metric jobs (unpersisted before returning — the result
    rows are tiny and fully materialized per split, so the cache must
    not outlive the harness in a long-lived session).

    Every user with positives in the split is SCORED, like LightFM's
    ``precision_at_k`` mean: ALS has no factors for users absent from
    train (``recommendForAllUsers`` omits them), so truth left-joins
    recs and a cold user scores with an empty list (precision 0,
    counted in the mean) instead of silently dropping out of
    ``n_users`` — the cross-engine comparison must average over the
    same user set the reference does.
    """
    recs = ranker.recommendation_lists(k).cache()
    try:
        rows: list = []
        for name, split in splits.items():
            truth = (
                binary_interactions(split, user_col, item_col)
                .groupBy(user_col)
                .agg(F.collect_set(item_col).alias("truth"))
            )
            covered = truth.select(user_col).join(recs, user_col, "left").select(
                user_col,
                F.coalesce(
                    "recs", F.array().cast(recs.schema["recs"].dataType)
                ).alias("recs"),
            )
            per_user = per_user_ranking_metrics(
                covered, truth, k=k, user_col=user_col, recs_col="recs", truth_col="truth"
            )
            row = summarize_ranking(per_user).select(
                F.lit(name).alias("split"),
                F.col("mean_precision").alias("precision_at_k"),
                "map_at_k",
                "n_users",
            )
            # materialize inside the cache's lifetime (one tiny row)
            rows.append(row.collect()[0])
        assert rows, "no splits given"
        spark = recs.sparkSession
        return spark.createDataFrame(rows, schema=row.schema)
    finally:
        recs.unpersist()


def warp_style_comparison(
    splits: dict[str, DataFrame],
    train_name: str = "train",
    k: int = 100,
    user_col: str = "userId",
    item_col: str = "movieId",
    rank: int = 32,
    max_iter: int = 3,
    alpha: float = 40.0,
    seed: int = 42,
) -> DataFrame:
    """The extension's full harness, end-to-end: disjointness asserts,
    implicit-ALS fit on the train split, precision@k per split
    (extension.py:117-181 minus the 5x repeat loop, which exists only
    to average wall-clock timings)."""
    assert train_name in splits, f"missing train split {train_name!r}"
    assert_split_disjoint(splits, [user_col, item_col])
    ranker = fit_warp_style_ranker(
        splits[train_name],
        user_col=user_col,
        item_col=item_col,
        rank=rank,
        max_iter=max_iter,
        alpha=alpha,
        seed=seed,
    )
    return precision_at_k_by_split(
        ranker, splits, k=k, user_col=user_col, item_col=item_col
    )
