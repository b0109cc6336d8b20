"""Splitter / sampling properties (SURVEY §5: disjoint, exhaustive,
every-user-in-every-split, partitioning-independent determinism)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from movie_recommendation_engine_spark.operators.sampling import (
    per_group_fraction,
    split_assign,
    stratified_sample,
)
from movie_recommendation_engine_spark.plans.splitter import split_ratings


KEYS = ["userId", "movieId"]


def test_per_group_fraction_exact_counts(spark, ratings):
    got = per_group_fraction(ratings, "userId", 0.25, KEYS)
    sizes = {r.userId: r.n for r in ratings.groupBy("userId").agg(F.count("*").alias("n")).collect()}
    taken = {r.userId: r.n for r in got.groupBy("userId").agg(F.count("*").alias("n")).collect()}
    for u, n in sizes.items():
        assert taken[u] == math.ceil(0.25 * n)


def test_split_properties(spark, ratings):
    labeled = split_ratings(ratings)
    # exhaustive: every row got exactly one label
    assert labeled.count() == ratings.count()
    assert labeled.filter(F.col("split").isNull()).count() == 0
    # disjoint by construction (single label column); every user in every split
    per = labeled.groupBy("userId").agg(F.countDistinct("split").alias("k")).collect()
    assert all(r.k == 3 for r in per)
    # fractions ~25/25/50 per user
    counts = {(r.userId, r.split): r.n for r in labeled.groupBy("userId", "split").agg(F.count("*").alias("n")).collect()}
    sizes = {r.userId: r.n for r in ratings.groupBy("userId").agg(F.count("*").alias("n")).collect()}
    for u, n in sizes.items():
        assert counts[(u, "validation")] == math.ceil(0.25 * n)


def test_split_partitioning_independent(spark, ratings):
    a = split_ratings(ratings).select(*KEYS, "split").collect()
    b = split_ratings(ratings.repartition(13)).select(*KEYS, "split").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_stratified_sample_deterministic_and_bounded(spark, ratings):
    labeled = split_ratings(ratings)
    frac = {"train": 1.0, "validation": 0.3, "test": 0.3}
    s1 = stratified_sample(labeled, "split", frac, KEYS).collect()
    s2 = stratified_sample(labeled.coalesce(1), "split", frac, KEYS).collect()
    assert sorted(map(tuple, s1)) == sorted(map(tuple, s2))
    n_train = labeled.filter("split = 'train'").count()
    kept_train = sum(1 for r in s1 if r.split == "train")
    assert kept_train == n_train  # fraction 1.0 keeps everything


def test_weighted_sample_favors_heavy_weights(spark):
    """One row with weight 500 among 50 rows of weight 1: across many
    independent draws (salts) the heavy row must win the k=1 sample most
    of the time (ES key property), and any fixed salt is deterministic."""
    from movie_recommendation_engine_spark.operators.sampling import weighted_sample

    rows = [(i, 500.0 if i == 0 else 1.0) for i in range(51)]
    df = spark.createDataFrame(rows, "id int, w double")
    wins = 0
    for s in range(20):
        top = weighted_sample(df, k=1, weight_col="w", key_cols=["id"], salt=f"t{s}")
        if top.collect()[0].id == 0:
            wins += 1
    assert wins >= 14, f"heavy row won only {wins}/20 draws"
    a = weighted_sample(df, k=5, weight_col="w", key_cols=["id"], salt="fixed").collect()
    b = weighted_sample(df, k=5, weight_col="w", key_cols=["id"], salt="fixed").collect()
    assert [r.id for r in a] == [r.id for r in b]


def test_balance_classes_equalizes_and_is_deterministic(spark):
    from movie_recommendation_engine_spark.operators.sampling import balance_classes

    rows = [(i, "maj") for i in range(90)] + [(100 + i, "min") for i in range(10)]
    df = spark.createDataFrame(rows, "id long, label string")
    out = balance_classes(df, "label", ["id"])
    counts = {r.label: r.n for r in out.groupBy("label").agg(F.count("*").alias("n")).collect()}
    assert counts == {"maj": 10, "min": 10}
    # deterministic selection: same rows across repartitionings
    ids1 = sorted(r.id for r in out.collect())
    ids2 = sorted(r.id for r in balance_classes(df.repartition(7), "label", ["id"]).collect())
    assert ids1 == ids2
    # explicit per_class cap
    capped = balance_classes(df, "label", ["id"], per_class=3)
    assert capped.count() == 6


def test_sampling_results_invariant_to_shuffle_partitions(spark):
    """The content-hash determinism claim, verified end-to-end: the
    hash-based split/sample queries must return IDENTICAL rows when the
    cluster parallelism changes (rand(seed) would not)."""
    from movie_recommendation_engine_spark.registry import QUERIES

    names = ["split_counts", "stratified_sample_returnflag", "balanced_docs_by_lang"]
    sf = "/root/testdata/sf0.001"
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = {}
        for nparts in ("3", "13"):
            spark.conf.set("spark.sql.shuffle.partitions", nparts)
            for n in names:
                results.setdefault(n, []).append(
                    sorted(map(tuple, QUERIES[n](spark, sf).collect()))
                )
        for n, (a, b) in results.items():
            assert a == b, f"{n} changed under different parallelism"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)


def test_mixture_sample_exact_ratios_and_determinism(spark):
    from movie_recommendation_engine_spark.operators.sampling import mixture_sample

    rows = [(i, "a" if i % 3 else "b") for i in range(90)] + [(i, "c") for i in range(90, 100)]
    df = spark.createDataFrame(rows, "id int, cls string")
    # n: a=60, b=30, c=10; weights 3:2:1 -> m = min(60//3, 30//2, 10//1) = 10
    out = mixture_sample(df, "cls", ["id"], {"a": 3, "b": 2, "c": 1})
    counts = {r.cls: r.n for r in out.groupBy("cls").agg(F.count("*").alias("n")).collect()}
    assert counts == {"a": 30, "b": 20, "c": 10}
    # deterministic across partitionings
    again = mixture_sample(df.repartition(7), "cls", ["id"], {"a": 3, "b": 2, "c": 1})
    assert sorted(r.id for r in out.collect()) == sorted(r.id for r in again.collect())
    # unknown classes dropped
    assert out.filter(~F.col("cls").isin("a", "b", "c")).count() == 0


def test_mixture_sample_absent_weighted_class_drives_m_to_zero(spark):
    """A class listed in weights but absent from the data must force the
    exact w-ratio to hold: m = min over ALL weighted classes = 0, so the
    output is empty — not a silent ratio violation (ADVICE r02)."""
    from movie_recommendation_engine_spark.operators.sampling import mixture_sample

    rows = [(i, "a" if i % 3 else "b") for i in range(90)]
    df = spark.createDataFrame(rows, "id int, cls string")
    out = mixture_sample(df, "cls", ["id"], {"a": 3, "b": 2, "zmissing": 1})
    assert out.count() == 0
