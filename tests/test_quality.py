"""Data-quality audit: fused row rules, uniqueness, referential integrity."""

from __future__ import annotations

from pyspark.sql import functions as F

from movie_recommendation_engine_spark.operators import quality as Q


def test_audit_counts_each_rule_kind(spark):
    child = spark.createDataFrame(
        [
            (1, "A", 5.0),
            (1, "A", 5.0),   # duplicate (k, tag)
            (2, "X", -1.0),  # bad tag, out of range
            (3, "N", 2.0),
            (None, "A", 3.0),  # null key, orphan
            (9, "R", 100.0),   # orphan parent, out of range
        ],
        "k int, tag string, v double",
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
    rules = [
        Q.not_null("k"),
        Q.accepted_values("tag", ["A", "N", "R"]),
        Q.in_range("v", 0, 10),
        Q.satisfies("v_positive", F.col("v") > 0),
        Q.is_unique("k", "tag"),
        Q.refers_to("k", parent, "pk"),
    ]
    got = {r.rule: r.violations for r in Q.audit(child, rules).collect()}
    assert got["not_null(k)"] == 1
    assert got["accepted_values(tag)"] == 1
    assert got["in_range(v,0,10)"] == 2  # -1.0 and 100.0
    assert got["satisfies(v_positive)"] == 1  # -1.0
    assert got["unique(k,tag)"] == 1  # one extra copy of (1, A)
    assert got["refers_to(k)"] == 2  # None and 9
    assert len(got) == 6


def test_audit_clean_table_all_zero(spark):
    df = spark.createDataFrame([(1, "A"), (2, "N")], "k int, tag string")
    rules = [Q.not_null("k"), Q.accepted_values("tag", ["A", "N"]), Q.is_unique("k")]
    assert all(r.violations == 0 for r in Q.audit(df, rules).collect())


def test_row_rules_fuse_into_single_aggregate(spark):
    """All row-level rules must share one scan+aggregate (no union of
    per-rule jobs): the physical plan contains exactly one scan."""
    df = spark.range(100).select(F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
    rules = [Q.not_null("k"), Q.in_range("v", 0, 5), Q.satisfies("even", F.col("v") % 2 == 0)]
    plan = Q.audit(df, rules)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Range (0, 100") == 1


def test_value_histogram_bins_and_edges(spark):
    from movie_recommendation_engine_spark.operators.profile import value_histogram

    df = spark.createDataFrame([(float(i),) for i in range(100)], "v double")
    got = {r.bin: r for r in value_histogram(df, "v", 10).collect()}
    assert len(got) == 10
    assert all(r.n == 10 for r in got.values())
    assert got[0].bin_lo == 0.0 and abs(got[0].bin_hi - 9.9) < 1e-9
    # the max value folds into the last bin (closed-right)
    assert abs(got[9].bin_hi - 99.0) < 1e-9


def test_value_histogram_degenerate_single_value(spark):
    from movie_recommendation_engine_spark.operators.profile import value_histogram

    df = spark.createDataFrame([(5.0,)] * 4, "v double")
    [r] = value_histogram(df, "v", 10).collect()
    assert (r.bin, r.n) == (0, 4)


def test_funnel_requires_strict_order(spark):
    from movie_recommendation_engine_spark.streaming.events import funnel_counts

    rows = [
        # u1 completes the whole funnel in order
        (1, "2024-01-01 00:00:00", 1, "view"),
        (2, "2024-01-01 00:01:00", 1, "click"),
        (3, "2024-01-01 00:02:00", 1, "purchase"),
        # u2 clicks BEFORE viewing -> stalls at stage 0
        (4, "2024-01-01 00:01:00", 2, "click"),
        (5, "2024-01-01 00:02:00", 2, "view"),
        # u3 views and clicks, purchase precedes the click -> stage 1
        (6, "2024-01-01 00:00:00", 3, "view"),
        (7, "2024-01-01 00:03:00", 3, "click"),
        (8, "2024-01-01 00:01:00", 3, "purchase"),
        # u4 never views
        (9, "2024-01-01 00:00:00", 4, "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r.step: r.n_users for r in funnel_counts(ev, ["view", "click", "purchase"]).collect()}
    assert got == {"view": 3, "click": 2, "purchase": 1}


def test_partition_sizes_sums_to_total_and_flags_skew(spark):
    from movie_recommendation_engine_spark.operators.profile import partition_sizes

    df = spark.range(1000).repartition(4)
    sizes = partition_sizes(df).collect()
    assert sum(r.n_rows for r in sizes) == 1000
    assert len(sizes) <= 4
    # single-partition skew is visible
    skewed = partition_sizes(spark.range(1000).coalesce(1)).collect()
    assert len(skewed) == 1 and skewed[0].n_rows == 1000


def test_value_histogram_excludes_nulls(spark):
    """NULL values must not be binned: least(NULL, n-1) skips nulls, so
    the old binning silently counted every NULL row into the TOP bin
    (round-5 review)."""
    from movie_recommendation_engine_spark.operators.profile import value_histogram

    df = spark.createDataFrame(
        [(0.0,), (10.0,), (None,), (None,), (None,)], "v double"
    )
    got = {r.bin: r.n for r in value_histogram(df, "v", 20).collect()}
    assert sum(got.values()) == 2  # only the non-null rows
    assert got.get(19, 0) == 1  # the max value alone, not max + 3 NULLs


def test_audit_empty_rule_list_returns_empty_frame(spark):
    """Degenerate-input contract: no rules -> 0-row (rule, violations)
    frame, never IndexError (round-5 review)."""
    from movie_recommendation_engine_spark.operators.quality import audit

    df = spark.createDataFrame([(1,)], "a int")
    out = audit(df, [])
    assert out.columns == ["rule", "violations"]
    assert out.count() == 0
