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
