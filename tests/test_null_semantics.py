"""NULL-semantics pinning: the behaviors silent-corruption bugs hide
behind at scale, made explicit and regression-locked.

SQL NULL flows through aggregates (skipped), orderings (sorted to an
end), and string concatenation (skipped by concat_ws) with semantics
that are all CORRECT per the standard but easy to mis-assume.  Each
test states the contract the engine's operators actually provide, so a
future change that flips one (e.g. a nulls_first ordering, a
null-propagating concat) fails loudly here instead of silently
reshuffling samples and aggregates in production.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F


def test_rollup_state_null_values_skip_and_all_null_group_is_null_row(spark):
    """NULL measures are skipped by every monoid column (count counts
    non-null only), and a group with ALL-NULL measures still emits its
    key row: (n=0, sum/min/max/mean all NULL) — never a divide error,
    never a dropped key."""
    from movie_recommendation_engine_spark.operators.incremental import (
        finalize_state,
        rollup_state,
    )

    df = spark.createDataFrame(
        [(1, Decimal("2.00")), (1, None), (2, None)], "k long, v decimal(9,2)"
    )
    out = {
        r.k: (r.n_rows, r.total, r.vmin, r.vmax, r.mean)
        for r in finalize_state(rollup_state(df, ["k"], "v"), ["k"]).collect()
    }
    assert out[1] == (1, Decimal("2.00"), Decimal("2.00"), Decimal("2.00"), 2.0)
    assert out[2] == (0, None, None, None, None)


def test_top_k_desc_sorts_nulls_last(spark):
    """Spark's `desc` is desc_nulls_last: a NULL sort value can only
    enter the top-k after every non-null value — it never displaces a
    real one.  (A nulls_first default would silently fill every top-k
    with empty rows.)"""
    from movie_recommendation_engine_spark.operators.topk import top_k_per_group

    df = spark.createDataFrame(
        [(1, 5, 1), (1, None, 2), (1, 3, 3)], "g long, v long, id long"
    )
    top2 = top_k_per_group(df, ["g"], [F.col("v").desc(), F.col("id")], 2)
    assert sorted((r.v, r.id) for r in top2.collect()) == [(3, 3), (5, 1)]
    top3 = top_k_per_group(df, ["g"], [F.col("v").desc(), F.col("id")], 3)
    assert (None, 2) in {(r.v, r.id) for r in top3.collect()}


def test_upsert_update_with_null_attr_still_wins(spark):
    """Last-writer-wins includes NULL payloads: an update row whose
    attribute is NULL replaces the base value with NULL (MERGE
    semantics), it does not fall back to the base row."""
    from movie_recommendation_engine_spark.operators.upsert import upsert

    base = spark.createDataFrame([(1, "a", 0)], "k long, attr string, ord long")
    upd = spark.createDataFrame([(1, None, 1)], "k long, attr string, ord long")
    assert [tuple(r) for r in upsert(base, upd, ["k"], "ord").collect()] == [
        (1, None, 1)
    ]


def test_md5_key_null_skip_collision_is_pinned(spark):
    """DOCUMENTED HAZARD, pinned so it stays documented: concat_ws
    SKIPS NULL arguments, so multi-column hash keys with NULLs in
    different positions collide — ('x', NULL), (NULL, 'x'), and the
    single-column key ('x',) all hash identically, and (NULL, NULL)
    hashes as the empty string.  Samplers/splitters keyed on nullable
    columns must coalesce first (the engine's own registry keys are
    all non-null by construction)."""
    import hashlib

    from movie_recommendation_engine_spark.functions.hashing import md5_long

    df = spark.createDataFrame(
        [("x", None), (None, "x"), (None, None)], "a string, b string"
    )
    got = [r.h for r in df.select(md5_long("a", "b").alias("h")).collect()]
    h_x = int(hashlib.md5(b"x").hexdigest()[:8], 16)
    h_empty = int(hashlib.md5(b"").hexdigest()[:8], 16)
    assert got == [h_x, h_x, h_empty]


def test_join_null_keys_never_match(spark):
    """Equi-joins drop NULL keys on both sides (SQL three-valued
    logic); the anti-join therefore KEEPS a NULL-keyed probe row —
    the standard but easy-to-forget asymmetry."""
    left = spark.createDataFrame([(None, "l1"), (1, "l2")], "k long, tag string")
    right = spark.createDataFrame([(None, "r1"), (1, "r2")], "k long, tag2 string")
    assert [
        (r.k, r.tag, r.tag2) for r in left.join(right, "k", "inner").collect()
    ] == [(1, "l2", "r2")]
    anti = left.join(right, "k", "left_anti")
    assert [(r.k, r.tag) for r in anti.collect()] == [(None, "l1")]
