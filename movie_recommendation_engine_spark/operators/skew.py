"""Skew-handling operators (prompt §scale: "skewed keys → salting or AQE
skew-join").

AQE's skew-join splitting handles skewed *join* inputs automatically
(enabled in session.py); what AQE does NOT fix is a skewed **aggregation**
key — one hot key funnels into a single reduce task.  ``salted_agg``
breaks the hot key with a deterministic salt and re-aggregates:

    phase 1: groupBy(key, salt)  -> partial aggregates over n_salts tasks
    phase 2: groupBy(key)        -> combine partials (tiny input)

The salt is the engine's content hash over distinguishing columns, so
results stay deterministic and oracle-equal to the unsalted aggregate —
the decomposition requires algebraic aggregates (count/sum/min/max and
anything built from them, e.g. avg = sum/count).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.hashing import hash_bucket


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    salt_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation over a salted key.

    ``aggs`` maps output name -> (input column, fn) with fn in
    {count,sum,min,max}; avg is derived downstream as sum/count.
    """
    salt = hash_bucket(n_salts, *salt_cols, salt="agg-salt")
    phase1_exprs, phase2_exprs = [], []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            phase1_exprs.append(F.count(col).alias(f"__p_{out}"))
            phase2_exprs.append(F.sum(f"__p_{out}").alias(out))
        elif fn == "sum":
            phase1_exprs.append(F.sum(col).alias(f"__p_{out}"))
            phase2_exprs.append(F.sum(f"__p_{out}").alias(out))
        elif fn == "min":
            phase1_exprs.append(F.min(col).alias(f"__p_{out}"))
            phase2_exprs.append(F.min(f"__p_{out}").alias(out))
        elif fn == "max":
            phase1_exprs.append(F.max(col).alias(f"__p_{out}"))
            phase2_exprs.append(F.max(f"__p_{out}").alias(out))
        else:
            raise ValueError(f"non-algebraic aggregate {fn!r} cannot be salted")
    partial = df.withColumn("__salt", salt).groupBy(*key_cols, "__salt").agg(*phase1_exprs)
    return partial.groupBy(*key_cols).agg(*phase2_exprs)


def salted_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 16,
) -> DataFrame:
    """Hot-key equi-join: replicate the small side n_salts times and salt
    the big side, so one hot key spreads over n_salts tasks.  Useful when
    the small side is broadcastable anyway — then prefer a plain
    broadcast join; this shape is for when the small side exceeds the
    broadcast threshold but a few big-side keys dominate."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    small_rep = small.select("*", salts)
    big_salted = big.withColumn(
        "__salt", hash_bucket(n_salts, *[F.col(c) for c in big.columns], salt="join-salt")
    )
    return big_salted.join(small_rep, on + ["__salt"]).drop("__salt")


def cap_basket(
    df: DataFrame,
    basket_col: str,
    order_cols: list[Column],
    w: int = 256,
) -> DataFrame:
    """Bound basket width before a pair-fanout self-join.

    A self-join on the basket key fans out k^2/2 pairs per k-row basket;
    uniform data keeps k a small constant (TPC-H orders are <= 17 rows
    at the probed SFs), but ONE hot basket detonates the plan — the
    round-8 skew probe measured a 20%-hot-key order (15,963 distinct
    parts -> 1.3e8 pairs from a single group) timing out a 2.6-second
    query past 420 s.  Keeping the first ``w`` rows per basket under a
    deterministic total order (``order_cols`` must include a unique
    tiebreaker) caps the fanout at w^2/2 per basket while being a
    provable NO-OP whenever every basket is narrower than ``w`` —
    uniform results (and their oracle hashes) are untouched, and the
    same row_number rule is SQL-expressible so skewed results stay
    oracle-checkable too.

    Physical plan: one hash exchange on ``basket_col`` + per-partition
    sort (top_k_per_group) — the hot basket sorts w + excess rows in
    one task instead of joining them.
    """
    from .topk import top_k_per_group

    return top_k_per_group(df, [basket_col], order_cols, k=w)
