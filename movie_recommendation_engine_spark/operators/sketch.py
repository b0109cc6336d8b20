"""Count-Min Sketch over a token/key stream (Cormode & Muthukrishnan,
J. Algorithms 2005) — approximate frequencies with a fixed-size state.

Why this shape at 100 TB: exact per-token counts need a shuffle keyed by
token over the whole corpus; the sketch is a ``depth x width`` grid of
counters (kilobytes) built by ONE partial-aggregating pass — every
executor folds its rows into local cells, and only ``depth*width`` cell
rows move.  Estimates then come from a broadcast join of the tiny cell
table against whatever keys need answering.  The estimate is a
guaranteed OVER-count: err <= 2N/width with probability 1 - 2^-depth.

The hash family is the engine's deterministic md5 construction
(functions.hashing), so the whole sketch — build and probe — is
bit-reproducible in DuckDB SQL: an *approximation whose every cell the
oracle can check*, unlike seed-dependent built-ins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.hashing import md5_long


def _cells(keys: DataFrame, key_col: str, depth: int, width: int, salt: str):
    """Explode each key occurrence into its (depth, bucket) cells."""
    return keys.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("d"),
                        (md5_long(key_col, salt=f"{salt}{i}") % F.lit(width)).alias("b"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("cell")
    ).select(F.col("cell.d").alias("d"), F.col("cell.b").alias("b"))


def cms_build(
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms",
) -> DataFrame:
    """Sketch table (d, b, n): counter grid as a DataFrame of at most
    depth*width rows.  groupBy(d, b) partial-aggregates map-side, so the
    shuffle carries cells, not occurrences."""
    return _cells(keys, key_col, depth, width, salt).groupBy("d", "b").agg(
        F.count("*").alias("n")
    )


def cms_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms",
) -> DataFrame:
    """Point-query the sketch: min over depths of the addressed cells.

    ``queries`` is one row per distinct key to estimate; the sketch side
    is broadcast (it is bounded by depth*width rows regardless of data
    volume).  Adds column ``cms_n``; keys the sketch never saw estimate
    as the min of their (possibly colliding) cells, never less than 0.
    """
    probes = queries.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("d"),
                        (md5_long(key_col, salt=f"{salt}{i}") % F.lit(width)).alias("b"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("cell"),
    ).select(key_col, F.col("cell.d").alias("d"), F.col("cell.b").alias("b"))
    return (
        probes.join(F.broadcast(sketch), ["d", "b"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("cms_n"))
    )
