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


# --- Misra-Gries mergeable heavy hitters ----------------------------------
#
# The deterministic counterpart to CMS: a bounded set of <= k counters per
# partition that UNDER-counts (CMS over-counts), merged by counter-sum plus
# one trim.  Error bound (Misra & Gries 1982; mergeability per Agarwal et
# al., PODS 2012): with per-partition summaries trimmed to k and one global
# add-then-trim merge,
#
#     est <= exact   and   exact - est <= 2N/(k+1)
#
# proof sketch: every trim subtracts its threshold t from >= k+1 counters,
# so it removes >= (k+1)*t of inserted mass; total inserted mass per
# partition is n_p, hence a key's within-partition undercount is
# <= n_p/(k+1), summing to N/(k+1) across partitions, and the single global
# trim threshold is itself <= N/(k+1) by the same mass argument.  Any key
# with exact > 2N/(k+1) therefore survives with est > 0 — guaranteed
# recall, REGARDLESS of how rows were partitioned (the bound is
# partitioning-independent, which is what makes it gate-able).
#
# Why this shape at 100 TB: per-executor state is k counters; the shuffle
# carries <= partitions*k summary rows, never token occurrences.  The
# estimates re-merge without rescanning — region-level summaries fold into
# a global one exactly like the HLL sketches in hll_mergeable_distinct.


def mg_partition_summaries(keys, key_col: str, k: int = 200):
    """Per-partition Misra-Gries summaries: DataFrame (key_col, mg_n)
    with <= k rows per input partition.

    Arrow-batched (``mapInPandas``), never row-at-a-time: each batch is
    exact-counted vectorized (``value_counts``), folded into the running
    counter dict, and trimmed to k by subtracting the (k+1)-th largest
    counter — the weighted-insert formulation of MG, same bound."""
    import numpy as np
    import pandas as pd

    def summarize(batches):
        counters: dict = {}
        for pdf in batches:
            for key, c in pdf[key_col].value_counts().items():
                counters[key] = counters.get(key, 0) + int(c)
            if len(counters) > k:
                vals = np.fromiter(counters.values(), dtype=np.int64)
                # (k+1)-th largest = trim threshold; one pass, no sort
                t = int(np.partition(vals, len(vals) - k - 1)[len(vals) - k - 1])
                counters = {key: c - t for key, c in counters.items() if c > t}
        if counters:
            yield pd.DataFrame(
                {key_col: list(counters), "mg_n": list(counters.values())}
            )

    return keys.select(key_col).mapInPandas(
        summarize, schema=f"{key_col} string, mg_n long"
    )


def mg_merge(summaries, key_col: str, k: int = 200):
    """Merge per-partition summaries into one global <= k-row summary:
    counter-sum per key, then one trim by the (k+1)-th largest merged
    counter.  The pre-trim table is bounded by partitions*k rows, so the
    single-row trim aggregate (sorted counter list) is bounded state,
    not a data-volume collect."""
    summed = summaries.groupBy(key_col).agg(F.sum("mg_n").alias("mg_n"))
    trim = summed.agg(
        F.coalesce(
            # element k+1 of the descending counter list, 0 when <= k keys
            F.try_element_at(
                F.reverse(F.array_sort(F.collect_list("mg_n"))), F.lit(k + 1)
            ),
            F.lit(0),
        ).alias("t")
    )
    return (
        summed.crossJoin(F.broadcast(trim))
        .select(key_col, (F.col("mg_n") - F.col("t")).alias("mg_n"))
        .filter(F.col("mg_n") > 0)
    )
