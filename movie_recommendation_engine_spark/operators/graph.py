"""Graph operators: connected components over an edge list.

Why this lives in a data-pipeline engine: near-duplicate detection
(dedup.minhash_lsh_pairs / simhash_pairs / similarity.embedding_neardup
_pairs) emits PAIRS, but deduplication needs CLUSTERS — "keep one doc
per group of mutual near-dups" is exactly connected components over the
pair graph, with the min id as the canonical representative.

Algorithm: iterative min-label propagation expressed as DataFrame
joins — each round every node takes the minimum label among itself and
its neighbors; convergence when no label changes.  Rounds are bounded
by the graph diameter (near-dup graphs are shallow — cliques and short
chains — so a handful of rounds suffices).  Each round is one shuffle
join + one aggregation; lineage is truncated with localCheckpoint every
few rounds so the plan does not grow with the iteration count (the
reference hit exactly this class of failure with long lineages,
SURVEY §2.13.5).  For adversarially deep graphs (long paths) switch to
the large-star/small-star alternation (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) — same join primitives,
O(log^2 n) rounds; not needed for dedup-shaped graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    checkpoint_every: int = 5,
) -> DataFrame:
    """(id, component) for every node in ``edges``; ``component`` is the
    smallest node id reachable from ``id`` (undirected).

    Raises RuntimeError if propagation has not converged after
    ``max_iter`` rounds (diameter larger than max_iter).
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    e = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct().cache()
    labels = (
        e.select(F.col("u").alias("id")).distinct().withColumn("comp", F.col("id")).cache()
    )
    for i in range(max_iter):
        nb_min = (
            e.join(labels.withColumnRenamed("id", "v"), "v")
            .groupBy("u")
            .agg(F.min("comp").alias("nb_comp"))
            .withColumnRenamed("u", "id")
        )
        # fold the convergence flag into the same pass: one join and one
        # action per round instead of a separate old-vs-new join
        new_comp = F.least(F.col("comp"), F.coalesce("nb_comp", "comp"))
        flagged = labels.join(nb_min, "id", "left").select(
            "id",
            new_comp.alias("comp"),
            (new_comp < F.col("comp")).alias("__changed"),
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            flagged = flagged.localCheckpoint(eager=False)
        flagged = flagged.cache()
        changed = flagged.filter("__changed").count()
        labels.unpersist()
        labels = flagged.drop("__changed")
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def dedup_canonical(
    all_ids: DataFrame,
    pair_edges: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Collapse near-dup PAIRS into canonical assignments for a whole
    corpus: every id maps to the min id of its near-dup component;
    ids with no near-dup map to themselves.  Output: (id_col,
    component, is_canonical)."""
    comps = connected_components(pair_edges, src=src, dst=dst).withColumnRenamed(
        "id", id_col
    )
    out = (
        all_ids.select(id_col)
        .join(comps, id_col, "left")
        .select(
            id_col,
            F.coalesce("comp", F.col(id_col)).alias("component"),
        )
        .withColumn("is_canonical", (F.col(id_col) == F.col("component")))
    )
    return out
