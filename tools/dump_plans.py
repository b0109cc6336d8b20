"""Regenerate PLANS.md: the formatted physical plan of each flagship
query at sf0.001 — the artifact backing the plan-quality claims in
README (broadcasts, pushdown, single-exchange merges, no nested loops).

Usage: python tools/dump_plans.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHOWCASE = [
    ("popularity_top100", "flagship: scan->agg->percentile floor->score->heap top-k"),
    ("revenue_per_nation", "star join: dimensions broadcast, fact shuffles once"),
    ("split_label_rows", "content-hash per-group split: one window pass"),
    ("asof_purchase_attribution", "as-of join as single-exchange window merge"),
    ("range_join_price_band", "interval join as bucket equi-join (no nested loop)"),
    ("dedup_minhash_lsh", "MinHash LSH: signature agg + band bucket join + verify"),
    ("ann_ivf_top5", "IVF-Flat: broadcast centroids, cell equi-join, windowed top-k"),
    ("sql_interface_revenue", "same plan from the SQL entry path"),
    ("lineitems_above_part_avg", "correlated scalar subquery decorrelated to agg+join"),
    ("bloom_semi_join_revenue", "bloom bitmap literal filters the probe scan pre-shuffle"),
    ("events_click_attribution", "interval join: hash equi-join on key, time range residual"),
    ("dq_lineitem_audit", "row-level quality rules fused into one scan"),
    ("tpch_q6_forecast_revenue", "pushdown best case: all predicates at the scan, no wide exchange"),
    ("tpch_q2_min_cost_supplier", "correlated scalar-min decorrelated to a partkey window"),
    ("part_pagerank", "iterative graph sweeps: per-iteration join+sum, truncated lineage"),
    ("events_ohlc_15m", "OHLC resample as ONE aggregate (min_by/max_by, no window pass)"),
    ("semantic_dedup_semdedup", "SemDeDup: broadcast centroid assign, pair join bounded by cluster id"),
    ("ann_sq8_top5", "SQ8 ANN: per-dim ranges fold to ONE broadcast row, narrow reconstruct"),
    ("hll_mergeable_distinct", "per-group HLL sketches merged with hll_union_agg (no rescan)"),
    ("events_cohort_retention", "retention triangle as hash aggregates only (window-free)"),
    ("customer_pareto_frontier", "2-D skyline: staircase via pid-partitioned windows + bounded triangular offsets"),
    ("doc_bpe_merges", "BPE training: per-round pair agg + broadcast best + islands merge, flat lineage"),
    ("embedding_top_pc_power", "power-iteration PCA: one checkpointed explode, 64-row broadcast state per round"),
    ("customer_hierarchy_depth", "pointer doubling: log-round self-joins, no recursive walk"),
    ("doc_bm25_search", "BM25: zero-shuffle HOF tf scan + one broadcast stats row + heap top-k"),
    ("item_item_cf_neighbors", "item CF: basket-key self-join, broadcast df table, per-item rank window"),
    ("basket_association_rules", "association rules: okey-exchange reuse, vocab-bounded pair agg, broadcast marginals"),
    ("part_abc_classification", "ABC Pareto: window-free global rank+prefix sum, integer class boundaries"),
    ("customer_negative_samples", "negative sampling: broadcast item index, linear probe fan-out, anti-join"),
    ("monthly_revenue_decomposition", "seasonal decomposition: calendar-bounded MA self-join, zero WindowExec"),
    ("order_price_mad_outliers", "MAD outliers: two window-free median assemblies, struct-max top row"),
    ("ann_jl_top5", "JL ANN: bounded query relation (TakeOrderedAndProject cap) broadcast-crossed against the reduced corpus"),
    ("ann_ivf_kmeans_invariants", "invariant gate: 16-row centroid broadcast, cell equi-join scoring, one-row contract aggregate"),
    ("als_rank1_item_neighbors", "rank-1 neighbor value gate: DECIMAL ridge sweeps, capped probe (sorted limit) broadcast-crossed, rank window"),
    ("als_rank1_recommend_top5", "rank-1 recommend value gate: capped probe users x item factors, train anti-join, W-topk serving window"),
    ("als_recommend_invariants", "Arrow/BLAS serving kernel: item factors broadcast once, user factors stream through MapInPandas (one matmul per chunk, zero shuffle), invariants fold to one row"),
]


def main() -> None:
    from movie_recommendation_engine_spark.registry import QUERIES
    from movie_recommendation_engine_spark.session import get_spark

    spark = get_spark("plans", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.001"
    out = [
        "# PLANS — physical plans of the showcase queries (sf0.001, AQE on)",
        "",
        "Regenerate with `python tools/dump_plans.py`.  These back the",
        "plan-shape claims in README §Scale design; tests/test_plans.py",
        "asserts the load-bearing properties in CI.",
        "",
    ]
    for name, why in SHOWCASE:
        df = QUERIES[name](spark, sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
            df._jdf.queryExecution(), "formatted"
        )
        out += [f"## {name}", "", f"*{why}*", "", "```", plan.rstrip(), "```", ""]
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path} ({len(SHOWCASE)} plans)")


if __name__ == "__main__":
    main()
