"""Degenerate-input contracts: every operator family must survive the
inputs a 100 TB pipeline hits constantly — an EMPTY batch (a day with
no data, a partition with no late rows, a filter that matched nothing)
and pathological value distributions (all-zero vectors, empty strings).

The rule being locked: a degenerate input yields a degenerate OUTPUT
(empty frame, zero counts, NULL components) — never an exception.
Under Spark 4's default ANSI mode this is a real hazard, not a
formality: a plain `/` raises DIVIDE_BY_ZERO the moment a denominator
degenerates, which is how this suite found the power-iteration bug it
now regression-locks.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_state_ops_on_empty_batches(spark):
    """rollup/merge/finalize, upsert, top-k, and salted agg all map an
    empty batch to an empty result with the contracted schema."""
    from movie_recommendation_engine_spark.operators.incremental import (
        finalize_state,
        merge_states,
        rollup_state,
    )
    from movie_recommendation_engine_spark.operators.skew import salted_agg
    from movie_recommendation_engine_spark.operators.topk import (
        top_k_global,
        top_k_per_group,
    )
    from movie_recommendation_engine_spark.operators.upsert import upsert

    empty = spark.createDataFrame([], "k long, v decimal(9,2)")
    st = rollup_state(empty, ["k"], "v")
    assert st.columns == ["k", "st_n", "st_sum", "st_min", "st_max"]
    assert finalize_state(merge_states([st, st], ["k"]), ["k"]).count() == 0

    e2 = spark.createDataFrame([], "k long, v long, ord long")
    assert upsert(e2, e2, ["k"], order_col="ord").count() == 0
    assert (
        top_k_per_group(
            spark.createDataFrame([], "g long, v long"), ["g"], [F.col("v")], 3
        ).count()
        == 0
    )
    assert (
        top_k_global(spark.createDataFrame([], "v long"), [F.col("v")], 3).count()
        == 0
    )
    assert (
        salted_agg(
            spark.createDataFrame([], "k long, s long, v long"),
            ["k"],
            ["s"],
            {"n": ("v", "count")},
        ).count()
        == 0
    )


def test_graph_ops_on_empty_graphs(spark):
    """The iterative graph algorithms accept a graph with no edges (and
    no nodes): empty labelings, an all-zeros triangle census row."""
    from movie_recommendation_engine_spark.operators.graph import (
        connected_components,
        pagerank,
        triangle_count,
    )

    nodes = spark.createDataFrame([], "id long")
    edges = spark.createDataFrame([], "u long, v long")
    assert pagerank(nodes, edges, iterations=2).count() == 0
    assert (
        connected_components(spark.createDataFrame([], "id_a long, id_b long")).count()
        == 0
    )
    row = triangle_count(edges, src="u", dst="v").collect()
    assert [tuple(r) for r in row] == [(0, 0, 0, 0)]


def test_text_ops_on_empty_bodies_and_empty_corpora(spark):
    """Empty strings and empty corpora flow through the text-analysis
    stack: ratio columns fall back (no ANSI divide-by-zero), logprob /
    tf-idf / vocab queries return empty or sentinel rows."""
    from movie_recommendation_engine_spark.operators.text import (
        bigram_logprob,
        lang_id,
        mean_token_length,
        punct_ratio,
        quality_score,
        tf_idf,
        unigram_logprob,
    )

    docs = spark.createDataFrame([(1, "")], "doc_id long, body string")
    row = docs.select(
        quality_score("body").alias("q"),
        punct_ratio("body").alias("p"),
        mean_token_length("body").alias("m"),
        lang_id("body").alias("lang"),
    ).collect()[0]
    assert row.q is not None and row.p is not None and row.m is not None

    assert unigram_logprob(docs, "doc_id", "body").count() == 1
    assert bigram_logprob(docs, "doc_id", "body").count() == 0

    edocs = spark.createDataFrame([], "doc_id long, body string")
    assert tf_idf(edocs, "doc_id", "body").count() == 0
    assert unigram_logprob(edocs, "doc_id", "body").count() == 0


def test_power_iteration_zero_matrix_yields_null_not_raise(spark):
    """Regression lock: an all-zero data matrix makes the normalization
    denominator 0; under default ANSI config that used to raise
    DIVIDE_BY_ZERO from inside the iteration.  Contract now: the
    components come back NULL (and an empty input comes back empty)."""
    from movie_recommendation_engine_spark.operators.pca import (
        power_iteration_top_pc,
    )

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert power_iteration_top_pc(empty, dim=4, n_iter=2).count() == 0

    zeros = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    rows = power_iteration_top_pc(zeros, dim=4, n_iter=2).collect()
    assert len(rows) == 4
    assert all(r.v_q is None for r in rows)


def test_table_profile_empty_table_counts_zero_nulls(spark):
    """An empty table has n=0 and n_null=0 (NOT NULL — `sum` over zero
    rows is SQL-NULL and must be coalesced away)."""
    from movie_recommendation_engine_spark.operators.profile import table_profile

    out = {
        r.column: (r.n, r.n_null, r.n_distinct)
        for r in table_profile(
            spark.createDataFrame([], "a long, b string"), ["a", "b"]
        ).collect()
    }
    assert out == {"a": (0, 0, 0), "b": (0, 0, 0)}


def test_interval_and_asof_joins_on_empty_sides(spark):
    from movie_recommendation_engine_spark.operators.asof import asof_join
    from movie_recommendation_engine_spark.streaming.joins import interval_join

    ldf = spark.createDataFrame([], "lid long, k long, lts timestamp")
    rdf = spark.createDataFrame([], "rid long, k long, rts timestamp")
    assert interval_join(ldf, rdf, "k", "lts", "rts").count() == 0

    trades = spark.createDataFrame([], "k long, ts long, qty long")
    quotes = spark.createDataFrame([], "k long, ts long, px long")
    assert (
        asof_join(trades, quotes, on="ts", by=["k"], right_cols=["px"]).count() == 0
    )


def test_dedup_stack_on_empty_corpus(spark):
    from movie_recommendation_engine_spark.operators.dedup import (
        exact_dedup,
        minhash_lsh_pairs,
    )

    edocs = spark.createDataFrame([], "doc_id long, body string")
    assert exact_dedup(edocs, "doc_id", "body").count() == 0
    assert minhash_lsh_pairs(edocs, "doc_id", "body").count() == 0


# -- repo-level contract: the whole registry survives an empty star schema --

#: The ONLY queries allowed to raise on zero-row inputs: each fits an
#: MLlib model (ALS / KMeans), and MLlib itself enforces the "training
#: set must be non-empty" precondition.  A silent empty model output
#: would be worse than the loud failure, so the precondition is the
#: contract — everything else must return (an empty or sentinel frame).
FIT_REQUIRED = {
    "als_item_neighbors_invariants",
    "ann_ivf_kmeans_invariants",
    "als_recommend_top5",
    "als_item_neighbors",
    "als_rmse_eval",
    "als_recommend_invariants",
    "als_rmse_invariants",
    "ann_ivf_kmeans_top5",
    "movielens_e2e_cli",
}


def test_registry_survives_empty_star_schema(spark, tmp_path_factory):
    """Run EVERY registered query against a zero-row copy of the star
    schema (same schemas, no data) — the 'filter matched nothing /
    empty day' scenario at pipeline level.  Only the documented MLlib
    fit queries may raise."""
    from movie_recommendation_engine_spark.registry import QUERIES

    src = "/root/testdata/sf0.001"
    dst = str(tmp_path_factory.mktemp("emptysf"))
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        schema = spark.read.parquet(f"{src}/{t}.parquet").schema
        spark.createDataFrame([], schema).write.mode("overwrite").parquet(
            f"{dst}/{t}.parquet"
        )

    failures = {}
    for name, fn in QUERIES.items():
        try:
            fn(spark, dst).count()
        except Exception as ex:  # noqa: BLE001 - recorded and asserted below
            failures[name] = f"{type(ex).__name__}: {str(ex).splitlines()[0][:90]}"

    unexpected = {n: e for n, e in failures.items() if n not in FIT_REQUIRED}
    assert not unexpected, unexpected
    assert set(failures) == FIT_REQUIRED, (
        "fit-required set drifted",
        sorted(set(failures) ^ FIT_REQUIRED),
    )
