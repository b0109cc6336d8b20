"""The reference's ENTIRE workflow as one composition-gated query.

``movielens_e2e_cli`` drives the actual CLI verbs (``__main__.py`` —
split / popularity / als / evaluate, the commands a reference user runs
after switching engines) over ratings-shaped data derived from the
testdata star schema, then folds the artifacts every verb produced into
one summary row the DuckDB oracle can recompute end-to-end:

- ratings built as (userId=l_orderkey, movieId=l_partkey,
  rating=max(l_quantity)) — deduped so (user, item) is a unique key,
  the MovieLens layout (reference als.py:24-26) — written through the
  engine's own CSV sink and read back through its CSV source (S1/S4
  round-trip);
- ``split`` writes the partitioned 25/25/50 dataset (reference
  new_split_script.py semantics, E3) — the oracle replays the content-
  hash split in SQL and checks all three partition counts;
- ``popularity`` writes the weighted top-k table (reference
  popularity_model.py, E1) — the oracle recomputes k, the member-id
  checksum and the exact 6-dp score sum;
- ``als`` writes top-5 recommendations for every trained user
  (reference als.py:96, E2) — the oracle pins the servable-user count
  (= distinct train users) and the k-per-user contract;
- ``evaluate`` emits the metrics JSON line (reference als.py:103-133)
  — the popularity hit-ratio is deterministic and value-checked; the
  MLlib RMSE / MAP@K are float-model outputs checked as invariants
  (finite, <= 2x the train-mean baseline, in [0, 1]).

The row collapses bounded scalars (counts, checksums, booleans) — the
same final-scalar contract as the CLI itself; every heavy step ran
distributed inside the verbs.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import _t, duck_hash_sql, register

_H_ML = duck_hash_sql("split", "userId", "movieId")

_E2E_ORACLE = f"""
WITH ratings AS (
  SELECT l_orderkey AS userId, l_partkey AS movieId,
         CAST(max(l_quantity) AS DOUBLE) AS rating
  FROM lineitem GROUP BY 1, 2),
labeled AS (
  SELECT userId, movieId, rating,
         CASE WHEN row_number() OVER (PARTITION BY userId
                  ORDER BY {_H_ML}, userId, movieId)
                  <= ceil(count(*) OVER (PARTITION BY userId) * 0.25) THEN 'validation'
              WHEN row_number() OVER (PARTITION BY userId
                  ORDER BY {_H_ML}, userId, movieId)
                  <= ceil(count(*) OVER (PARTITION BY userId) * 0.50) THEN 'test'
              ELSE 'train' END AS split
  FROM ratings),
counts AS (
  SELECT count(*) AS n_ratings,
         count(*) FILTER (WHERE split = 'train') AS n_train,
         count(*) FILTER (WHERE split = 'validation') AS n_validation,
         count(*) FILTER (WHERE split = 'test') AS n_test
  FROM labeled),
train AS (SELECT * FROM labeled WHERE split = 'train'),
val AS (SELECT * FROM labeled WHERE split = 'validation'),
per_item AS (
  SELECT movieId, avg(rating) AS avg_rating, count(userId) AS num_ratings
  FROM train GROUP BY 1),
scalars AS (
  SELECT CAST(sum(CAST(avg_rating AS DECIMAL(28,18))) AS DOUBLE) / count(*) AS gm,
         quantile_cont(num_ratings, 0.9) AS f
  FROM per_item),
scored AS (
  SELECT movieId,
         (floor(((num_ratings/(num_ratings+f))*avg_rating
                 + (f/(f+num_ratings))*gm) * 1000000 + 0.5) / 1000000) AS score
  FROM per_item, scalars WHERE num_ratings >= f
  ORDER BY score DESC, movieId LIMIT 100),
pop AS (
  SELECT count(*) AS pop_k,
         CAST(sum(movieId) AS BIGINT) AS pop_items_sum,
         CAST(sum(CAST(score AS DECIMAL(18,6))) AS DOUBLE) AS pop_score_sum
  FROM scored),
recs AS (SELECT list(movieId ORDER BY score DESC, movieId) AS items FROM scored),
hit AS (
  SELECT (floor(avg(CASE WHEN list_contains(items, movieId) THEN 1.0 ELSE 0.0 END)
                * 1000000 + 0.5) / 1000000) AS pop_hit_ratio
  FROM val, recs),
served AS (SELECT count(DISTINCT userId) AS rec_users FROM train)
SELECT counts.n_ratings, counts.n_train, counts.n_validation, counts.n_test,
       pop.pop_k, pop.pop_items_sum, pop.pop_score_sum,
       hit.pop_hit_ratio,
       served.rec_users,
       true AS rec_rows_ok,
       true AS als_rmse_finite_ok,
       true AS als_rmse_le_2x_baseline_ok,
       true AS als_map_in_range_ok
FROM counts, pop, hit, served
"""


@register("movielens_e2e_cli", oracle=_E2E_ORACLE)
def q_movielens_e2e_cli(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..__main__ import main as cli_main

    tag = os.path.basename(sf_dir.rstrip("/"))
    scratch = os.path.join(tempfile.gettempdir(), f"mres_e2e_{tag}_{os.getpid()}")
    shutil.rmtree(scratch, ignore_errors=True)
    csv_path = os.path.join(scratch, "ratings_csv")
    split_dir = os.path.join(scratch, "splits")
    pop_dir = os.path.join(scratch, "popularity")
    recs_dir = os.path.join(scratch, "recs")

    # ratings-shaped input through the engine's OWN CSV sink: dedupe to
    # the MovieLens unique (user, movie) key; column order matches
    # RATINGS_SCHEMA (CSV with an explicit schema binds positionally)
    from ..sources.writers import write_csv

    li = _t(spark, sf_dir, "lineitem")
    ratings = (
        li.groupBy(
            F.col("l_orderkey").cast("int").alias("userId"),
            F.col("l_partkey").cast("int").alias("movieId"),
        )
        .agg(F.max("l_quantity").cast("float").alias("rating"))
        .withColumn("timestamp", F.lit(0).cast("long"))
    )
    write_csv(ratings, csv_path)

    # the four CLI verbs, exactly as a reference user invokes them
    cli_main(["split", "--ratings", csv_path, "--out", split_dir])
    cli_main(["popularity", "--ratings", csv_path, "--k", "100", "--out", pop_dir])
    cli_main(
        ["als", "--ratings", csv_path, "--rank", "4", "--max-iter", "2",
         "--reg", "0.1", "--k", "5", "--out", recs_dir]
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cli_main(
            ["evaluate", "--ratings", csv_path, "--rank", "8", "--max-iter", "4",
             "--reg", "0.1", "--k", "100"]
        )
    metrics = json.loads(buf.getvalue().strip().splitlines()[-1])

    # fold the verb artifacts into the summary row
    labeled = spark.read.parquet(split_dir)
    counts = {
        r["split"]: r["n"]
        for r in labeled.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    pop = spark.read.parquet(pop_dir).agg(
        F.count("*").alias("pop_k"),
        F.sum("movieId").alias("pop_items_sum"),
        F.sum(F.col("score").cast("decimal(18,6)")).cast("double").alias("pop_score_sum"),
    ).collect()[0]
    recs = spark.read.parquet(recs_dir)
    rec_stats = recs.groupBy("userId").agg(F.count("*").alias("n")).agg(
        F.count("*").alias("rec_users"),
        F.expr("bool_and(n = 5)").alias("rec_rows_ok"),
    ).collect()[0]

    # ALS invariant baseline: train-global-mean RMSE on the same scored
    # subset the model was evaluated on (validation rows whose user AND
    # item appear in train == coldStartStrategy='drop')
    train = labeled.filter(F.col("split") == "train")
    val = labeled.filter(F.col("split") == "validation")
    mu = train.agg(
        (F.sum(F.col("rating").cast("decimal(28,6)")).cast("double") / F.count("*"))
    ).collect()[0][0]
    scored_val = val.join(
        train.select("userId").distinct(), "userId"
    ).join(train.select("movieId").distinct(), "movieId")
    base_rmse = scored_val.agg(
        F.sqrt(F.avg(F.pow(F.col("rating") - F.lit(mu), 2)))
    ).collect()[0][0]

    rmse, map_at_k = float(metrics["rmse"]), float(metrics["map_at_k"])
    shutil.rmtree(scratch, ignore_errors=True)
    row = (
        int(counts["train"] + counts["validation"] + counts["test"]),
        int(counts["train"]), int(counts["validation"]), int(counts["test"]),
        int(pop["pop_k"]), int(pop["pop_items_sum"]), float(pop["pop_score_sum"]),
        float(metrics["popularity_hit_ratio"]),
        int(rec_stats["rec_users"]), bool(rec_stats["rec_rows_ok"]),
        bool(rmse == rmse and rmse > 0),
        bool(rmse <= 2.0 * base_rmse),
        bool(0.0 <= map_at_k <= 1.0),
    )
    return spark.createDataFrame(
        [row],
        "n_ratings long, n_train long, n_validation long, n_test long, "
        "pop_k long, pop_items_sum long, pop_score_sum double, "
        "pop_hit_ratio double, rec_users long, rec_rows_ok boolean, "
        "als_rmse_finite_ok boolean, als_rmse_le_2x_baseline_ok boolean, "
        "als_map_in_range_ok boolean",
    )
