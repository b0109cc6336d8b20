"""Fresh-session min-of-N steady probe for budget re-baselining.

Mirrors bench.py's warmup set (parquet footers, real ALS fit, KMeans,
Arrow/mapInPandas, iterative-checkpoint) so the measured figures
represent the same execution context the bench sweep and the
bench_check retime run in — the round-11 verdict's requirement that
budgets come from a REPRODUCIBLE context (fresh-session quiet steady),
not from a lucky deep-warm sweep position.

    python tools/rebaseline_probe.py QUERY [QUERY...] [--runs 3]

Prints one line per query: name, all runs, min.  Stamps /proc/stat
steal over the probe window.
"""

from __future__ import annotations

import gc
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def _cpu():
    v = [int(x) for x in open("/proc/stat").readline().split()[1:]]
    return sum(v), v[7] if len(v) > 7 else 0


def main(argv: list[str]) -> int:
    runs = 3
    if "--runs" in argv:
        i = argv.index("--runs")
        runs = int(argv[i + 1])
        del argv[i : i + 2]
    names = argv
    assert names, "usage: rebaseline_probe.py QUERY... [--runs N]"

    from pyspark.sql import functions as F

    from movie_recommendation_engine_spark.operators.graph import (
        pagerank,
        pagerank_weighted,
    )
    from movie_recommendation_engine_spark.operators.similarity import (
        arrow_dot_topk,
    )
    from movie_recommendation_engine_spark.registry import QUERIES
    from movie_recommendation_engine_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "rebaseline", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")

    # bench.py's warmup classes, abbreviated (same costs absorbed)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    try:
        from pyspark.ml.evaluation import RegressionEvaluator
        from pyspark.ml.recommendation import ALS

        warm = (
            spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
            .select(
                F.col("l_orderkey").cast("int").alias("user"),
                F.col("l_partkey").cast("int").alias("item"),
                F.col("l_quantity").cast("float").alias("rating"),
            )
            .dropDuplicates(["user", "item"])
        )
        m = ALS(rank=8, maxIter=4, regParam=0.15, userCol="user", itemCol="item",
                ratingCol="rating", seed=1, nonnegative=True,
                coldStartStrategy="drop").fit(warm)
        m.recommendForAllUsers(5).count()
        RegressionEvaluator(metricName="rmse", labelCol="rating",
                            predictionCol="prediction").evaluate(m.transform(warm))
    except Exception as ex:
        print(f"# ALS warmup failed: {ex}", file=sys.stderr)
    try:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.feature import VectorAssembler

        pts = spark.range(256).select(
            (F.col("id") % 17).cast("double").alias("x"),
            (F.col("id") % 13).cast("double").alias("y"),
        )
        vec = VectorAssembler(inputCols=["x", "y"], outputCol="features").transform(pts)
        KMeans(k=4, maxIter=3, seed=1).fit(vec).transform(vec).count()
    except Exception as ex:
        print(f"# KMeans warmup failed: {ex}", file=sys.stderr)
    try:
        toy = spark.range(256).select(
            F.col("id").cast("int").alias("id"),
            F.array((F.col("id") % 7).cast("float"),
                    (F.col("id") % 5).cast("float")).alias("features"),
        )
        arrow_dot_topk(toy, toy, k=3, id_col="id", vec_col="features").count()
    except Exception as ex:
        print(f"# Arrow warmup failed: {ex}", file=sys.stderr)
    try:
        nodes = spark.range(101).select(F.col("id"))
        tedges = spark.range(3000).select(
            (F.col("id") % 97).alias("u"),
            ((F.col("id") * 7) % 101).alias("v"),
            (F.col("id") % 5 + 1).cast("long").alias("w"),
        )
        pagerank(nodes, tedges, iterations=3).count()
        pagerank_weighted(nodes, tedges, iterations=3).count()
    except Exception as ex:
        print(f"# iterative warmup failed: {ex}", file=sys.stderr)

    a = _cpu()
    t_start = time.perf_counter()
    for name in names:
        fn = QUERIES[name]
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            ts.append(round(time.perf_counter() - t0, 3))
            gc.collect()
        print(f"{name}: runs={ts} min={min(ts)}", flush=True)
    b = _cpu()
    steal = 100.0 * (b[1] - a[1]) / max(1, b[0] - a[0])
    print(f"# probe window {round(time.perf_counter() - t_start, 1)}s "
          f"steal {steal:.3f}%")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
