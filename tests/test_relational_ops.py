"""Round-5 review regression locks on the core relational operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from movie_recommendation_engine_spark.operators.relational import global_cumsum
from movie_recommendation_engine_spark.operators.topk import top_k_per_group


def test_global_cumsum_preserves_fractional_values(spark):
    """The old unconditional long cast truncated double running sums
    (0.5, 1.2, 2.1 -> 0, 1, 2); integral inputs still land BIGINT."""
    df = spark.createDataFrame(
        [(1, 0.5), (2, 0.7), (3, 0.9)], "id int, price double"
    )
    got = {
        r.id: r.cumsum
        for r in global_cumsum(df, ["id"], "price", num_partitions=2).collect()
    }
    assert got == {1: 0.5, 2: 1.2, 3: 2.1}
    ints = spark.createDataFrame([(1, 2), (2, 3)], "id int, qty int")
    out = global_cumsum(ints, ["id"], "qty", num_partitions=2)
    assert dict(out.dtypes)["cumsum"] == "bigint"
    assert {r.id: r.cumsum for r in out.collect()} == {1: 2, 2: 5}


def test_top_k_per_group_does_not_destroy_existing_rank_column(spark):
    """keep_rank=False computes under an internal name: an input column
    named 'rank' used to be overwritten and then dropped entirely."""
    df = spark.createDataFrame(
        [(1, 10, 777), (1, 20, 888), (2, 30, 999)], "g int, v int, rank int"
    )
    out = top_k_per_group(df, ["g"], [F.col("v").desc()], k=1)
    rows = {r.g: r for r in out.collect()}
    assert set(out.columns) == {"g", "v", "rank"}
    assert rows[1].rank == 888 and rows[1].v == 20  # original column intact
    assert rows[2].rank == 999
    # keep_rank=True intentionally replaces it with the computed rank
    kept = top_k_per_group(df, ["g"], [F.col("v").desc()], k=1, keep_rank=True)
    assert all(r.rank == 1 for r in kept.collect())
