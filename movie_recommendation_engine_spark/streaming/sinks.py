"""Streaming sinks beyond the memory sink: foreachBatch upsert into a
keyed parquet state table.

``writeStream.foreachBatch`` is how Structured Streaming lands results
in systems with no native streaming sink (plain parquet directories,
JDBC, key-value stores): each micro-batch arrives as a normal batch
DataFrame plus an epoch id, and the callback applies it transactionally
per epoch.  Here the callback MERGEs the micro-batch aggregate into a
parquet "state table" with the engine's keyed upsert — giving
exactly-once-per-epoch upsert semantics on top of an append-only
format.  Micro-batch aggregates are tiny relative to the accumulated
table, so each epoch's cost is one |table|+|batch| window pass.

Run with ``trigger(availableNow=True)`` + a checkpoint dir for the
production shape: bounded catch-up runs that resume from the last
committed epoch after failure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def foreach_batch_upsert(
    stream_df: DataFrame,
    state_dir: str,
    keys: list[str],
    checkpoint_dir: str,
    query_name: str = "upsert_sink",
):
    """Start a streaming query that upserts every micro-batch of
    ``stream_df`` (already aggregated, one row per key) into the parquet
    table at ``state_dir``.  Returns the StreamingQuery (availableNow
    trigger: processes everything currently available, then stops)."""
    import os

    def _apply(batch: DataFrame, epoch_id: int) -> None:
        from ..operators.upsert import upsert

        spark = batch.sparkSession
        if os.path.exists(os.path.join(state_dir, "_SUCCESS")):
            base = spark.read.parquet(state_dir)
            merged = upsert(base, batch.select(base.columns), keys)
        else:
            merged = batch
        # rewrite via a staging collect-free cycle: parquet cannot be
        # read and overwritten in one job, so land to a tmp dir and swap
        tmp = state_dir.rstrip("/") + f".epoch{epoch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        spark.read.parquet(tmp).write.mode("overwrite").parquet(state_dir)
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)

    return (
        stream_df.writeStream.foreachBatch(_apply)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
