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

Durability: the state table is committed with a two-directory rename
protocol (write new state to a tmp dir, demote the old state to
``.prev``, promote tmp) so there is NO window where a crash leaves the
only copy of the state half-deleted — the old in-place overwrite
(delete-then-write of ``state_dir`` itself) silently replaced all
accumulated state with just the current micro-batch if the driver died
mid-rewrite (round-5 review finding).  Replaying an epoch against
already-merged state is safe because the keyed upsert is idempotent for
identical batch rows.  The rename protocol uses driver-visible
filesystem paths (local/NFS); an object-store deployment should swap
this callback for a table format with native atomic commit
(Delta/Iceberg MERGE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _committed(d: str) -> bool:
    import os

    return os.path.exists(os.path.join(d, "_SUCCESS"))


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
    import shutil

    def _apply(batch: DataFrame, epoch_id: int) -> None:
        from ..operators.upsert import upsert

        spark = batch.sparkSession
        base_dir = state_dir.rstrip("/")
        prev = base_dir + ".prev"
        tmp = base_dir + f".epoch{epoch_id}"
        # live state: the committed current dir, else the committed prev
        # (recovers a crash that happened between the two commit renames)
        live = next((d for d in (base_dir, prev) if _committed(d)), None)
        if live is not None:
            base = spark.read.parquet(live)
            merged = upsert(base, batch.select(base.columns), keys)
        else:
            merged = batch
        # sweep stale uncommitted epochs first: a failed-then-abandoned
        # or re-checkpointed query must not leak state-sized `.epochK`
        # directories forever (round-5 advice) — anything not this
        # epoch's tmp is dead, since commits rename tmp away
        import glob

        # escape the state path: a directory named like `state[1]` must
        # not be treated as a glob character class
        for stale in glob.glob(glob.escape(base_dir) + ".epoch*"):
            if stale != tmp:
                shutil.rmtree(stale, ignore_errors=True)
        # materialize the new state BEFORE touching the old one (the
        # write executes the lazy read of `live`); on a failed write,
        # reclaim the partial tmp dir rather than leaving it to a
        # same-epoch retry that may never come
        try:
            merged.write.mode("overwrite").parquet(tmp)
        except Exception:
            shutil.rmtree(tmp, ignore_errors=True)
            raise
        # commit: demote current -> prev, promote tmp -> current.  Every
        # crash point leaves at least one committed copy reachable by
        # the `live` probe above.
        if os.path.isdir(base_dir):
            if os.path.isdir(prev):
                shutil.rmtree(prev)
            os.rename(base_dir, prev)
        os.rename(tmp, base_dir)

    return (
        stream_df.writeStream.foreachBatch(_apply)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
