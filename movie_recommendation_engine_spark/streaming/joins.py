"""Stream-stream event-time interval join (SURVEY §2.10 — additive; the
reference has no streaming and no temporal joins: timestamps are read
and discarded at als.py:25-26).

The canonical use is attribution: match each `view` event to the
`click` events by the same user that happen within a bounded horizon
afterwards.  Written once against plain DataFrames, the same function
runs in BATCH mode (an equi-join on the key with a time-range residual
— one shuffle, oracle-checked against DuckDB) and in STREAMING mode as
a genuine stream-stream inner join, where the watermark plus the
time-range condition let Spark expire buffered rows: per-side state is
bounded by (watermark horizon + join horizon) x arrival rate, never the
whole stream.

Scale notes (100 TB): the join shuffles both sides on the key only —
the range condition is a residual predicate evaluated inside the join,
so there is no theta-join blowup; skewed keys (one user with millions
of events) are the thing to watch — AQE skew-join handles the batch
path, and in streaming the key cardinality bounds state, not row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    horizon: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Inner join: rows match when keys are equal and
    ``left_ts < right_ts <= left_ts + horizon``.

    Both inputs must already use distinct column names apart from
    ``key`` (rename before calling).  In streaming mode both sides are
    watermarked on their event-time column so the state store can
    evict: a buffered left row is droppable once the right watermark
    passes ``left_ts + horizon``.
    """
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if right.isStreaming:
        right = right.withWatermark(right_ts, watermark)
    # alias-qualified references: both sides often derive from the same
    # source (a filtered self-join), where bare df[col] lineage is
    # ambiguous
    lhs, rhs = left.alias("__ij_l"), right.alias("__ij_r")
    cond = (
        (F.col(f"__ij_l.{key}") == F.col(f"__ij_r.{key}"))
        & (F.col(f"__ij_r.{right_ts}") > F.col(f"__ij_l.{left_ts}"))
        & (
            F.col(f"__ij_r.{right_ts}")
            <= F.col(f"__ij_l.{left_ts}") + F.expr(f"INTERVAL {horizon}")
        )
    )
    return lhs.join(rhs, cond, "inner").drop(F.col(f"__ij_r.{key}"))


def view_click_pairs(
    events: DataFrame,
    horizon: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """(user_id, view_id, view_ts, click_id, click_ts) — every click by
    a user within ``horizon`` after one of their views.  One logical
    plan for batch and streaming (pass a streaming events DataFrame and
    both filtered sides become streams of the same source)."""
    views = events.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    return interval_join(
        views, clicks, "user_id", "view_ts", "click_ts", horizon, watermark
    )


def click_attribution_stats(
    events: DataFrame,
    horizon: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Per-user attribution rollup of :func:`view_click_pairs`:
    (user_id, n_pairs, n_views, n_clicks).  Timestamps never leave the
    plan (ns-parquet sub-µs coercion differs across engines), so the
    output is hash-stable against the DuckDB oracle."""
    return (
        view_click_pairs(events, horizon, watermark)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_pairs"),
            F.countDistinct("view_id").alias("n_views"),
            F.countDistinct("click_id").alias("n_clicks"),
        )
    )


def unconverted_events(
    events: DataFrame,
    trigger: str = "view",
    convert: str = "purchase",
    horizon: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Temporal NOT EXISTS: trigger events with NO converting event for
    the same user within ``horizon`` after them (cart abandonment, un-
    acked alerts, unanswered messages).

    Spelled as a left-OUTER interval join + IS NULL filter rather than a
    left-anti join: stream-stream anti joins are unsupported, but outer
    joins with a watermark and a time-range condition are — so the same
    plan runs in both modes (in streaming, a non-match emits only after
    the right watermark passes trigger_ts + horizon, i.e. once absence
    is PROVABLE; an anti-join rewrite would be batch-only).  The outer
    join emits one row per matching convert event, so non-matches are
    exactly the rows whose convert side is null — no dedup needed.
    State is bounded by horizon x per-user trigger rate.
    """
    trig = events.filter(F.col("event_type") == trigger).select(
        "event_id", "user_id", F.col("ts").alias("trig_ts")
    )
    conv = events.filter(F.col("event_type") == convert).select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("conv_ts")
    )
    if trig.isStreaming:
        trig = trig.withWatermark("trig_ts", watermark)
    if conv.isStreaming:
        conv = conv.withWatermark("conv_ts", watermark)
    cond = (
        (F.col("user_id") == F.col("c_user"))
        & (F.col("conv_ts") > F.col("trig_ts"))
        & (F.col("conv_ts") <= F.col("trig_ts") + F.expr(f"INTERVAL {horizon}"))
    )
    return (
        trig.join(conv, cond, "left_outer")
        .filter(F.col("conv_ts").isNull())
        .select(
            "event_id",
            "user_id",
            F.date_format("trig_ts", "yyyy-MM-dd HH:mm:ss").alias("view_ts"),
        )
    )
