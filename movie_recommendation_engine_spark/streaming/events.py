"""Structured Streaming surface over the events table (SURVEY §2.10 —
additive: the reference has no streaming at all; timestamps are read and
discarded at als.py:25-26).

Design rule: every transformation here is written against a plain
DataFrame and works identically for BATCH and STREAMING inputs — the
registry runs them in batch mode against the DuckDB oracle, and the
streaming tests run the very same functions over ``readStream`` with a
memory sink.  That is the Spark-idiomatic way to get a tested streaming
surface: one logical plan, two execution modes.

Scale notes: windowed aggregations shuffle on (window, key) — at 100 TB
set watermarks tight enough that state store size stays bounded
(state ~ #open-windows x #keys); dropDuplicates state is keyed by the
dedup columns and likewise bounded by the watermark horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.rounding import det_round
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over events parquet (path may be a glob)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def tumbling_counts(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str | None = "30 minutes",
) -> DataFrame:
    """Per-(window, event_type) count + value sum.  Watermark bounds the
    state store and drops late data in streaming mode; in batch mode
    withWatermark is a no-op, so the same code serves both."""
    df = events.withWatermark("ts", watermark) if watermark and events.isStreaming else events
    return (
        df.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_value_stats(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str | None = "30 minutes",
) -> DataFrame:
    """Sliding-window event counts/averages (each event lands in
    window/slide overlapping windows)."""
    df = events.withWatermark("ts", watermark) if watermark and events.isStreaming else events
    return (
        df.groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.count("*").alias("n_events"), det_round(F.avg("value")).alias("avg_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_events",
            "avg_value",
        )
    )


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Per-user session aggregation with a dynamic session window: a
    session closes after ``gap`` of inactivity."""
    df = events.withWatermark("ts", watermark) if watermark and events.isStreaming else events
    return (
        df.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


def enriched_nation_rollup(
    events: DataFrame,
    nation: DataFrame,
    window: str = "1 hour",
    watermark: str | None = "30 minutes",
) -> DataFrame:
    """Stream-static broadcast enrichment + windowed rollup.

    Each event routes to a nation through a deterministic key
    (user_id % 25 — the demo routing table; swap in a real user->dim
    mapping) and joins the STATIC dimension.  Stream-static joins keep
    NO join state: the static side is broadcast fresh into every
    micro-batch, so dimension updates between batches are picked up and
    the state store only holds the windowed aggregate.  Identical code
    serves batch mode (withWatermark no-ops)."""
    df = events.withWatermark("ts", watermark) if watermark and events.isStreaming else events
    dim = nation.select(F.col("n_nationkey").cast("long").alias("__nk"), "n_name")
    # pmod, not %: Spark's % keeps the sign, so a negative user_id would
    # route outside 0..24 and silently vanish in the inner join (NULL
    # user_ids are likewise dropped by the join — the SQL convention)
    return (
        df.withColumn("__nk", F.pmod(F.col("user_id"), F.lit(25)))
        .join(F.broadcast(dim), "__nk")
        .groupBy(F.window("ts", window).alias("w"), "n_name")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_name",
            "n_events",
            "sum_value",
        )
    )


def dedup_events(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Streaming exact dedup on event_id.

    State contract (round-5 review corrected the old claim): with the
    event-time column NOT in the dedup keys, Structured Streaming keeps
    one state entry per distinct event_id FOREVER — the watermark does
    not evict dropDuplicates state unless the watermarked column is
    part of the keys.  This variant is for BOUNDED id spaces (replayed
    catch-up runs, sessions with a known key universe); for unbounded
    production streams use ``dedup_events_within_watermark``, whose
    state really is bounded by the horizon."""
    df = events.withWatermark("ts", watermark) if events.isStreaming else events
    return df.dropDuplicates(["event_id"])


def first_event_per_key(
    events: DataFrame, keys: list[str] | None = None
) -> DataFrame:
    """Batch-deterministic 'keep first arrival' dedup: the earliest
    (ts, event_id) row per key — what streaming dropDuplicates converges
    to when events arrive in time order.  Window-based so it is
    oracle-checkable (plain dropDuplicates keeps an arbitrary row)."""
    keys = keys or ["user_id", "event_type"]
    w = Window.partitionBy(*keys).orderBy("ts", "event_id")
    return (
        events.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def gap_filled_counts(events: DataFrame, window: str = "30 minutes") -> DataFrame:
    """Dense tumbling-window counts: every (bucket, event_type) cell
    between the first and last observed bucket, zero-filled where no
    events landed — time-series resampling for downstream models that
    need a gapless grid.

    NULL event_type rows are EXCLUDED up front (round-5 review): left
    alone they poisoned the grid — the equality join can never match a
    NULL key, so their real counts vanished while the grid still showed
    a zero-filled NULL row.  Excluding them is the SQL-join convention
    and makes the drop explicit instead of silent.

    Batch-only (the dense grid needs global bounds).  The grid itself is
    generated distributively: a one-row bounds aggregate is broadcast
    onto the distinct event types (operators.relational.with_scalars
    pattern), then ``sequence()`` explodes the timestamps — no driver
    loop, and the grid size is #buckets x #types regardless of event
    volume.  The join back to the actual aggregate is a broadcast of
    whichever side is smaller.
    """
    from ..operators.relational import with_scalars

    events = events.filter(F.col("event_type").isNotNull())
    actual = (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("bucket"), "event_type", "n_events", "sum_value")
    )
    bounds = actual.agg(F.min("bucket").alias("__lo"), F.max("bucket").alias("__hi"))
    types = events.select("event_type").distinct()
    grid = with_scalars(types, bounds).select(
        "event_type",
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.expr(f"interval {window}"))
        ).alias("bucket"),
    )
    return (
        grid.join(actual, ["bucket", "event_type"], "left")
        .select(
            F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
        )
    )


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel analysis: how many users reach each step, where a
    step only counts if it happens strictly AFTER the user's (earliest)
    completion of the previous step.

    Stage i is a join-chain: events of step i ⋈ stage i-1 on user with
    ``ts > prev_ts``, reduced to the earliest qualifying timestamp per
    user.  Every stage shuffles on the user key only — at 100 TB the
    stage frames shrink monotonically (funnels only narrow), so each
    successive join is cheaper, and the per-stage reduction is a
    partial-aggregated min.  Returns (stage, step, n_users).
    """
    prev = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("__t"))
    )
    frames = [
        prev.agg(F.count("*").alias("n_users")).select(
            F.lit(0).alias("stage"), F.lit(steps[0]).alias("step"), "n_users"
        )
    ]
    for i, step in enumerate(steps[1:], start=1):
        nxt = (
            events.filter(F.col(type_col) == step)
            .join(prev.withColumnRenamed("__t", "__prev_t"), user_col)
            .filter(F.col(ts_col) > F.col("__prev_t"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias("__t"))
        )
        frames.append(
            nxt.agg(F.count("*").alias("n_users")).select(
                F.lit(i).alias("stage"), F.lit(step).alias("step"), "n_users"
            )
        )
        prev = nxt
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def dedup_events_within_watermark(
    events: DataFrame, watermark: str = "30 minutes"
) -> DataFrame:
    """Streaming dedup with PROVABLY bounded state:
    ``dropDuplicatesWithinWatermark`` evicts a key's state as soon as
    the watermark passes its event time, so the state store holds only
    the trailing watermark window of keys — the contract plain
    ``dropDuplicates`` (state forever, per key) cannot give.  Use this
    form when duplicates are bursty (retries, at-least-once sources)
    and never separated by more than the watermark horizon.  Falls back
    to plain dropDuplicates in batch mode, where the distinction is
    moot."""
    if not events.isStreaming:
        return events.dropDuplicates(["event_id"])
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def sessionize_dynamic(
    events: DataFrame,
    gaps_by_type: dict[str, str] | None = None,
    default_gap: str = "30 minutes",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Per-user sessions whose inactivity gap depends on the EVENT: each
    event holds its session open for its own type's horizon (e.g. an
    error closes a session fast, a purchase keeps it alive).  This is
    ``session_window`` with a gap *expression* — the state-store
    semantics (merge overlapping [ts, ts+gap) intervals) are identical
    in batch and streaming."""
    gaps_by_type = gaps_by_type or {"error": "5 minutes"}
    gap = None
    for etype, g in gaps_by_type.items():
        cond = F.when(F.col("event_type") == etype, F.lit(g))
        gap = cond if gap is None else gap.when(F.col("event_type") == etype, F.lit(g))
    gap = gap.otherwise(F.lit(default_gap))
    df = events.withWatermark("ts", watermark) if watermark and events.isStreaming else events
    return (
        df.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


def ohlc_buckets(
    events: DataFrame,
    window: str = "15 minutes",
    watermark: str | None = "30 minutes",
) -> DataFrame:
    """OHLC downsampling per (tumbling bucket, event_type): open/close
    via min_by/max_by over a zero-padded (epoch_us, event_id) string key
    — deterministic under timestamp ties, a single aggregate with no
    window-function pass, and the identical scalar key an arg_min-style
    SQL oracle can order by.  Batch and streaming share the plan; in
    streaming the watermark closes buckets and bounds state to
    #open-buckets x #types."""
    df = events.withWatermark("ts", watermark) if watermark and events.isStreaming else events
    # %019d covers the FULL non-negative long range (19 digits): the old
    # %016d/%010d widths overflowed for event_ids past 10 digits, where
    # lexical order no longer matched numeric order and min_by/max_by
    # picked the wrong open/close row (round-5 review).  Pre-1970
    # timestamps and negative ids remain out of contract (the sign char
    # breaks zero-padding) — both engines share this key verbatim.
    ordk = F.format_string(
        "%019d-%019d", F.unix_micros(F.col("ts").cast("timestamp")), F.col("event_id")
    )
    return (
        df.select(
            F.window("ts", window).alias("w"), "event_type", "value", ordk.alias("ord")
        )
        .groupBy("w", "event_type")
        .agg(
            F.round(F.min_by("value", F.col("ord")), 6).alias("open"),
            F.round(F.max("value"), 6).alias("high"),
            F.round(F.min("value"), 6).alias("low"),
            F.round(F.max_by("value", F.col("ord")), 6).alias("close"),
            F.count("*").alias("n_events"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "n_events",
        )
    )
