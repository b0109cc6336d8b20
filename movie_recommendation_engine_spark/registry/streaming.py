"""Event-stream queries in batch mode (oracle-checked).

Every query calls the SAME functions the streaming surface uses
(streaming.events) — batch/streaming parity by construction; the
streaming execution mode itself is covered by tests/test_streaming.py
with a memory sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..streaming.events import (
    first_event_per_key,
    sessionize,
    sliding_value_stats,
    tumbling_counts,
)
from ..streaming.joins import click_attribution_stats
from ..functions.rounding import det_round
from . import _t, register


@register(
    "events_tumbling_10m",
    oracle="""
SELECT strftime(time_bucket(INTERVAL 10 MINUTE, ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def q_events_tumbling_10m(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return tumbling_counts(ev, "10 minutes").orderBy("window_start", "event_type")


@register(
    "events_sliding_10m_5m",
    oracle="""
WITH expanded AS (
  SELECT unnest([time_bucket(INTERVAL 5 MINUTE, ts),
                 time_bucket(INTERVAL 5 MINUTE, ts) - INTERVAL 5 MINUTE]) AS wstart,
         value
  FROM events)
SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS window_start,
       count(*) AS n_events,
       (floor((avg(value)) * 1000000 + 0.5) / 1000000) AS avg_value
FROM expanded
GROUP BY 1 ORDER BY 1
""",
)
def q_events_sliding_10m_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding every 5 — each event in exactly 2
    windows (the oracle expands each row into both window starts)."""
    ev = _t(spark, sf_dir, "events")
    return sliding_value_stats(ev, "10 minutes", "5 minutes").orderBy("window_start")


@register(
    "events_sessionized",
    oracle="""
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events),
sessions AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM sessions
GROUP BY user_id, session_id
ORDER BY user_id, session_start
""",
)
def q_events_sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window(gap=30m) per user; the oracle derives the same
    sessions with classic gaps-and-islands SQL — two independent
    formulations of session semantics agreeing."""
    ev = _t(spark, sf_dir, "events")
    return sessionize(ev, "30 minutes").orderBy("user_id", "session_start")


@register(
    "events_first_per_user_type",
    oracle="""
SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, user_id, event_type,
       round(value, 2) AS value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts, event_id) AS rn
  FROM events)
WHERE rn = 1
ORDER BY user_id, event_type
""",
)
def q_events_first_per_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        first_event_per_key(ev, ["user_id", "event_type"])
        .select(
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
            "user_id",
            "event_type",
            F.round("value", 2).alias("value"),
        )
        .orderBy("user_id", "event_type")
    )


@register(
    "events_click_attribution",
    oracle="""
SELECT v.user_id,
       count(*) AS n_pairs,
       count(DISTINCT v.event_id) AS n_views,
       count(DISTINCT c.event_id) AS n_clicks
FROM events v
JOIN events c
  ON c.user_id = v.user_id
 AND v.event_type = 'view' AND c.event_type = 'click'
 AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 10 MINUTE
GROUP BY v.user_id
ORDER BY v.user_id
""",
)
def q_events_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time interval join (view -> clicks within 10 minutes by the
    same user), rolled up per user.  The same function is a genuine
    stream-stream join in streaming mode (tests/test_streaming.py)."""
    ev = _t(spark, sf_dir, "events")
    return click_attribution_stats(ev, "10 minutes").orderBy("user_id")


@register(
    "events_json_props_stats",
    oracle="""
SELECT event_type,
       count(*) AS n,
       (floor((avg(CAST(json_extract_string(props, '$.k') AS INT))) * 1000000 + 0.5) / 1000000) AS avg_k,
       max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
FROM events
GROUP BY event_type ORDER BY event_type
""",
)
def q_events_json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON prop extraction (get_json_object) + grouped stats — the
    semi-structured column path."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            det_round(F.avg(k)).alias("avg_k"),
            F.max(k).alias("max_k"),
        )
        .orderBy("event_type")
    )


@register(
    "events_gap_filled_30m",
    oracle="""
WITH actual AS (
  SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS b, event_type,
         count(*) AS n, round(sum(value), 2) AS sv
  FROM events GROUP BY 1, 2),
bounds AS (SELECT min(b) AS lo, max(b) AS hi FROM actual),
grid AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 30 MINUTE)) AS b, et.event_type
  FROM bounds, (SELECT DISTINCT event_type FROM events) et)
SELECT strftime(g.b, '%Y-%m-%d %H:%M:%S') AS window_start,
       g.event_type,
       coalesce(a.n, 0) AS n_events,
       coalesce(a.sv, 0) AS sum_value
FROM grid g
LEFT JOIN actual a ON a.b = g.b AND a.event_type = g.event_type
ORDER BY 1, 2
""",
)
def q_events_gap_filled_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-filled dense time grid (resampling): every 30-minute bucket
    per event type, including silent ones."""
    from ..streaming.events import gap_filled_counts

    ev = _t(spark, sf_dir, "events")
    return gap_filled_counts(ev, "30 minutes").orderBy("window_start", "event_type")


@register(
    "events_funnel",
    oracle="""
WITH v AS (SELECT user_id, min(ts) AS t FROM events
           WHERE event_type = 'view' GROUP BY 1),
c AS (SELECT e.user_id, min(e.ts) AS t FROM events e
      JOIN v ON v.user_id = e.user_id AND e.ts > v.t
      WHERE e.event_type = 'click' GROUP BY 1),
p AS (SELECT e.user_id, min(e.ts) AS t FROM events e
      JOIN c ON c.user_id = e.user_id AND e.ts > c.t
      WHERE e.event_type = 'purchase' GROUP BY 1)
SELECT 0 AS stage, 'view' AS step, (SELECT count(*) FROM v) AS n_users
UNION ALL SELECT 1, 'click', (SELECT count(*) FROM c)
UNION ALL SELECT 2, 'purchase', (SELECT count(*) FROM p)
ORDER BY stage
""",
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view -> click -> purchase funnel: a step counts only
    strictly after the user's earliest completion of the previous
    step."""
    from ..streaming.events import funnel_counts

    ev = _t(spark, sf_dir, "events")
    return funnel_counts(ev, ["view", "click", "purchase"]).orderBy("stage")


@register(
    "events_time_features",
    oracle="""
SELECT isodow(ts) AS dow,
       hour(ts) AS hr,
       strftime(min(ts), '%Y-%m-%d') AS first_day,
       count(*) AS n,
       (floor((avg(value)) * 1000000 + 0.5) / 1000000) AS avg_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def q_events_time_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar feature extraction from event time (ISO weekday, hour,
    day rendering) — the date-function family the reference never
    touches (timestamps read and discarded, als.py:25-26).  Spark
    weekday() is Mon=0, so weekday+1 == DuckDB's isodow."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            (F.weekday("ts") + 1).alias("dow"), F.hour("ts").alias("hr")
        )
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd").alias("first_day"),
            F.count("*").alias("n"),
            det_round(F.avg("value")).alias("avg_value"),
        )
        .orderBy("dow", "hr")
    )


@register(
    "events_sessionized_dynamic",
    oracle="""
WITH g AS (
  SELECT user_id, ts, value, event_id,
         CASE WHEN event_type = 'error' THEN 300 ELSE 1800 END AS gap_s
  FROM events),
m AS (
  SELECT *, max(epoch_us(ts) + gap_s * 1000000) OVER
              (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
  FROM g),
s AS (SELECT *, CASE WHEN prev_end IS NULL OR epoch_us(ts) >= prev_end
                     THEN 1 ELSE 0 END AS brk
      FROM m),
i AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM s)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM i
GROUP BY user_id, sid
ORDER BY user_id, session_start
""",
)
def q_events_sessionized_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-gap sessions: error events hold the session open only 5
    minutes, everything else 30.  The oracle re-derives the same merge
    semantics ([ts, ts+gap) interval overlap) as a running-max
    gaps-and-islands over exact microsecond epochs."""
    from ..streaming.events import sessionize_dynamic

    ev = _t(spark, sf_dir, "events")
    return sessionize_dynamic(ev, {"error": "5 minutes"}, "30 minutes").orderBy(
        "user_id", "session_start"
    )


@register(
    "events_nation_rollup",
    oracle="""
SELECT strftime(time_bucket(INTERVAL 1 HOUR, e.ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       n.n_name,
       count(*) AS n_events,
       round(sum(e.value), 2) AS sum_value
FROM events e JOIN nation n
  ON n.n_nationkey = ((e.user_id % 25) + 25) % 25  -- pmod, mirrors the engine
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def q_events_nation_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast enrichment + hourly rollup (batch twin of
    the streaming operator; the streaming-mode test drives the same
    code through readStream).  Stream-static joins hold no join state —
    the dimension broadcasts fresh per micro-batch."""
    from ..streaming.events import enriched_nation_rollup

    ev = _t(spark, sf_dir, "events")
    nat = _t(spark, sf_dir, "nation")
    return enriched_nation_rollup(ev, nat).orderBy("window_start", "n_name")


@register(
    "events_value_outliers",
    oracle="""
WITH stats AS (
  SELECT event_type AS et, avg(value) AS mu, stddev_samp(value) AS sigma
  FROM events GROUP BY 1),
z AS (
  SELECT e.event_id, e.event_type, e.value,
         (e.value - s.mu) / s.sigma AS zscore
  FROM events e JOIN stats s ON s.et = e.event_type)
SELECT event_type,
       count(*) AS n,
       CAST(sum(CASE WHEN abs(zscore) > 2.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       round(max(abs(zscore)), 6) AS max_abs_z
FROM z
GROUP BY event_type
ORDER BY event_type
""",
)
def q_events_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score outlier screening per event type: per-type mean/stddev
    join back as a broadcast (tiny stats table), flag |z| > 2.5 — the
    one-pass-plus-broadcast shape of distributed anomaly detection."""
    ev = _t(spark, sf_dir, "events")
    stats = ev.groupBy(F.col("event_type").alias("et")).agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    z = (
        ev.join(F.broadcast(stats), ev.event_type == stats.et)
        .withColumn("zscore", (F.col("value") - F.col("mu")) / F.col("sigma"))
    )
    return (
        z.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.abs("zscore") > 2.5, 1).otherwise(0)).alias("n_outliers"),
            F.round(F.max(F.abs("zscore")), 6).alias("max_abs_z"),
        )
        .orderBy("event_type")
    )


@register(
    "events_ohlc_15m",
    oracle="""
WITH keyed AS (
  SELECT time_bucket(INTERVAL 15 MINUTE, ts) AS b, event_type, value,
         printf('%019d-%019d', epoch_us(ts), event_id) AS ord
  FROM events)
SELECT strftime(b, '%Y-%m-%d %H:%M:%S') AS bucket_start, event_type,
       round(arg_min(value, ord), 6) AS open,
       round(max(value), 6) AS high,
       round(min(value), 6) AS low,
       round(arg_max(value, ord), 6) AS close,
       count(*) AS n_events
FROM keyed
GROUP BY b, event_type
ORDER BY bucket_start, event_type
""",
)
def q_events_ohlc_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling — the classic time-series resample (open/high/
    low/close per 15-minute bucket per series), via streaming.events.
    ohlc_buckets: one single-shuffle aggregate whose open/close are
    min_by/max_by over a zero-padded (epoch_us, event_id) string key
    (DuckDB's arg_min/arg_max take only scalar keys, so both engines
    order by the identical padded string, deterministic under ts ties).
    The same plan runs as a watermarked streaming aggregation —
    tests/test_streaming.py proves stream == batch."""
    from ..streaming.events import ohlc_buckets

    ev = _t(spark, sf_dir, "events")
    return ohlc_buckets(ev, "15 minutes").orderBy("bucket_start", "event_type")


@register(
    "events_abandoned_views",
    oracle="""
SELECT v.event_id, v.user_id, strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS view_ts
FROM events v
WHERE v.event_type = 'view'
  AND NOT EXISTS (SELECT 1 FROM events p
                  WHERE p.event_type = 'purchase'
                    AND p.user_id = v.user_id
                    AND p.ts > v.ts
                    AND p.ts <= v.ts + INTERVAL 30 MINUTE)
ORDER BY v.event_id
""",
)
def q_events_abandoned_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cart abandonment: views never followed by a same-user purchase
    within 30 minutes — the temporal NOT EXISTS, run as a left-outer
    interval join + IS NULL filter (streaming/joins.unconverted_events)
    so the identical plan is legal as a watermarked stream-stream join
    (anti joins are not; absence becomes emittable once the purchase
    watermark passes view_ts + horizon)."""
    from ..streaming.joins import unconverted_events

    ev = _t(spark, sf_dir, "events")
    return unconverted_events(ev, "view", "purchase", "30 minutes").orderBy("event_id")


@register(
    "user_value_median_arrow",
    oracle="""
SELECT user_id, count(*) AS n,
       round(median(value), 6) AS median_value,
       round(min(value), 6) AS min_value,
       round(max(value), 6) AS max_value
FROM events
GROUP BY user_id
ORDER BY user_id
""",
)
def q_user_value_median_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exact median via the Arrow grouped-map path
    (operators/arrowops.py::grouped_value_stats_arrow) — applyInPandas
    under the FULL value hash: the median is a pure function of the
    value multiset, so the pandas computation agrees with DuckDB's
    median() bit-for-bit (a mean would not — summation order)."""
    from ..operators.arrowops import grouped_value_stats_arrow

    ev = _t(spark, sf_dir, "events")
    return grouped_value_stats_arrow(ev, "user_id", "value").orderBy("user_id")


@register(
    "events_cusum_alerts",
    oracle="""
WITH r AS (
  SELECT user_id, event_id, ts,
         sum(CAST(value AS DECIMAL(18,2)) - 75)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS r
  FROM events),
c AS (
  SELECT *, r - least(CAST(0 AS DECIMAL(38,2)),
                      min(r) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING)) AS s
  FROM r)
SELECT user_id, event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
       CAST(s * 100 AS BIGINT) AS cusum_cents
FROM c WHERE s > 300
ORDER BY user_id, event_id
""",
)
def q_events_cusum_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM drift detection per user — the control-chart changepoint
    alarm (Page 1954): alert when the clamped cumulative exceedance
    s_t = max(0, s_{t-1} + x_t - k) crosses h.  The recursion has a
    closed WINDOW form, s_t = R_t - min(0, min_{j<=t} R_j) with
    R_t = running sum of (x - k) — two cumulative windows over the
    per-user (ts, event_id) total order, no iteration.

    Determinism: window CUMULATIVE sums may ASSOCIATE differently per
    engine (segment trees vs sequential), so the summand is exact
    DECIMAL cents — order- and association-free — and the s > h test is
    exact; the ts/event_id ordering key is unique.  The alarm value is
    emitted as integer CENTS — DuckDB converts INT128-backed decimals
    to double via a reciprocal multiply (302.38 -> 302.3800000000001),
    so a decimal->double cast would hash-diverge; integers cannot.
    k=75 sits above the value mean (~50) so s resets between genuine
    high-value runs; h=300 flags sustained drift, not single spikes."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = F.sum(F.col("value").cast("decimal(18,2)") - F.lit(75)).over(w)
    zero = F.lit(0).cast("decimal(38,2)")
    base = ev.select("user_id", "event_id", "ts", r.alias("r"))
    s = F.col("r") - F.least(zero, F.min("r").over(w))
    return (
        base.select(
            "user_id",
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
            s.alias("__s"),
        )
        .filter(F.col("__s") > 300)
        .select(
            "user_id",
            "event_id",
            "ts",
            (F.col("__s") * 100).cast("long").alias("cusum_cents"),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "events_forward_fill",
    oracle="""
WITH holes AS (
  SELECT event_id, user_id, ts,
         CASE WHEN (CAST(('0x' || substr(md5(concat_ws(chr(1), 'ff',
                    CAST(event_id AS VARCHAR))), 1, 8)) AS BIGINT)
                    / 4294967296.0) < 0.4
              THEN NULL ELSE value END AS v
  FROM events),
filled AS (
  SELECT event_id, user_id, (v IS NULL) AS was_null,
         last_value(v IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
  FROM holes)
SELECT event_id, user_id, was_null, filled_value
FROM filled ORDER BY event_id
""",
)
def q_events_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-value imputation by per-key forward fill (LOCF — the
    time-series repair step before feature extraction): 40% of values
    are knocked out deterministically by content hash, then refilled
    with the most recent non-null observation per user.  One window
    partitioned PER USER over the (ts, event_id) total order — bounded
    state, parallel across keys; leading nulls stay null (nothing to
    carry), and the filled values are untouched doubles (no arithmetic),
    so the whole repair is bit-exact on any engine."""
    from pyspark.sql import Window

    from ..functions.hashing import uniform_hash

    ev = _t(spark, sf_dir, "events")
    holes = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.when(uniform_hash("event_id", salt="ff") < 0.4, F.lit(None)).otherwise(
            F.col("value")
        ).alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        holes.select(
            "event_id",
            "user_id",
            F.col("v").isNull().alias("was_null"),
            F.last("v", ignorenulls=True).over(w).alias("filled_value"),
        )
        .orderBy("event_id")
    )


@register(
    "events_rolling_median5",
    oracle="""
WITH r AS (
  SELECT event_id, user_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         median(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS med5
  FROM events)
SELECT event_id, user_id, med5
FROM r WHERE rn >= 5 ORDER BY event_id
""",
)
def q_events_rolling_median5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-median smoothing (window of 5) per user over the event
    stream — the robust time-series denoiser (a rolling MEAN chases
    every spike; the median ignores them).  Odd window length is the
    exactness trick: the median of 5 values is always a SELECTED
    element, never an interpolation, so both engines return the
    identical raw double (partial leading windows are even-sized and
    interpolate differently across engines — they are excluded by the
    rn >= 5 guard, which is also the analytics-correct 'warm-up'
    cutoff).  One window partitioned per user: bounded state, parallel
    across keys."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w5 = w.rowsBetween(-4, Window.currentRow)
    r = ev.select(
        "event_id",
        "user_id",
        F.row_number().over(w).alias("rn"),
        F.expr("percentile(value, 0.5)").over(w5).alias("med5"),
    )
    return r.filter(F.col("rn") >= 5).select("event_id", "user_id", "med5").orderBy(
        "event_id"
    )
