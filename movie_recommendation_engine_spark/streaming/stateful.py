"""Custom stateful streaming operator via applyInPandasWithState
(prompt §streaming: "applyInPandasWithState for custom stateful
operators").

``running_user_totals`` keeps one small state row per user (count, sum)
and emits the updated totals every micro-batch — the canonical
accumulate-and-emit shape (fraud counters, usage meters, session
credit).  State size is O(#distinct keys); pair with a key-space bound
or timeout in production.

The batch twin ``user_totals_batch`` computes what the stream converges
to — same contract as the rest of streaming/: one logic, two modes,
batch side oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total_value", T.DoubleType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType(), False),
        T.StructField("total", T.DoubleType(), False),
    ]
)


def _update_totals(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    # full precision in state — rounding per micro-batch would compound
    # across batches and drift from the batch twin; round only on emit
    state.update((n, total))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "total_value": [round(total, 6)]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming: per-user running (count, sum(value)) emitted each
    micro-batch the user appears in."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def user_totals_batch(events: DataFrame) -> DataFrame:
    """The batch twin: what the stream's last emission per user equals
    once all input is processed."""
    return events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )


EWMA_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        # nullable: a user whose every value so far is NULL has no EWMA
        T.StructField("ewma", T.DoubleType(), True),
    ]
)

EWMA_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType(), False),
        T.StructField("s", T.DoubleType(), True),  # NULL until a non-NULL value
    ]
)

# buffered (reorder-tolerant) variant: the finalized fold plus the
# still-reorderable tail held as parallel primitive arrays (cheapest
# shape through the Arrow state boundary)
EWMA_BUFFER_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType(), False),
        T.StructField("s", T.DoubleType(), True),
        T.StructField("buf_ts_ms", T.ArrayType(T.LongType(), False), False),
        T.StructField("buf_event_id", T.ArrayType(T.LongType(), False), False),
        T.StructField("buf_value", T.ArrayType(T.DoubleType(), True), False),
    ]
)


def _heal_ewma_acc(s):
    """Restore-time normalization: a checkpoint written by the pre-NULL-
    skip code can hold NaN in state.s; ``s is None`` alone would keep it
    NaN-poisoned forever after upgrade (round-5 advice).  NaN and None
    both mean 'no value seen yet'."""
    return None if s is None or pd.isna(s) else float(s)


def _fold_ewma(n: int, s, values, alpha: float):
    """The one EWMA recurrence both stateful variants share: NULLs count
    toward n_events but SKIP the accumulator (engine-wide monoid skip
    rule, mirrored in the batch twin's fold — without it one NULL
    poisoned every later emission, round-5 review)."""
    for x in values:
        n += 1
        if x is None or pd.isna(x):
            continue
        x = float(x)
        s = x if s is None else alpha * x + (1.0 - alpha) * s
    return n, s


def running_user_ewma(events: DataFrame, alpha: float = 0.3) -> DataFrame:
    """Streaming exponentially-weighted moving average per user — the
    classic online smoother/anomaly baseline, as a SECOND custom
    stateful operator (state = one (n, s) row per key; s_t = α·x_t +
    (1-α)·s_{t-1}, seeded with the first value).

    EWMA is ORDER-SENSITIVE, unlike the running-totals op: rows sort by
    (ts, event_id) WITHIN each micro-batch before folding.  This variant
    assumes in-order arrival ACROSS micro-batches (the file source
    delivers files in modification-time order); for transports that can
    reorder across batches use ``running_user_ewma_reordered``, which
    holds a watermark-bounded reorder buffer in state.  Full precision
    lives in state; emission rounds to 6 dp — the exact discipline of
    the totals op, so the stream converges bit-for-bit to the batch
    twin's JVM fold (same IEEE ops, same order).
    """

    def _update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        n, s = state.get if state.exists else (0, None)
        s = _heal_ewma_acc(s)
        pdf = pd.concat(list(batches), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"])
        n, s = _fold_ewma(n, s, pdf["value"], alpha)
        state.update((n, None if s is None else float(s)))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "ewma": [None if s is None else round(s, 6)],
            }
        )

    return (
        events.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=EWMA_OUTPUT_SCHEMA,
            stateStructType=EWMA_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def running_user_ewma_reordered(
    events: DataFrame, alpha: float = 0.3, lateness: str = "30 minutes"
) -> DataFrame:
    """EWMA that tolerates OUT-OF-ORDER arrival across micro-batches —
    the watermark + reorder-buffer companion to ``running_user_ewma``.

    Mechanics: the input stream carries ``withWatermark("ts", lateness)``
    (Spark drops rows later than the watermark before they reach the
    operator, so every arriving row can still be ordered correctly).
    State holds the finalized fold (n, s) plus a buffer of events whose
    event time is still inside the lateness horizon.  Each micro-batch:
    append arrivals to the buffer, sort the buffer by (ts, event_id),
    fold the RIPE prefix (event time STRICTLY below the current
    watermark — Spark's late filter still admits rows AT the watermark,
    so ts == wm must stay buffered or a same-timestamp smaller-id
    arrival could fold after it) into (n, s), and keep the rest
    buffered.  Emission is the TENTATIVE fold of finalized
    state extended with the sorted buffer, so the last emission equals
    the batch twin's full in-order fold whenever arrival reorder stays
    within ``lateness`` — the property the reordered-arrival test
    asserts.  State size per key is O(events inside the lateness
    horizon), the standard stream-reordering cost.

    Event times compare against the watermark in epoch millis computed
    JVM-side (``ts::double * 1000``) — pandas renders Spark timestamps
    session-timezone-naive, so comparing ``Timestamp.value`` against the
    UTC watermark would be offset by the session's UTC offset and ripen
    events hours early or late.
    """

    def _update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            n, s, b_ts, b_eid, b_val = state.get
            s = _heal_ewma_acc(s)
            buf = [
                (int(t), int(e), None if pd.isna(v) else float(v))
                for t, e, v in zip(b_ts, b_eid, b_val)
            ]
        else:
            n, s, buf = 0, None, []
        for pdf in batches:
            for t, e, v in zip(pdf["ts_ms"], pdf["event_id"], pdf["value"]):
                buf.append((int(t), int(e), None if pd.isna(v) else float(v)))
        buf.sort(key=lambda r: (r[0], r[1]))
        wm = state.getCurrentWatermarkMs()
        ripe = [r for r in buf if r[0] < wm]
        buf = [r for r in buf if r[0] >= wm]
        n, s = _fold_ewma(n, s, [v for _, _, v in ripe], alpha)
        state.update(
            (
                n,
                None if s is None else float(s),
                [r[0] for r in buf],
                [r[1] for r in buf],
                [r[2] for r in buf],
            )
        )
        # tentative emission: extend the finalized fold with the sorted
        # buffer on a copy — the buffer stays authoritative in state
        tn, ts_acc = _fold_ewma(n, s, [v for _, _, v in buf], alpha)
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [tn],
                "ewma": [None if ts_acc is None else round(ts_acc, 6)],
            }
        )

    return (
        events.select("user_id", "ts", "event_id", "value")
        # an event with no event time (or no id) cannot be ordered —
        # drop it before the stateful fold instead of crashing the
        # int() conversions in the UDF (file scans land every column
        # nullable regardless of the declared schema; same guard class
        # as the round-5 asof NULL fix)
        .filter(F.col("ts").isNotNull() & F.col("event_id").isNotNull())
        .withWatermark("ts", lateness)
        .withColumn("ts_ms", (F.col("ts").cast("double") * 1000).cast("long"))
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=EWMA_OUTPUT_SCHEMA,
            stateStructType=EWMA_BUFFER_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def user_ewma_batch(events: DataFrame, alpha: float = 0.3) -> DataFrame:
    """Batch twin: the same sequential fold as a JVM higher-order
    ``aggregate`` over the (ts, event_id)-sorted value array — one
    shuffle per user, the recursion itself runs inside codegen."""
    arr = F.array_sort(F.collect_list(F.struct("ts", "event_id", "value")))
    # NULL values skip the fold (monoid skip rule, same as the stream's
    # state update) — the unguarded recurrence nulled the accumulator at
    # a NULL element and silently RE-SEEDED at the next value, a third
    # semantics that matched neither the stream (NaN-poisoned) nor SQL
    fold = F.aggregate(
        arr,
        F.lit(None).cast("double"),
        lambda acc, x: F.when(x["value"].isNull(), acc).otherwise(
            F.when(acc.isNull(), x["value"]).otherwise(
                F.lit(alpha) * x["value"] + F.lit(1.0 - alpha) * acc
            )
        ),
    )
    return events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(fold, 6).alias("ewma"),
    )
