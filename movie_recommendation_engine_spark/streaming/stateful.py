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


def running_user_ewma(events: DataFrame, alpha: float = 0.3) -> DataFrame:
    """Streaming exponentially-weighted moving average per user — the
    classic online smoother/anomaly baseline, as a SECOND custom
    stateful operator (state = one (n, s) row per key; s_t = α·x_t +
    (1-α)·s_{t-1}, seeded with the first value).

    EWMA is ORDER-SENSITIVE, unlike the running-totals op: rows sort by
    (ts, event_id) WITHIN each micro-batch before folding, and
    cross-batch correctness requires in-order arrival (the file source
    delivers files in modification-time order; pair with a watermark +
    small reorder buffer when the transport can reorder).  Full
    precision lives in state; emission rounds to 6 dp — the exact
    discipline of the totals op, so the stream converges bit-for-bit to
    the batch twin's JVM fold (same IEEE ops, same order).
    """

    def _update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        n, s = state.get if state.exists else (0, None)
        pdf = pd.concat(list(batches), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"])
        for x in pdf["value"]:
            n += 1
            # NULL values (NaN through Arrow) SKIP the accumulator —
            # the engine-wide monoid skip rule, mirrored in the batch
            # twin's fold.  Without the guard one NULL poisoned the
            # EWMA to NaN for every later emission (round-5 review).
            if pd.isna(x):
                continue
            x = float(x)
            s = x if s is None else alpha * x + (1.0 - alpha) * s
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
