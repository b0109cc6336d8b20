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
