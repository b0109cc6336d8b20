"""Fourth batch: event-time operators vs sequential references —
per-event-gap sessionization against an interval-merge replay, and the
batch EWMA fold against the textbook recurrence.  Both operators feed
streaming queries whose stream==batch parity is already tested; these
pin that the BATCH side itself computes the right thing on arbitrary
event streams (duplicate timestamps, interleaved users, gap-type mixes
that hand-written examples never cover)."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import given, settings, strategies as st

BASE = datetime(2024, 3, 1, 12, 0, 0)

events_strategy = st.lists(
    st.tuples(
        st.integers(1, 3),  # user_id
        st.integers(0, 120),  # ts offset seconds
        st.sampled_from(["click", "error"]),
        st.integers(1, 9),  # value
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=8, deadline=None)
@given(events=events_strategy)
def test_sessionize_dynamic_equals_interval_merge(spark_global, events):
    """sessionize_dynamic == the per-user interval-merge replay: each
    event holds its session open for its OWN type's gap (error 5 s,
    default 30 s); sessions merge while the next event starts at or
    before the current merged end; session_start is the first event's ts,
    n_events/sum_value aggregate the merged run."""
    from movie_recommendation_engine_spark.streaming.events import (
        sessionize_dynamic,
    )

    spark = spark_global
    rows = [
        (u, BASE + timedelta(seconds=off), et, float(v))
        for u, off, et, v in events
    ]
    df = spark.createDataFrame(
        rows, "user_id int, ts timestamp, event_type string, value double"
    )
    got = sorted(
        (r.user_id, r.session_start, r.n_events, r.sum_value)
        for r in sessionize_dynamic(
            df,
            gaps_by_type={"error": "5 seconds"},
            default_gap="30 seconds",
        ).collect()
    )

    gap_s = {"error": 5, "click": 30}
    want = []
    by_user: dict[int, list] = {}
    for u, off, et, v in events:
        by_user.setdefault(u, []).append((off, et, v))
    for u, evs in by_user.items():
        evs.sort()
        sess = None
        for off, et, v in evs:
            end = off + gap_s[et]
            # session_window's boundary is inclusive: an event landing
            # exactly at the current session end still extends it
            if sess is None or off > sess["end"]:
                if sess is not None:
                    want.append(sess)
                sess = {"u": u, "start": off, "end": end, "n": 1, "s": v}
            else:
                sess["end"] = max(sess["end"], end)
                sess["n"] += 1
                sess["s"] += v
        want.append(sess)
    want_rows = sorted(
        (
            s["u"],
            (BASE + timedelta(seconds=s["start"])).strftime("%Y-%m-%d %H:%M:%S"),
            s["n"],
            round(float(s["s"]), 2),
        )
        for s in want
    )
    assert got == want_rows


ewma_events_strategy = st.lists(
    st.tuples(
        st.integers(1, 3),  # user_id
        st.integers(0, 50),  # ts offset
        st.integers(0, 99),  # event_id (tiebreak)
        st.integers(1, 100),  # value
    ),
    min_size=1,
    max_size=30,
    unique_by=lambda t: (t[0], t[1], t[2]),
)


@settings(max_examples=8, deadline=None)
@given(events=ewma_events_strategy)
def test_ewma_batch_equals_sequential_fold(spark_global, events):
    """user_ewma_batch == the textbook recurrence s_t = a*x_t +
    (1-a)*s_{t-1} folded over the (ts, event_id)-sorted values in
    float64 — the JVM higher-order aggregate performs the same IEEE
    operations in the same order."""
    from movie_recommendation_engine_spark.streaming.stateful import (
        user_ewma_batch,
    )

    spark = spark_global
    rows = [
        (u, BASE + timedelta(seconds=off), f"e{eid:03d}", float(v))
        for u, off, eid, v in events
    ]
    df = spark.createDataFrame(
        rows, "user_id int, ts timestamp, event_id string, value double"
    )
    got = {
        r.user_id: (r.n_events, r.ewma)
        for r in user_ewma_batch(df, alpha=0.3).collect()
    }

    by_user: dict[int, list] = {}
    for u, off, eid, v in events:
        by_user.setdefault(u, []).append((off, f"e{eid:03d}", float(v)))
    for u, evs in by_user.items():
        evs.sort()
        s = None
        for _, _, x in evs:
            s = x if s is None else 0.3 * x + (1.0 - 0.3) * s
        assert got[u][0] == len(evs)
        assert abs(got[u][1] - round(s, 6)) < 2e-6, (u, got[u], s)
    assert set(got) == set(by_user)
