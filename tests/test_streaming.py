"""Streaming execution mode: the same functions the batch oracle checks,
run through readStream -> memory sink, must converge to the batch answer."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from movie_recommendation_engine_spark.streaming.events import (
    EVENTS_SCHEMA,
    dedup_events,
    read_events_stream,
    tumbling_counts,
)


@pytest.fixture(scope="module")
def events_dir(spark):
    """Three parquet files of events, written one 'arrival batch' each."""
    d = tempfile.mkdtemp(prefix="events_stream_")
    rows = [
        # (event_id, ts, user_id, event_type, value, props)
        (1, "2024-01-01 00:01:00", 1, "click", 1.0, "{}"),
        (2, "2024-01-01 00:04:00", 1, "view", 2.0, "{}"),
        (3, "2024-01-01 00:11:00", 2, "click", 3.0, "{}"),
        (3, "2024-01-01 00:11:00", 2, "click", 3.0, "{}"),  # duplicate id
        (4, "2024-01-01 00:25:00", 2, "view", 4.0, "{}"),
    ]
    df = spark.createDataFrame(
        [(i, t, u, e, v, p) for i, t, u, e, v, p in rows],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"), "user_id", "event_type",
        "value", "props",
    )
    for i in range(3):
        df.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode("append").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run_stream(spark, stream_df, name, mode):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_tumbling_stream_matches_batch(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    assert stream.isStreaming
    got = _run_stream(spark, tumbling_counts(stream, "10 minutes"), "t_tumble", "complete")
    batch = spark.read.schema(EVENTS_SCHEMA).parquet(events_dir)
    want = tumbling_counts(batch, "10 minutes")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_streaming_dedup_drops_duplicate_ids(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    got = _run_stream(spark, dedup_events(stream), "t_dedup", "append")
    ids = [r.event_id for r in got.select("event_id").collect()]
    assert sorted(ids) == [1, 2, 3, 4]  # duplicate id-3 removed


def test_stateful_running_totals_converge_to_batch(spark, events_dir):
    from movie_recommendation_engine_spark.streaming.stateful import (
        running_user_totals,
        user_totals_batch,
    )

    stream = read_events_stream(spark, events_dir)
    got = _run_stream(spark, running_user_totals(stream), "t_state", "update")
    # the memory sink accumulates every micro-batch emission; the final
    # state per user is its largest running count
    final = {}
    for r in got.collect():
        if r.user_id not in final or r.n_events > final[r.user_id][0]:
            final[r.user_id] = (r.n_events, r.total_value)
    batch = spark.read.schema(EVENTS_SCHEMA).parquet(events_dir)
    want = {
        r.user_id: (r.n_events, r.total_value)
        for r in user_totals_batch(batch).collect()
    }
    assert final == want  # cross-micro-batch state converges to batch agg


def test_foreach_batch_upsert_converges_to_batch(spark, events_dir):
    """foreachBatch upsert sink: per-user totals streamed micro-batch by
    micro-batch into a parquet state table must equal the batch answer."""
    import os

    from movie_recommendation_engine_spark.streaming.sinks import foreach_batch_upsert

    state = tempfile.mkdtemp(prefix="upsert_state_") + "/table"
    ckpt = tempfile.mkdtemp(prefix="upsert_ckpt_")
    try:
        stream = read_events_stream(spark, events_dir)
        totals = stream.groupBy("user_id").agg(
            F.count("*").alias("n"), F.sum("value").alias("total")
        )
        q = foreach_batch_upsert(totals, state, ["user_id"], ckpt)
        q.awaitTermination(120)
        got = {
            r.user_id: (r.n, r.total) for r in spark.read.parquet(state).collect()
        }
        batch = spark.read.parquet(events_dir)
        want = {
            r.user_id: (r.n, r.total)
            for r in batch.groupBy("user_id")
            .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
            .collect()
        }
        assert got == want
        assert os.path.exists(os.path.join(state, "_SUCCESS"))
    finally:
        shutil.rmtree(os.path.dirname(state), ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_foreach_batch_upsert_recovers_state_from_prev_after_crash(
    spark, events_dir
):
    """Crash window of the rename commit (round-5 review: the old
    in-place overwrite could silently replace ALL accumulated state with
    one micro-batch): if the current state dir vanished mid-commit, the
    next epoch must merge into the committed ``.prev`` copy, not start
    from scratch."""
    import os

    from movie_recommendation_engine_spark.streaming.sinks import (
        foreach_batch_upsert,
    )

    root = tempfile.mkdtemp(prefix="upsert_crash_")
    state = root + "/table"
    ckpt = tempfile.mkdtemp(prefix="upsert_crash_ckpt_")
    try:
        # pre-existing accumulated state from "before the crash", left
        # only at .prev (the crash happened between the two renames)
        prior = spark.createDataFrame(
            [(999_999, 7, 123.0)], "user_id long, n long, total double"
        )
        prior.write.parquet(state + ".prev")
        assert not os.path.exists(state)

        stream = read_events_stream(spark, events_dir)
        totals = stream.groupBy("user_id").agg(
            F.count("*").alias("n"), F.sum("value").alias("total")
        )
        q = foreach_batch_upsert(totals, state, ["user_id"], ckpt)
        q.awaitTermination(120)
        got = {r.user_id: (r.n, r.total) for r in spark.read.parquet(state).collect()}
        # the crashed-epoch state survived the recovery...
        assert got[999_999] == (7, 123.0)
        # ...and the stream's own keys merged in on top
        batch = spark.read.parquet(events_dir)
        want = {
            r.user_id: (r.n, r.total)
            for r in batch.groupBy("user_id")
            .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
            .collect()
        }
        for k, v in want.items():
            assert got[k] == v
        assert os.path.exists(os.path.join(state, "_SUCCESS"))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


@pytest.fixture(scope="module")
def attribution_dir(spark):
    """Views in one file, clicks in another — the stream-stream join must
    buffer state across trigger batches to pair them."""
    d = tempfile.mkdtemp(prefix="events_attr_")
    views = [
        (10, "2024-01-01 00:00:00", 1, "view", 1.0, "{}"),
        (20, "2024-01-01 00:02:00", 2, "view", 1.0, "{}"),
        (21, "2024-01-01 00:06:00", 2, "view", 1.0, "{}"),
        (40, "2024-01-01 01:00:00", 4, "view", 1.0, "{}"),
    ]
    clicks = [
        (11, "2024-01-01 00:05:00", 1, "click", 1.0, "{}"),  # 5m after view 10
        (12, "2024-01-01 00:20:00", 1, "click", 1.0, "{}"),  # 20m after: out
        (22, "2024-01-01 00:08:00", 2, "click", 1.0, "{}"),  # matches 20 and 21
        (30, "2024-01-01 00:01:00", 3, "click", 1.0, "{}"),  # no view at all
        (41, "2024-01-01 01:10:00", 4, "click", 1.0, "{}"),  # exactly +10m: in
        (42, "2024-01-01 01:00:00", 4, "click", 1.0, "{}"),  # same ts: out
    ]
    schema = (
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string"
    )
    for rows in (views, clicks):
        spark.createDataFrame(rows, schema).select(
            "event_id", F.col("ts").cast("timestamp").alias("ts"), "user_id",
            "event_type", "value", "props",
        ).coalesce(1).write.mode("append").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_interval_join_batch_semantics(spark, attribution_dir):
    """Strict lower bound, inclusive upper bound, per-key matching."""
    from movie_recommendation_engine_spark.streaming.joins import view_click_pairs

    batch = spark.read.schema(EVENTS_SCHEMA).parquet(attribution_dir)
    pairs = {
        (r.view_id, r.click_id)
        for r in view_click_pairs(batch, "10 minutes").collect()
    }
    assert pairs == {(10, 11), (20, 22), (21, 22), (40, 41)}


def test_stream_stream_interval_join_matches_batch(spark, attribution_dir):
    from movie_recommendation_engine_spark.streaming.joins import view_click_pairs

    stream = read_events_stream(spark, attribution_dir)
    assert stream.isStreaming
    # generous watermark: availableNow file ordering is arbitrary, so no
    # row may be evicted before its cross-batch partner arrives
    got = _run_stream(
        spark, view_click_pairs(stream, "10 minutes", watermark="2 hours"),
        "t_ssjoin", "append",
    )
    batch = spark.read.schema(EVENTS_SCHEMA).parquet(attribution_dir)
    want = view_click_pairs(batch, "10 minutes")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_gap_filled_grid_is_dense_and_zeroed(spark, events_dir):
    from movie_recommendation_engine_spark.streaming.events import gap_filled_counts

    batch = spark.read.schema(EVENTS_SCHEMA).parquet(events_dir)
    got = gap_filled_counts(batch, "10 minutes").collect()
    # fixture spans 00:00-00:25 -> 3 buckets x 2 types = 6 dense cells
    assert len(got) == 6
    zeros = [r for r in got if r.n_events == 0]
    assert zeros and all(r.sum_value == 0.0 for r in zeros)
    filled = {(r.window_start, r.event_type): r.n_events for r in got}
    assert filled[("2024-01-01 00:00:00", "click")] == 1
    assert filled[("2024-01-01 00:20:00", "click")] == 0


def test_dedup_within_watermark_drops_burst_duplicates(spark, events_dir):
    from movie_recommendation_engine_spark.streaming.events import (
        dedup_events_within_watermark,
    )

    stream = read_events_stream(spark, events_dir)
    got = _run_stream(
        spark, dedup_events_within_watermark(stream, "1 hour"), "t_dedup_wm", "append"
    )
    ids = sorted(r.event_id for r in got.select("event_id").collect())
    assert ids == [1, 2, 3, 4]  # duplicate id-3 inside the horizon removed
    # batch-mode fallback gives the same surviving ids
    batch = spark.read.schema(EVENTS_SCHEMA).parquet(events_dir)
    assert sorted(
        r.event_id for r in dedup_events_within_watermark(batch).collect()
    ) == [1, 2, 3, 4]


def test_gap_filled_empty_input_yields_empty_grid(spark):
    from movie_recommendation_engine_spark.streaming.events import (
        EVENTS_SCHEMA,
        gap_filled_counts,
    )

    empty = spark.createDataFrame([], EVENTS_SCHEMA)
    assert gap_filled_counts(empty, "10 minutes").count() == 0


def test_funnel_zero_rows_per_stage_when_first_step_absent(spark):
    from movie_recommendation_engine_spark.streaming.events import funnel_counts

    ev = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1, "click")],
        "event_id long, ts string, user_id long, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r.step: r.n_users for r in funnel_counts(ev, ["view", "click"]).collect()}
    assert got == {"view": 0, "click": 0}


def test_dynamic_session_stream_matches_batch(spark, events_dir):
    from movie_recommendation_engine_spark.streaming.events import sessionize_dynamic

    stream = read_events_stream(spark, events_dir)
    got = _run_stream(
        spark,
        sessionize_dynamic(stream, {"click": "5 minutes"}, "30 minutes"),
        "t_dynsess",
        "complete",
    )
    batch = spark.read.schema(EVENTS_SCHEMA).parquet(events_dir)
    want = sessionize_dynamic(batch, {"click": "5 minutes"}, "30 minutes")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_stream_static_enrichment_matches_batch(spark, events_dir):
    """Stream-static broadcast join: streaming result (complete mode)
    must equal the batch twin on the same files."""
    from movie_recommendation_engine_spark.streaming.events import (
        enriched_nation_rollup,
        read_events_stream,
    )

    nation = spark.createDataFrame(
        [(i, f"NATION_{i}", i % 5) for i in range(25)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    stream = read_events_stream(spark, events_dir)
    got = _run_stream(
        spark, enriched_nation_rollup(stream, nation), "t_enrich", "complete"
    )
    batch = spark.read.schema(EVENTS_SCHEMA).parquet(events_dir)
    want = enriched_nation_rollup(batch, nation)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_ohlc_stream_matches_batch(spark, events_dir):
    from movie_recommendation_engine_spark.streaming.events import ohlc_buckets

    stream = read_events_stream(spark, events_dir)
    batch = spark.read.parquet(events_dir)
    got = _run_stream(spark, ohlc_buckets(stream, "15 minutes"), "t_ohlc", "complete")
    want = ohlc_buckets(batch, "15 minutes")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_unconverted_boundary_semantics(spark):
    from movie_recommendation_engine_spark.streaming.joins import unconverted_events

    rows = [
        # (event_id, ts, user_id, event_type, value, props)
        (1, "2024-01-01 10:00:00", 1, "view", 1.0, None),      # converted at +30:00 boundary
        (2, "2024-01-01 10:00:00", 2, "view", 1.0, None),      # converted at +30:01 -> abandoned
        (3, "2024-01-01 10:00:00", 3, "view", 1.0, None),      # purchase BEFORE the view -> abandoned
        (4, "2024-01-01 10:00:00", 4, "view", 1.0, None),      # no purchase at all -> abandoned
        (5, "2024-01-01 10:00:00", 5, "view", 1.0, None),      # two purchases in window -> one row, converted
        (10, "2024-01-01 10:30:00", 1, "purchase", 1.0, None),
        (11, "2024-01-01 10:30:01", 2, "purchase", 1.0, None),
        (12, "2024-01-01 09:59:59", 3, "purchase", 1.0, None),
        (13, "2024-01-01 10:10:00", 5, "purchase", 1.0, None),
        (14, "2024-01-01 10:20:00", 5, "purchase", 1.0, None),
    ]
    df = spark.createDataFrame(
        [(i, ts, u, t, v, p) for i, ts, u, t, v, p in rows],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = sorted(r.event_id for r in unconverted_events(df, "view", "purchase", "30 minutes").collect())
    assert got == [2, 3, 4]


def test_streaming_day_hll_state_matches_batch(spark, events_dir):
    """Incremental sketch maintenance: day-level HLL distinct-user
    sketches streamed through the foreachBatch upsert sink must give
    the same per-day estimates as a batch build — the streaming twin of
    sliding_7d_active_users' persisted day-sketch state (merge sketches
    as data arrives, never rescan history)."""
    import os

    from movie_recommendation_engine_spark.streaming.sinks import foreach_batch_upsert

    state = tempfile.mkdtemp(prefix="hll_state_") + "/table"
    ckpt = tempfile.mkdtemp(prefix="hll_ckpt_")
    try:
        stream = read_events_stream(spark, events_dir)
        day_sk = stream.groupBy(
            F.date_trunc("day", "ts").alias("day")
        ).agg(F.hll_sketch_agg("user_id").alias("sk"))
        q = foreach_batch_upsert(day_sk, state, ["day"], ckpt)
        q.awaitTermination(120)
        got = {
            r.day: r.est
            for r in spark.read.parquet(state)
            .select("day", F.expr("CAST(hll_sketch_estimate(sk) AS LONG)").alias("est"))
            .collect()
        }
        batch = spark.read.parquet(events_dir)
        want = {
            r.day: r.est
            for r in batch.groupBy(F.date_trunc("day", "ts").alias("day"))
            .agg(F.expr("CAST(hll_sketch_estimate(hll_sketch_agg(user_id)) AS LONG)").alias("est"))
            .collect()
        }
        assert got == want and len(got) > 0
        # and the sketch estimates are sane vs exact distincts (3-sigma)
        exact = {
            r.day: r.n
            for r in batch.groupBy(F.date_trunc("day", "ts").alias("day"))
            .agg(F.countDistinct("user_id").alias("n"))
            .collect()
        }
        for day, est in got.items():
            assert abs(est - exact[day]) <= max(2, exact[day] * 0.05)
    finally:
        shutil.rmtree(os.path.dirname(state), ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


@pytest.fixture(scope="module")
def timeline_dir(spark):
    """Events written as three TIME-SLICED files (arrival order == event
    time order) — the in-order transport the order-sensitive EWMA op
    documents as its requirement."""
    import time as _time

    d = tempfile.mkdtemp(prefix="events_timeline_")
    rows = [
        (i, f"2024-01-01 00:{i:02d}:00", 1 + i % 2, "tick", float((i * 7) % 13), "{}")
        for i in range(30)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"), "user_id",
        "event_type", "value", "props",
    )
    for lo, hi in [(0, 10), (10, 20), (20, 30)]:
        df.filter((F.col("event_id") >= lo) & (F.col("event_id") < hi)).coalesce(
            1
        ).write.mode("append").parquet(d)
        _time.sleep(1.1)  # distinct mtimes -> deterministic file order
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_stateful_ewma_converges_to_batch(spark, timeline_dir):
    """Order-sensitive stateful op: the streamed EWMA (state folded
    across three in-order micro-batches) must equal the batch twin's
    JVM fold exactly — same IEEE ops in the same order."""
    from movie_recommendation_engine_spark.streaming.events import (
        EVENTS_SCHEMA,
        read_events_stream,
    )
    from movie_recommendation_engine_spark.streaming.stateful import (
        running_user_ewma,
        user_ewma_batch,
    )

    stream = read_events_stream(spark, timeline_dir)
    got_rows = _run_stream(spark, running_user_ewma(stream), "t_ewma", "update")
    final = {}
    for r in got_rows.collect():
        if r.user_id not in final or r.n_events > final[r.user_id][0]:
            final[r.user_id] = (r.n_events, r.ewma)
    batch = spark.read.schema(EVENTS_SCHEMA).parquet(timeline_dir)
    want = {
        r.user_id: (r.n_events, r.ewma) for r in user_ewma_batch(batch).collect()
    }
    assert final == want and len(want) == 2


def test_ewma_null_values_skip_on_both_engines(spark):
    """NULL-skip monoid rule for EWMA (round-5 review): one NULL used to
    NaN-poison the stream's accumulator forever while the batch fold
    silently RESET and re-seeded — three-way divergence.  Both twins now
    skip NULLs: [1.0, NULL, 2.0] folds to a*2 + (1-a)*1."""
    import os

    from movie_recommendation_engine_spark.streaming.events import (
        read_events_stream,
    )
    from movie_recommendation_engine_spark.streaming.stateful import (
        running_user_ewma,
        user_ewma_batch,
    )

    d = tempfile.mkdtemp(prefix="ewma_null_")
    try:
        rows = [
            (1, "2024-01-01 00:01:00", 1, "click", 1.0, "{}"),
            (2, "2024-01-01 00:02:00", 1, "click", None, "{}"),
            (3, "2024-01-01 00:03:00", 1, "click", 2.0, "{}"),
            (4, "2024-01-01 00:01:00", 2, "view", None, "{}"),  # all-NULL user
        ]
        df = spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string, "
            "value double, props string",
        ).select(
            "event_id", F.col("ts").cast("timestamp").alias("ts"),
            "user_id", "event_type", "value", "props",
        )
        df.coalesce(1).write.parquet(os.path.join(d, "batch0"))
        batch = {r.user_id: r for r in user_ewma_batch(df, alpha=0.3).collect()}
        expect = round(0.3 * 2.0 + 0.7 * 1.0, 6)
        assert batch[1].ewma == expect and batch[1].n_events == 3
        assert batch[2].ewma is None and batch[2].n_events == 1

        stream = read_events_stream(spark, os.path.join(d, "batch0"))
        got = _run_stream(
            spark, running_user_ewma(stream, alpha=0.3), "t_ewma_null", "update"
        )
        final = {}
        for r in got.collect():  # keep the last (largest-n) emission
            if r.user_id not in final or r.n_events > final[r.user_id].n_events:
                final[r.user_id] = r
        assert final[1].ewma == expect and final[1].n_events == 3
        assert final[2].ewma is None and final[2].n_events == 1
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_gap_filled_excludes_null_event_type(spark):
    from movie_recommendation_engine_spark.streaming.events import gap_filled_counts

    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:01:00", 1, "click", 1.0, "{}"),
            (2, "2024-01-01 00:02:00", 1, None, 5.0, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).select("event_id", F.col("ts").cast("timestamp").alias("ts"),
             "user_id", "event_type", "value", "props")
    rows = gap_filled_counts(df, "30 minutes").collect()
    assert all(r.event_type is not None for r in rows)
    assert sum(r.n_events for r in rows) == 1  # NULL-type row excluded, visibly


def test_ohlc_order_key_survives_wide_event_ids(spark):
    """%019d key (round-5 review): event_ids past 10 digits used to
    compare lexically out of numeric order, flipping open/close on
    timestamp ties."""
    from movie_recommendation_engine_spark.streaming.events import ohlc_buckets

    df = spark.createDataFrame(
        [
            (9_999_999_999, "2024-01-01 00:01:00", 1, "t", 10.0, "{}"),
            (10_000_000_000, "2024-01-01 00:01:00", 1, "t", 20.0, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).select("event_id", F.col("ts").cast("timestamp").alias("ts"),
             "user_id", "event_type", "value", "props")
    [r] = ohlc_buckets(df, "15 minutes", watermark=None).collect()
    assert r.open == 10.0 and r.close == 20.0  # numeric id order, not lexical


def test_nation_rollup_routes_negative_user_ids(spark):
    """pmod routing (round-5 review): Spark % keeps the sign, so a
    negative user_id routed outside 0..24 and vanished from the rollup."""
    from movie_recommendation_engine_spark.streaming.events import (
        enriched_nation_rollup,
    )

    nation = spark.createDataFrame(
        [(i, f"N{i}") for i in range(25)], "n_nationkey int, n_name string"
    )
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:01:00", -3, "click", 1.0, "{}")],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).select("event_id", F.col("ts").cast("timestamp").alias("ts"),
             "user_id", "event_type", "value", "props")
    [r] = enriched_nation_rollup(df, nation).collect()
    assert r.n_name == "N22" and r.n_events == 1  # pmod(-3, 25) = 22


def test_stateful_ewma_reordered_arrival_converges_to_batch(spark):
    """Reorder-buffer EWMA (round-5 verdict task): events arrive SHUFFLED
    within files and SWAPPED across file boundaries — reorder bounded by
    the 5-minute lateness.  The watermark-buffered variant must still
    equal the batch twin's full in-order fold, exercising all three
    paths: buffering (tail events never ripen), ripening (early events
    fold once the watermark passes them), and cross-batch sorting (the
    boundary-swapped events fold in event-time order, not arrival
    order)."""
    import os
    import random
    import time as _time

    from movie_recommendation_engine_spark.streaming.events import (
        EVENTS_SCHEMA,
        read_events_stream,
    )
    from movie_recommendation_engine_spark.streaming.stateful import (
        running_user_ewma_reordered,
        user_ewma_batch,
    )

    d = tempfile.mkdtemp(prefix="events_reordered_")
    try:
        rows = [
            (i, f"2024-01-01 00:{i:02d}:00", 1 + i % 2, "tick", float((i * 7) % 13), "{}")
            for i in range(30)
        ]
        df = spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string, "
            "value double, props string",
        ).select(
            "event_id", F.col("ts").cast("timestamp").alias("ts"), "user_id",
            "event_type", "value", "props",
        )
        # arrival files: time slices with the boundary events SWAPPED
        # across files (9<->10, 19<->20) — cross-micro-batch reorder the
        # in-order variant cannot fix — plus within-file shuffle
        slices = [list(range(0, 10)), list(range(10, 20)), list(range(20, 30))]
        slices[0][9], slices[1][0] = slices[1][0], slices[0][9]
        slices[1][9], slices[2][0] = slices[2][0], slices[1][9]
        rng = random.Random(0)
        for sl in slices:
            rng.shuffle(sl)
            df.filter(F.col("event_id").isin(sl)).coalesce(1).write.mode(
                "append"
            ).parquet(d)
            _time.sleep(1.1)  # distinct mtimes -> deterministic file order
        stream = read_events_stream(spark, d)
        got_rows = _run_stream(
            spark,
            running_user_ewma_reordered(stream, alpha=0.3, lateness="5 minutes"),
            "t_ewma_reord",
            "update",
        )
        final = {}
        for r in got_rows.collect():
            if r.user_id not in final or r.n_events > final[r.user_id][0]:
                final[r.user_id] = (r.n_events, r.ewma)
        batch = spark.read.schema(EVENTS_SCHEMA).parquet(d)
        want = {
            r.user_id: (r.n_events, r.ewma)
            for r in user_ewma_batch(batch, alpha=0.3).collect()
        }
        assert final == want and len(want) == 2
        assert all(n == 15 for n, _ in final.values())
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_ewma_state_heal_normalizes_legacy_nan():
    """A checkpoint written by the pre-NULL-skip code can hold NaN in
    state.s; restore must self-heal it to 'no value yet' (round-5
    advice) — `s is None` alone kept it NaN-poisoned forever."""
    from movie_recommendation_engine_spark.streaming.stateful import _heal_ewma_acc

    assert _heal_ewma_acc(None) is None
    assert _heal_ewma_acc(float("nan")) is None
    assert _heal_ewma_acc(2.5) == 2.5


def test_foreach_batch_upsert_sweeps_stale_epoch_dirs(spark, events_dir):
    """A failed/abandoned epoch's tmp dir must not leak forever: the
    sink sweeps stale `.epochN` siblings before committing (round-5
    advice)."""
    import os

    from movie_recommendation_engine_spark.streaming.sinks import foreach_batch_upsert

    state = tempfile.mkdtemp(prefix="upsert_sweep_") + "/table"
    ckpt = tempfile.mkdtemp(prefix="upsert_sweep_ckpt_")
    stale = state + ".epoch999"
    try:
        os.makedirs(stale)
        with open(os.path.join(stale, "part-junk.parquet"), "w") as f:
            f.write("abandoned partial write")
        stream = read_events_stream(spark, events_dir)
        totals = stream.groupBy("user_id").agg(
            F.count("*").alias("n"), F.sum("value").alias("total")
        )
        q = foreach_batch_upsert(totals, state, ["user_id"], ckpt)
        q.awaitTermination(120)
        assert not os.path.exists(stale)  # swept
        assert spark.read.parquet(state).count() > 0  # state still committed
    finally:
        shutil.rmtree(os.path.dirname(state), ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def _run_with_crash_then_recover(spark, make_stream_df, ckpt):
    """Drive a stateful stream through a REAL mid-stream crash: batch 0
    commits, an injected sink failure kills the query at the start of
    batch 1 (uncommitted), and a NEW query object restarts from the
    SAME checkpoint — Spark must replay the failed batch from
    checkpointed offsets and restore the operator state before it.
    Returns every row emitted by committed batches across both runs."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    collected = []
    crashed = {"done": False}

    def crashing_sink(df, epoch_id):
        if epoch_id == 1 and not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("injected crash before batch 1 commits")
        collected.extend(df.collect())

    q = (
        make_stream_df()
        .writeStream.foreachBatch(crashing_sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(StreamingQueryException):
        q.awaitTermination(120)
    assert crashed["done"], "crash was never injected — batching changed?"

    q2 = (
        make_stream_df()
        .writeStream.foreachBatch(crashing_sink)  # same fn; fires once only
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    return collected


def test_stateful_ewma_recovers_from_mid_stream_crash(spark, timeline_dir):
    """Round-7 verdict task 7 (in-order variant): kill the
    applyInPandasWithState EWMA after its first committed batch,
    restart from checkpoint, and the final per-user emissions must
    STILL equal the batch twin's full fold bit-for-bit — proving the
    HDFS-backed state store recovered (n, s) and the failed batch
    replayed exactly once."""
    from movie_recommendation_engine_spark.streaming.events import (
        EVENTS_SCHEMA,
        read_events_stream,
    )
    from movie_recommendation_engine_spark.streaming.stateful import (
        running_user_ewma,
        user_ewma_batch,
    )

    ckpt = tempfile.mkdtemp(prefix="ewma_crash_ckpt_")
    try:
        rows = _run_with_crash_then_recover(
            spark,
            lambda: running_user_ewma(read_events_stream(spark, timeline_dir)),
            ckpt,
        )
        final = {}
        for r in rows:
            if r.user_id not in final or r.n_events > final[r.user_id][0]:
                final[r.user_id] = (r.n_events, r.ewma)
        batch = spark.read.schema(EVENTS_SCHEMA).parquet(timeline_dir)
        want = {
            r.user_id: (r.n_events, r.ewma)
            for r in user_ewma_batch(batch).collect()
        }
        assert final == want and len(want) == 2
        assert all(n == 15 for n, _ in final.values())
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


def test_stateful_ewma_reordered_recovers_from_mid_stream_crash(spark):
    """Round-7 verdict task 7 (reorder-buffer variant): the crash lands
    while events are still BUFFERED in state (the lateness horizon
    spans file boundaries), so recovery must restore not just the
    finalized (n, s) fold but the un-ripened buffer arrays — then the
    replayed + remaining batches must converge to the batch twin."""
    import random
    import time as _time

    from movie_recommendation_engine_spark.streaming.events import (
        EVENTS_SCHEMA,
        read_events_stream,
    )
    from movie_recommendation_engine_spark.streaming.stateful import (
        running_user_ewma_reordered,
        user_ewma_batch,
    )

    d = tempfile.mkdtemp(prefix="events_reord_crash_")
    ckpt = tempfile.mkdtemp(prefix="ewma_reord_crash_ckpt_")
    try:
        rows = [
            (i, f"2024-01-01 00:{i:02d}:00", 1 + i % 2, "tick",
             float((i * 7) % 13), "{}")
            for i in range(30)
        ]
        df = spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string, "
            "value double, props string",
        ).select(
            "event_id", F.col("ts").cast("timestamp").alias("ts"), "user_id",
            "event_type", "value", "props",
        )
        slices = [list(range(0, 10)), list(range(10, 20)), list(range(20, 30))]
        slices[0][9], slices[1][0] = slices[1][0], slices[0][9]
        slices[1][9], slices[2][0] = slices[2][0], slices[1][9]
        rng = random.Random(0)
        for sl in slices:
            rng.shuffle(sl)
            df.filter(F.col("event_id").isin(sl)).coalesce(1).write.mode(
                "append"
            ).parquet(d)
            _time.sleep(1.1)
        got = _run_with_crash_then_recover(
            spark,
            lambda: running_user_ewma_reordered(
                read_events_stream(spark, d), alpha=0.3, lateness="5 minutes"
            ),
            ckpt,
        )
        final = {}
        for r in got:
            if r.user_id not in final or r.n_events > final[r.user_id][0]:
                final[r.user_id] = (r.n_events, r.ewma)
        batch = spark.read.schema(EVENTS_SCHEMA).parquet(d)
        want = {
            r.user_id: (r.n_events, r.ewma)
            for r in user_ewma_batch(batch, alpha=0.3).collect()
        }
        assert final == want and len(want) == 2
        assert all(n == 15 for n, _ in final.values())
    finally:
        shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
