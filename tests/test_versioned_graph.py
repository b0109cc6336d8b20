"""Versioned snapshot tables + pointer-doubling hierarchy traversal."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from movie_recommendation_engine_spark.operators.graph import ancestor_roots
from movie_recommendation_engine_spark.sources.versioned import (
    read_snapshot,
    versions,
    write_snapshot,
)


def test_snapshot_versions_accumulate_and_time_travel(spark):
    d = tempfile.mkdtemp(prefix="vsnap_")
    try:
        df1 = spark.range(10).select(F.col("id"), F.lit("a").alias("tag"))
        df2 = spark.range(25).select(F.col("id"), F.lit("b").alias("tag"))
        assert write_snapshot(df1, d) == 1
        assert write_snapshot(df2, d) == 2
        assert versions(d) == [1, 2]
        assert read_snapshot(spark, d, 1).count() == 10
        assert read_snapshot(spark, d, 2).count() == 25
        # latest by default; pinned at planning time
        assert read_snapshot(spark, d).count() == 25
        # old version content untouched by the new write
        assert {r.tag for r in read_snapshot(spark, d, 1).collect()} == {"a"}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_snapshot_write_retries_on_lost_version_race(spark, monkeypatch):
    """Two writers can compute the same next version (list-then-rename
    is not atomic); the loser must republish under the next free number
    instead of crashing mid-publish (the round-3 ADVICE finding)."""
    from movie_recommendation_engine_spark.sources import versioned as V

    d = tempfile.mkdtemp(prefix="vsnap_")
    try:
        df = spark.range(5)
        assert write_snapshot(df, d) == 1
        # freeze the listing at [1], then publish v=2 "concurrently":
        # the writer under test claims 2, loses the rename, retries as 3
        monkeypatch.setattr(V, "versions", lambda p: [1])
        winner = os.path.join(d, "v=000002")
        os.makedirs(winner)
        with open(os.path.join(winner, "part-0"), "w") as fh:
            fh.write("x")  # non-empty: rename onto it must fail
        assert V.write_snapshot(df, d) == 3
        monkeypatch.undo()
        assert versions(d) == [1, 2, 3]
        assert read_snapshot(spark, d, 3).count() == 5
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_snapshot_staging_never_published(spark):
    """A leftover staging dir (crashed writer) must not appear in
    versions() — old-style (shared) and new-style (per-writer suffixed)
    alike — and must not block the next write from publishing."""
    d = tempfile.mkdtemp(prefix="vsnap_")
    try:
        write_snapshot(spark.range(3), d)
        os.makedirs(os.path.join(d, "v=000002.staging", "junk"))
        os.makedirs(os.path.join(d, "v=000002.staging.999-deadbeef", "junk"))
        assert versions(d) == [1]
        assert write_snapshot(spark.range(4), d) == 2
        assert read_snapshot(spark, d, 2).count() == 4
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_snapshot_staging_unique_per_writer(spark, monkeypatch):
    """Racing writers that claim the same version must stage to
    DISTINCT paths (round-4 ADVICE: a shared `final + ".staging"` let
    the loser rmtree/overwrite the winner's in-flight parquet job, so a
    published version could be a clobbered partial).  With per-writer
    staging, the loser's retry republishes its own complete output."""
    import re

    from movie_recommendation_engine_spark.sources import versioned as V

    d = tempfile.mkdtemp(prefix="vsnap_")
    try:
        staged: set[str] = set()

        write_snapshot(spark.range(2).withColumn("w", F.lit(0)), d)
        # capture each writer's staging path via its rename attempts
        orig_rename = os.rename

        def spy_rename(src, dst):
            if ".staging." in src:
                staged.add(src)
            return orig_rename(src, dst)

        monkeypatch.setattr(V.os, "rename", spy_rename)
        # both writers see [1] => both claim version 2
        monkeypatch.setattr(V, "versions", lambda p: [1])
        assert V.write_snapshot(spark.range(3).withColumn("w", F.lit(1)), d) == 2
        assert V.write_snapshot(spark.range(4).withColumn("w", F.lit(2)), d) == 3
        monkeypatch.undo()
        # two writers => two DISTINCT staging directories, each suffixed
        assert len(staged) == 2
        for s in staged:
            assert re.search(r"\.staging\.\d+-[0-9a-f]{32}$", s), s
        # each published version is one writer's complete output
        assert read_snapshot(spark, d, 2).count() == 3
        assert read_snapshot(spark, d, 3).count() == 4
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_snapshot_failed_write_cleans_its_staging(spark, monkeypatch):
    """An in-process write failure must not leak a snapshot-sized
    staging directory (round-5 review: per-writer staging removed the
    old shared-path cleanup and nothing reclaimed the orphans)."""
    import pytest

    from movie_recommendation_engine_spark.sources import versioned as V

    d = tempfile.mkdtemp(prefix="vsnap_")
    try:
        write_snapshot(spark.range(2), d)
        # make the publish rename fail mid-write with NO lost race
        def boom(src, dst):
            raise OSError("disk gone")

        monkeypatch.setattr(V.os, "rename", boom)
        with pytest.raises(OSError, match="disk gone"):
            V.write_snapshot(spark.range(3), d)
        monkeypatch.undo()
        assert [n for n in os.listdir(d) if ".staging" in n] == []
        assert versions(d) == [1]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_vacuum_staging_reclaims_old_orphans_only(spark):
    """vacuum_staging removes killed-writer staging dirs older than
    min_age_sec, never a fresh (possibly in-flight) one, never a
    published version."""
    from movie_recommendation_engine_spark.sources.versioned import vacuum_staging

    d = tempfile.mkdtemp(prefix="vsnap_")
    try:
        write_snapshot(spark.range(3), d)
        old = os.path.join(d, "v=000002.staging.111-aa")
        fresh = os.path.join(d, "v=000002.staging.222-bb")
        os.makedirs(old)
        os.makedirs(fresh)
        past = os.path.getmtime(old) - 48 * 3600
        os.utime(old, (past, past))
        removed = vacuum_staging(d, min_age_sec=24 * 3600)
        assert removed == [old]
        assert not os.path.exists(old)
        assert os.path.exists(fresh)  # too young: maybe in-flight
        assert versions(d) == [1]
        assert read_snapshot(spark, d, 1).count() == 3
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_ancestor_roots_deep_chain_log_rounds(spark):
    """A depth-100 path must resolve with only 7 doubling rounds
    (2^7 = 128 >= 100) — the log-round contract."""
    rows = [(i, i - 1 if i > 0 else None) for i in range(101)]
    parents = spark.createDataFrame(rows, "v long, p long").repartition(5)
    out = {r.v: (r.root, r.depth) for r in ancestor_roots(parents, rounds=7).collect()}
    assert out[0] == (0, 0)
    assert out[100] == (0, 100)
    assert out[37] == (0, 37)


def test_ancestor_roots_forest_and_branching(spark):
    rows = [
        (1, None), (2, None),          # two roots
        (10, 1), (11, 1), (12, 2),     # depth 1
        (20, 10), (21, 10), (22, 12),  # depth 2
    ]
    parents = spark.createDataFrame(rows, "v long, p long")
    out = {r.v: (r.root, r.depth) for r in ancestor_roots(parents, rounds=3).collect()}
    assert out[1] == (1, 0) and out[2] == (2, 0)
    assert out[20] == (1, 2) and out[21] == (1, 2) and out[22] == (2, 2)
