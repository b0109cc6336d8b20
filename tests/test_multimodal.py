"""Multimodal plumbing: binary columns + mapInPandas feature/frame ops."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from movie_recommendation_engine_spark.operators.multimodal import (
    decode_media,
    extract_features,
    frame_sample,
    with_media_meta,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [(1, b"hello world"), (2, b"x"), (3, b"abcdefghi")]
    return spark.createDataFrame(rows, "id long, media binary")


def test_meta_struct(spark, media):
    df = with_media_meta(media, mime="image/jpeg")
    row = df.filter("id = 1").first()
    assert row.media_meta.mime == "image/jpeg"
    assert row.media_meta.width is None


def test_extract_features_values(spark, media):
    out = {r.id: r for r in extract_features(media, "id", "media").collect()}
    assert out[1].n_bytes == 11
    assert out[1].features == [11.0, float(ord("h")), float(ord("d")), 11.0]
    assert out[2].features == [1.0, float(ord("x")), float(ord("x")), 1.0]


def test_frame_sample_covers_blob(spark, media):
    frames = frame_sample(media, "id", "media", n_frames=3).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r.id, {})[r.frame_idx] = bytes(r.frame)
    assert len(by_id[3]) == 3
    assert b"".join(by_id[3][i] for i in range(3)) == b"abcdefghi"


def test_decode_is_explicit_stub(spark, media):
    with pytest.raises(NotImplementedError):
        decode_media(media)


def test_resize_rewrites_blob_and_meta(spark, media):
    from movie_recommendation_engine_spark.operators.multimodal import (
        resize_media,
        with_media_meta,
    )

    df = with_media_meta(media, "media", mime="image/fake")
    out = {
        r.id: r
        for r in resize_media(
            df, "id", "media", meta_col="media_meta", target_w=4, target_h=3
        ).collect()
    }
    assert all(len(r.media) == 12 for r in out.values())
    assert all((r.media_meta.width, r.media_meta.height) == (4, 3) for r in out.values())
    assert all(r.media_meta.mime == "image/fake" for r in out.values())
    # truncation is a prefix; short blobs are zero-padded
    src = {r.id: bytes(r.media) for r in media.collect()}
    for i, r in out.items():
        want = src[i][:12].ljust(12, b"\0")
        assert bytes(r.media) == want


def test_audio_window_energy_exact(spark):
    """Windowed energy matches a pure-Python recompute byte for byte."""
    from movie_recommendation_engine_spark.operators.multimodal import (
        audio_window_energy,
    )

    data = [(1, b"abcd" * 40), (2, b"\x80" * 10), (3, b"x"), (4, b"")]
    df = spark.createDataFrame(data, "id long, media binary")
    rows = {
        (r["id"], r["window_idx"]): r
        for r in audio_window_energy(df, "id", "media", window=64).collect()
    }
    for i, blob in data:
        samples = [b - 128 for b in blob]
        n_win = (len(samples) + 63) // 64
        for w in range(n_win):
            chunk = samples[w * 64 : (w + 1) * 64]
            r = rows[(i, w)]
            assert r["n_samples"] == len(chunk)
            assert r["energy_sq"] == sum(v * v for v in chunk)
            assert r["peak"] == max(abs(v) for v in chunk)
    # empty blob => zero windows, no sentinel row (aligned with the SQL
    # replay's ceil(len/64) = 0 windows — the round-3 ADVICE finding)
    assert not any(i == 4 for i, _ in rows)
    assert len(rows) == sum((len(b) + 63) // 64 for _, b in data)


def test_null_media_rows_excluded_not_crashed(spark):
    """A NULL binary blob used to TypeError inside every mapInPandas
    worker (len(None)) and abort the job (round-5 review); NULL media
    rows are now excluded up front, SQL-style."""
    from movie_recommendation_engine_spark.operators.multimodal import (
        audio_window_energy,
        extract_features,
        frame_sample,
        resize_media,
    )

    from movie_recommendation_engine_spark.operators.multimodal import (
        with_media_meta,
    )

    df = with_media_meta(
        spark.createDataFrame(
            [(1, bytearray(b"abcd")), (2, None)], "id long, media binary"
        ),
        "media",
        mime="image/fake",
    )
    feats = extract_features(df, "id", "media").collect()
    assert [r.id for r in feats] == [1]
    frames = frame_sample(df, "id", "media", n_frames=2).collect()
    assert {r.id for r in frames} == {1}
    resized = resize_media(
        df, "id", "media", meta_col="media_meta", target_w=2, target_h=1
    ).collect()
    assert [r.id for r in resized] == [1]
    energy = audio_window_energy(df, "id", "media", window=2).collect()
    assert {r.id for r in energy} == {1}
