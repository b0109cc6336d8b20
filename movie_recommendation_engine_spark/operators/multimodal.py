"""Multimodal column plumbing (prompt §"Multimodal columns").

Convention: media travels as an opaque ``binary`` column plus a typed
metadata struct — the parquet-native layout for image/audio/video at
100 TB (no re-encoding, predicate pushdown on the metadata, the blob
column pruned away unless actually selected).

The *decode* step (JPEG -> pixels, PCM -> samples, video -> frames)
needs codec libraries that are not in this container, so it is STUBBED:
``decode_media`` raises NotImplementedError by design, and
``extract_features`` ships a clearly-marked deterministic fake
(byte-level features) so the Spark-side plumbing — schema contract,
Arrow batch shape, mapInPandas partitioning — is real and testable
end-to-end.  Swapping in a real decoder is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)


def with_media_meta(
    df: DataFrame,
    bin_col: str = "media",
    mime: str = "application/octet-stream",
) -> DataFrame:
    """Attach the typed metadata struct next to a binary column."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ),
    )


def decode_media(df: DataFrame, bin_col: str = "media") -> DataFrame:
    """REAL DECODE NOT AVAILABLE IN THIS ENVIRONMENT.

    A production implementation runs a codec (Pillow/ffmpeg/soundfile)
    inside mapInPandas exactly like extract_features below; the
    container has no codec libraries, so this raises by contract."""
    raise NotImplementedError(
        "media decode requires codec libraries not present in this container; "
        "use extract_features (deterministic fake) for plumbing tests"
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), False),
    ]
)


def extract_features(
    df: DataFrame, id_col: str, bin_col: str, dim: int = 4
) -> DataFrame:
    """Arrow-batched feature extraction over a binary column.

    DETERMINISTIC FAKE standing in for a real decoder+encoder: features
    are byte-level statistics (length, first byte, last byte, length mod
    251), so tests and oracles can verify the mapInPandas plumbing
    bit-for-bit.  A real image/audio featurizer replaces only the body
    of ``batch_features`` — the schema contract and batch shape stay.
    """

    def batch_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[bin_col]
            n = blobs.map(len)
            feats = [
                [
                    float(ln),
                    float(b[0]) if ln else 0.0,
                    float(b[-1]) if ln else 0.0,
                    float(ln % 251),
                ][:dim]
                for b, ln in zip(blobs, n)
            ]
            yield pd.DataFrame(
                {"id": pdf[id_col], "n_bytes": n.astype("int64"), "features": feats}
            )

    # NULL media rows are excluded (SQL aggregate convention): len(None)
    # inside the Python worker would abort the whole job (round-5 review)
    return (
        df.filter(F.col(bin_col).isNotNull())
        .select(id_col, bin_col)
        .mapInPandas(batch_features, FEATURE_SCHEMA)
    )


def frame_sample(
    df: DataFrame, id_col: str, bin_col: str, n_frames: int = 3
) -> DataFrame:
    """Deterministic fake video frame sampler: splits the blob into
    n_frames equal byte slices (real impl: ffmpeg keyframe extraction
    in the same mapInPandas shape).  Output: one row per (id, frame_idx,
    frame binary)."""

    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType(), False),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for i, blob in zip(pdf[id_col], pdf[bin_col]):
                ln = len(blob)
                step = max(ln // n_frames, 1)
                for j in range(n_frames):
                    ids.append(i)
                    idxs.append(j)
                    frames.append(bytes(blob[j * step : (j + 1) * step]))
            yield pd.DataFrame({"id": ids, "frame_idx": idxs, "frame": frames})

    return (
        df.filter(F.col(bin_col).isNotNull())  # NULL media: excluded, never a worker crash
        .select(id_col, bin_col)
        .mapInPandas(sample, schema)
    )


def resize_media(
    df: DataFrame,
    id_col: str,
    bin_col: str,
    meta_col: str = "meta",
    target_w: int = 64,
    target_h: int = 64,
) -> DataFrame:
    """Deterministic fake resize: truncates/pads the blob to
    ``target_w * target_h`` bytes and rewrites the metadata struct to
    the new dimensions (real impl: PIL/libvips resize in the same
    mapInPandas shape — the schema contract, metadata rewrite, and
    Arrow batch flow are the real plumbing under test).  Output keeps
    (id, resized binary, updated meta)."""
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField(bin_col, T.BinaryType(), False),
            T.StructField(meta_col, MEDIA_META_SCHEMA, True),
        ]
    )
    target = target_w * target_h

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = [
                bytes(b[:target]).ljust(target, b"\0") for b in pdf[bin_col]
            ]
            metas = [
                {
                    "mime": (m or {}).get("mime"),
                    "width": target_w,
                    "height": target_h,
                    "duration_ms": (m or {}).get("duration_ms"),
                }
                for m in pdf[meta_col]
            ]
            yield pd.DataFrame({"id": pdf[id_col], bin_col: blobs, meta_col: metas})

    return (
        df.filter(F.col(bin_col).isNotNull())  # NULL media: excluded, never a worker crash
        .select(id_col, bin_col, meta_col)
        .mapInPandas(resize, schema)
    )


def audio_window_energy(
    df: DataFrame, id_col: str, bin_col: str, window: int = 64
) -> DataFrame:
    """Windowed audio-energy extraction over a binary column — the audio
    leg of the multimodal surface (image = extract_features, video =
    frame_sample).

    The blob is interpreted as unsigned 8-bit PCM centered at 128
    (DETERMINISTIC FAKE decode, like the other two legs: a real
    implementation swaps in soundfile/ffmpeg sample decoding; the
    mapInPandas schema contract, Arrow batch shape, and windowing stay).
    Per window of ``window`` samples it emits the sample count, the
    EXACT integer energy sum((b-128)^2), and the peak |b-128| —
    all-integer outputs, so the pipeline is value-hash gatable, not just
    rows-only.  Inside the worker everything is vectorized numpy over
    the Arrow batch; no per-sample Python.
    """
    import numpy as np

    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("window_idx", T.IntegerType(), False),
            T.StructField("n_samples", T.IntegerType(), False),
            T.StructField("energy_sq", T.LongType(), False),
            T.StructField("peak", T.IntegerType(), False),
        ]
    )

    def energies(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ns, es, pk = [], [], [], [], []
            for i, blob in zip(pdf[id_col], pdf[bin_col]):
                samples = np.frombuffer(bytes(blob), dtype=np.uint8).astype(np.int64) - 128
                # empty blob => zero windows (no sentinel row): matches
                # the SQL replay, which generates ceil(len/window) = 0
                # windows for empty input
                for w in range(0, len(samples), window):
                    chunk = samples[w : w + window]
                    ids.append(i)
                    idxs.append(w // window)
                    ns.append(len(chunk))
                    es.append(int((chunk * chunk).sum()) if len(chunk) else 0)
                    pk.append(int(np.abs(chunk).max()) if len(chunk) else 0)
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype="int64"),
                    "window_idx": pd.Series(idxs, dtype="int32"),
                    "n_samples": pd.Series(ns, dtype="int32"),
                    "energy_sq": pd.Series(es, dtype="int64"),
                    "peak": pd.Series(pk, dtype="int32"),
                }
            )

    return (
        df.filter(F.col(bin_col).isNotNull())  # NULL media: excluded, never a worker crash
        .select(id_col, bin_col)
        .mapInPandas(energies, schema)
    )
