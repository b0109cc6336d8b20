"""Multimodal plumbing query: documents' text bytes as the stand-in
binary blob -> Arrow-batched mapInPandas feature extraction.

Oracle-checked: the deterministic fake features are byte statistics
DuckDB can recompute (docs are ASCII), so even the Pandas-UDF path gets
a hash-verified correctness gate — proving the mapInPandas schema
contract and batch plumbing, not just "it ran".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.multimodal import extract_features, with_media_meta
from . import _t, register


@register(
    "multimodal_byte_features",
    oracle="""
SELECT doc_id AS id,
       octet_length(encode(text)) AS n_bytes,
       array_to_string(
         [CAST(octet_length(encode(text)) AS DOUBLE),
          CAST(ascii(substr(text, 1, 1)) AS DOUBLE),
          CAST(ascii(substr(text, length(text), 1)) AS DOUBLE),
          CAST(octet_length(encode(text)) % 251 AS DOUBLE)], ',') AS features
FROM documents
ORDER BY doc_id
""",
)
def q_multimodal_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("media")
    )
    docs = with_media_meta(docs, mime="text/plain")
    feats = extract_features(docs, "doc_id", "media", dim=4)
    # ','-join the vector for the gate: raw array cells crash the
    # driver's pandas canonicalizer (operator output stays array<double>).
    return feats.select(
        "id",
        "n_bytes",
        F.array_join(F.col("features").cast("array<string>"), ",").alias("features"),
    ).orderBy("id")


@register(
    "multimodal_frame_sample",
    oracle="""
WITH d AS (
  SELECT doc_id, text, length(text) AS ln,
         greatest(length(text) // 3, 1) AS step
  FROM documents),
f AS (
  SELECT doc_id, fi.i AS frame_idx,
         md5(substr(text, fi.i * step + 1, step)) AS frame_md5,
         length(substr(text, fi.i * step + 1, step)) AS frame_len
  FROM d, (SELECT unnest(generate_series(0, 2)) AS i) fi)
SELECT doc_id, frame_idx, frame_len, frame_md5
FROM f
ORDER BY doc_id, frame_idx
""",
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling through the REAL Arrow mapInPandas path, value-
    hash-checked: the fake sampler slices the blob into 3 byte windows,
    and because the blob is ASCII text the oracle reproduces every
    frame's md5 with plain substr — a Python-crossing operator under
    the full correctness gate, not a weaker rows-only check."""
    from ..operators.multimodal import frame_sample

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("media")
    )
    frames = frame_sample(docs, "doc_id", "media", n_frames=3)
    return frames.select(
        F.col("id").alias("doc_id"),
        "frame_idx",
        F.length("frame").alias("frame_len"),
        F.md5("frame").alias("frame_md5"),
    ).orderBy("doc_id", "frame_idx")


@register(
    "multimodal_audio_energy",
    oracle="""
WITH d AS (SELECT doc_id, text, length(text) AS ln FROM documents
           WHERE strlen(text) = length(text)),
w AS (SELECT doc_id, text, ln,
             unnest(range(CAST(ceil(ln / 64.0) AS BIGINT))) AS wi
      FROM d),
s AS (SELECT doc_id, wi,
             ascii(substr(text, CAST(wi * 64 + o.o + 1 AS INT), 1)) - 128 AS v
      FROM w, (SELECT unnest(range(64)) AS o) o
      WHERE wi * 64 + o.o < ln)
SELECT doc_id, CAST(wi AS INT) AS window_idx,
       CAST(count(*) AS INT) AS n_samples,
       CAST(sum(v * v) AS BIGINT) AS energy_sq,
       CAST(max(abs(v)) AS INT) AS peak
FROM s GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def q_multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audio leg through the REAL Arrow mapInPandas path, value-
    hash-gated: blobs decode as fake unsigned-8-bit PCM centered at 128
    and every 64-sample window emits its EXACT integer energy
    sum((b-128)^2) and peak — because the blob is the document's ASCII
    bytes, DuckDB replays the whole thing with ascii(substr(...)), so
    the Python-crossing windowed-energy pipeline gets a full value-hash
    verdict (schema contract, batch shape, window arithmetic), with the
    codec boundary honestly stubbed exactly like the image/video legs.

    The ascii()-replay equivalence only holds for single-byte (ASCII)
    text, so BOTH sides restrict to docs whose byte length equals their
    character length (octet_length = char_length <=> pure ASCII) — a
    no-op on the all-ASCII fixtures, and the guard that keeps the hash
    honest if a future fixture adds multi-byte text.  Empty docs emit
    zero windows on both sides (the operator has no sentinel row)."""
    from ..operators.multimodal import audio_window_energy

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.octet_length("text") == F.length("text"))
        .select("doc_id", F.col("text").cast("binary").alias("media"))
    )
    e = audio_window_energy(docs, "doc_id", "media", window=64)
    return e.select(
        F.col("id").alias("doc_id"), "window_idx", "n_samples", "energy_sq", "peak"
    ).orderBy("doc_id", "window_idx")
