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
