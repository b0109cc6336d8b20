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
       [CAST(octet_length(encode(text)) AS DOUBLE),
        CAST(ascii(substr(text, 1, 1)) AS DOUBLE),
        CAST(ascii(substr(text, length(text), 1)) AS DOUBLE),
        CAST(octet_length(encode(text)) % 251 AS DOUBLE)] AS features
FROM documents
ORDER BY doc_id
""",
)
def q_multimodal_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("media")
    )
    docs = with_media_meta(docs, mime="text/plain")
    return extract_features(docs, "doc_id", "media", dim=4).orderBy("id")
