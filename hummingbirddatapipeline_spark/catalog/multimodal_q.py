"""Multimodal catalog queries: the mapInPandas binary-column path,
DuckDB-verified where SQL can express the check (byte size + sha256 —
DuckDB hashes the same utf-8 bytes), rows-only for the frame-sampling
plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hummingbirddatapipeline_spark.catalog import query
from hummingbirddatapipeline_spark.multimodal.core import (
    byte_features,
    sample_frames,
    synth_media_from_documents,
)
from hummingbirddatapipeline_spark.tables import load


@query(
    "multimodal_byte_features",
    oracle="""
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
           strlen(text) AS byte_size,
           sha256(text) AS content_sha256
    FROM documents
    ORDER BY media_id
    """,
)
def multimodal_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary blobs -> Arrow-batched mapInPandas features; sha256 and
    byte size checked bit-for-bit against DuckDB hashing the same
    utf-8 bytes."""
    docs = load(spark, sf_dir, "documents")
    media = synth_media_from_documents(docs)
    feats = byte_features(media)
    return (
        feats.join(media.select("media_id", F.col("media_meta.kind").alias("kind")), "media_id")
        .select("media_id", "kind", "byte_size", "content_sha256")
    )


@query(
    "multimodal_frame_plan",
    oracle="""
    WITH video AS (
      SELECT doc_id AS media_id, strlen(text) * 10 AS duration_ms
      FROM documents WHERE doc_id % 3 = 2
    ),
    frames AS (
      SELECT media_id,
             UNNEST(range(GREATEST(CAST(duration_ms // 1000 AS INT), 1)))
               AS frame_index
      FROM video
    )
    SELECT media_id, CAST(frame_index AS INT) AS frame_index,
           frame_index * 1000 AS frame_offset_ms
    FROM frames ORDER BY media_id, frame_index
    """,
)
def multimodal_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic video frame-sampling plan (one frame per second of
    synthetic duration) — pure column ops, oracle-checked."""
    docs = load(spark, sf_dir, "documents")
    media = synth_media_from_documents(docs)
    return sample_frames(media, every_ms=1000)
