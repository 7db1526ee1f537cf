"""Multimodal plumbing surfaced through the driver contract.

The binary-stats plan is fully oracle-matched (pure JVM-side blob exprs:
Spark md5(binary) ≡ DuckDB md5(varchar) — both hash the UTF-8 bytes). The
decode plan exercises the Arrow mapInPandas path; its pseudo-decode is
deterministic but not SQL-expressible → rows-only + pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from counsel_data_pipeline_spark.catalog import register
from counsel_data_pipeline_spark.io.sources import load_table
from counsel_data_pipeline_spark.ops import multimodal as mm


@register(
    "multimodal_binary_stats",
    oracle="""
        SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio'
                    ELSE 'video' END AS media_type,
               count(*) AS n_items,
               CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
               count(DISTINCT md5(text)) AS n_distinct_payloads,
               max(octet_length(encode(text))) AS max_bytes
        FROM documents
        GROUP BY 1
    """,
    description="opaque binary payload stats per media type (blob exprs, no decode)",
    tags=("llm", "multimodal"),
)
def binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = mm.documents_as_media(load_table(spark, sf_dir, "documents"))
    return media.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("meta.n_bytes")).alias("total_bytes"),
        F.countDistinct(F.col("meta.content_hash")).alias("n_distinct_payloads"),
        F.max(F.col("meta.n_bytes")).alias("max_bytes"),
    )


@register(
    "multimodal_decode_metadata",
    oracle=None,  # pseudo-decode (sha256-derived dims): pytest-verified determinism
    description="Arrow mapInPandas decode stub → typed media metadata rows",
    tags=("llm", "multimodal"),
)
def decode_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = mm.documents_as_media(load_table(spark, sf_dir, "documents"))
    return mm.decode_media(media).orderBy("media_id")


@register(
    "multimodal_frame_sample_stats",
    oracle=None,  # frame counts derive from the pseudo-decode; pytest-verified
    description="video/audio frame sampling fan-out (explode over sampled indices), per-type stats",
    tags=("llm", "multimodal"),
)
def frame_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = mm.documents_as_media(load_table(spark, sf_dir, "documents"))
    frames = mm.sample_frames(media, every_n=24)
    return (
        frames.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_sampled_frames"),
            F.countDistinct("media_id").alias("n_media"),
            F.max("frame_idx").alias("max_frame_idx"),
        )
        .orderBy("media_type")
    )
