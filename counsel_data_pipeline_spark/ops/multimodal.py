"""Multimodal column plumbing (north-star extension).

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct. The Spark-side machinery — schemas, Arrow-batched mapInPandas
decode, feature extraction UDF signatures, partition-size control — is
real and tested; the codec step itself is STUBBED (pillow/ffmpeg are not
in this container): ``decode_media(..., codec='real')`` raises
NotImplementedError, while the default deterministic fake derives pseudo
width/height/frames from the payload bytes so downstream plumbing is
exercised end-to-end with stable results.

Scale notes: binary payloads dominate row size → repartition by target
batch bytes BEFORE any mapInPandas (maxRecordsPerBatch alone doesn't bound
bytes), keep metadata in a separate narrow column pruned independently of
the blob, and never collect blobs to the driver.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, payload binary, media_type string, "
    "meta struct<n_bytes: bigint, content_hash: string>"
)

DECODED_SCHEMA = (
    "media_id bigint, media_type string, n_bytes bigint, content_hash string, "
    "width int, height int, n_frames int, duration_s double"
)

FEATURE_DIM = 16
FEATURES_SCHEMA = f"media_id bigint, features array<float>"


def media_type_expr(id_col):
    """The id → media-type rule, defined ONCE: used by the media adapter
    below, re-derivable from media_id downstream (it is a pure function
    of the id), and mirrored in SQL by plans/llm_multimodal._SQL_MEDIA_TYPE."""
    return (
        F.when(id_col % 3 == 0, "image")
        .when(id_col % 3 == 1, "audio")
        .otherwise("video")
    )


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as opaque media payloads so the
    multimodal path has driver-provided data to run against."""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        payload.alias("payload"),
        media_type_expr(F.col("doc_id")).alias("media_type"),
        F.struct(
            F.length(payload).cast("bigint").alias("n_bytes"),
            F.md5(payload).alias("content_hash"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes, media_type: str) -> tuple[int, int, int, float]:
    """Deterministic pseudo-decode: dimensions derived from the content
    hash — a stand-in with the same shape as a real codec's output."""
    h = hashlib.sha256(payload).digest()
    width = 16 + h[0] % 240
    height = 16 + h[1] % 240
    n_frames = 1 if media_type == "image" else 1 + h[2] % 120
    duration = 0.0 if media_type == "image" else round(n_frames / 24.0, 6)
    return width, height, n_frames, duration


def decode_media(media: DataFrame, codec: str = "fake") -> DataFrame:
    """Arrow-batched decode via mapInPandas: (media row) → typed metadata.

    ``codec='real'`` is the integration point for pillow/av — deliberately
    NotImplemented in this environment.
    """
    if codec == "real":
        raise NotImplementedError(
            "real codecs (pillow/av/ffmpeg) are not available in this "
            "container; use codec='fake' for the deterministic stub"
        )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                _fake_decode(bytes(p), t)
                for p, t in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "content_hash": [m["content_hash"] for m in pdf["meta"]],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_frames": [d[2] for d in decoded],
                    "duration_s": [d[3] for d in decoded],
                }
            )

    return media.mapInPandas(decode, schema=DECODED_SCHEMA)


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Payload → fixed-size float feature vector (deterministic from bytes;
    the real model inference would slot in here unchanged)."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                h = hashlib.sha256(bytes(p)).digest()
                out.append([round(h[i] / 255.0, 6) for i in range(dim)])
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": out})

    return media.mapInPandas(feats, schema=FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 24) -> DataFrame:
    """Frame sampling stub: one row per sampled frame index — the
    explode-shaped plumbing a video pipeline needs (schema + row fan-out),
    with frame payload decode left to the real codec."""
    decoded = decode_media(media)
    return decoded.select(
        "media_id",
        "media_type",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )


def cas_audit(media: DataFrame) -> DataFrame:
    """Per-media-type content-addressed storage audit: how many blobs,
    how many distinct content hashes, duplicate copy counts, and the
    bytes a CAS store reclaims by keeping one copy per hash. Two
    map-side-combined aggregates; output is media-type-sized. Reclaim
    accounting keeps max(n_bytes) per group as the retained copy (all
    copies of a hash are byte-identical, so any representative works)."""
    from pyspark.sql import functions as F

    g = media.groupBy(
        "media_type", F.col("meta.content_hash").alias("content_hash")
    ).agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.max(F.col("meta.n_bytes")).alias("n_bytes"),
        F.sum(F.col("meta.n_bytes")).cast("bigint").alias("bytes_all"),
    )
    return g.groupBy("media_type").agg(
        F.sum("n_copies").cast("bigint").alias("n_blobs"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_blobs"),
        F.sum(F.col("n_copies") - 1).cast("bigint").alias("n_dup_copies"),
        F.sum("bytes_all").cast("bigint").alias("bytes_total"),
        F.sum(F.col("bytes_all") - F.col("n_bytes")).cast("bigint").alias(
            "bytes_reclaimable"
        ),
    )
