"""Multimodal plumbing surfaced through the driver contract.

All three plans are fully oracle-matched since round 2. binary-stats is
pure JVM-side blob exprs (Spark md5(binary) ≡ DuckDB md5(varchar) — both
hash the UTF-8 bytes). The decode and frame-sample plans exercise the
Arrow mapInPandas path; their pseudo-decode derives entirely from
sha256(payload) bytes, which DuckDB reproduces (sha256 hex identical to
hashlib; round(k/24.0, 6) verified bit-identical over the whole duration
domain), so even the stubbed codec path is cross-engine checked. Only
the real-codec integration point (codec='real') stays NotImplemented —
pillow/ffmpeg are absent from this container.
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


_SQL_MEDIA_TYPE = """CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio'
                    ELSE 'video' END"""
# bytes 0/1/2 of sha256(payload) — the pseudo-decode's entire entropy
# source (ops/multimodal._fake_decode); DuckDB's sha256 hex matches
# hashlib's, and round(k/24.0, 6) was verified bit-identical to Python's
# round across the whole k ∈ [1, 121] duration domain.
_SQL_B = [
    f"CAST(concat('0x', substr(sha256(text), {1 + 2 * i}, 2)) AS INT)" for i in range(3)
]
_SQL_N_FRAMES = f"CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 1 + {_SQL_B[2]} % 120 END"


@register(
    "multimodal_decode_metadata",
    oracle=f"""
        SELECT doc_id AS media_id,
               {_SQL_MEDIA_TYPE} AS media_type,
               octet_length(encode(text)) AS n_bytes,
               md5(text) AS content_hash,
               CAST(16 + {_SQL_B[0]} % 240 AS INT) AS width,
               CAST(16 + {_SQL_B[1]} % 240 AS INT) AS height,
               CAST({_SQL_N_FRAMES} AS INT) AS n_frames,
               CASE WHEN doc_id % 3 = 0 THEN 0.0
                    ELSE round(({_SQL_N_FRAMES}) / 24.0, 6) END AS duration_s
        FROM documents
    """,
    description="Arrow mapInPandas decode stub → typed media metadata rows",
    tags=("llm", "multimodal"),
)
def decode_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = mm.documents_as_media(load_table(spark, sf_dir, "documents"))
    return mm.decode_media(media).orderBy("media_id")


@register(
    "multimodal_frame_sample_stats",
    oracle=f"""
        WITH f AS (
          SELECT doc_id AS media_id,
                 {_SQL_MEDIA_TYPE} AS media_type,
                 {_SQL_N_FRAMES} AS n_frames
          FROM documents
        )
        SELECT media_type,
               CAST(sum((n_frames - 1) // 24 + 1) AS BIGINT) AS n_sampled_frames,
               count(DISTINCT media_id) AS n_media,
               CAST(max(((n_frames - 1) // 24) * 24) AS INT) AS max_frame_idx
        FROM f GROUP BY media_type
    """,
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


@register(
    "multimodal_payload_dedup",
    oracle=f"""
        -- Content-addressed storage audit per media type: blob counts,
        -- distinct blobs, duplicate copies, and the bytes a CAS object
        -- store reclaims by keeping one copy per content hash — the
        -- no-decode storage dedup for a multimodal lake. (The synthetic
        -- corpus plants byte-identical blobs only at sf0.1; at smaller
        -- scales the dup columns are legitimately zero and the audit
        -- still attests the full counting pipeline.)
        WITH m AS (
          SELECT doc_id, {_SQL_MEDIA_TYPE} AS media_type,
                 md5(text) AS content_hash,
                 octet_length(encode(text)) AS n_bytes
          FROM documents
        ),
        g AS (
          SELECT media_type, content_hash, count(*) AS n_copies,
                 max(n_bytes) AS n_bytes,
                 CAST(sum(n_bytes) AS BIGINT) AS bytes_all
          FROM m GROUP BY 1, 2
        )
        SELECT media_type,
               CAST(sum(n_copies) AS BIGINT) AS n_blobs,
               CAST(count(*) AS BIGINT) AS n_distinct_blobs,
               CAST(sum(n_copies - 1) AS BIGINT) AS n_dup_copies,
               CAST(sum(bytes_all) AS BIGINT) AS bytes_total,
               CAST(sum(bytes_all - n_bytes) AS BIGINT) AS bytes_reclaimable
        FROM g GROUP BY 1
    """,
    description="content-addressed storage audit per media type: blob/"
    "distinct counts, duplicate copies, bytes reclaimable by CAS dedup — "
    "one hash-groupBy over (media_type, content_hash) then a 3-row "
    "rollup; the no-decode storage dedup for a multimodal lake",
    tags=("llm", "multimodal", "dedup"),
)
def payload_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = mm.documents_as_media(load_table(spark, sf_dir, "documents"))
    return mm.cas_audit(media)


_PROBE = (3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9, 3)  # fixed probe vec


def _feature_dot_oracle() -> str:
    """DuckDB twin of extract_features + probe dot product. Byte i of
    sha256(payload) → round(b/255, 6) → FLOAT32 (Arrow float parity —
    the CAST AS FLOAT reproduces the array<float> narrowing) → exact
    integer micros; verified bit-identical to the pandas path over the
    whole 256-value byte domain."""
    terms = " + ".join(
        f"CAST(round(CAST(round(CAST(concat('0x', substr(h, {1 + 2 * i}, 2)) "
        f"AS INT) / 255.0, 6) AS FLOAT) * 1000000) AS BIGINT) * {p}"
        for i, p in enumerate(_PROBE)
    )
    return f"""
        WITH m AS (
          SELECT doc_id AS media_id, {_SQL_MEDIA_TYPE} AS media_type,
                 sha256(text) AS h
          FROM documents
        ),
        scored AS (SELECT media_id, media_type, {terms} AS dot_probe FROM m),
        ranked AS (
          SELECT media_id, media_type, dot_probe,
                 row_number() OVER (PARTITION BY media_type
                   ORDER BY dot_probe DESC, media_id) AS rk
          FROM scored
        )
        SELECT media_type, media_id, dot_probe, rk FROM ranked WHERE rk <= 3
    """


@register(
    "multimodal_feature_topk",
    oracle=_feature_dot_oracle(),
    description="feature-extraction path attested end-to-end: the Arrow "
    "mapInPandas extract_features stub (sha256-derived 16-dim "
    "array<float> — the slot where real model inference goes) scored "
    "against a fixed probe vector in exact integer micros, top-3 per "
    "media type; the oracle reproduces the byte->float32->micro grid, "
    "so the pandas batch path itself is hash-checked",
    tags=("llm", "multimodal", "similarity"),
)
def feature_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale notes: feature extraction is embarrassingly parallel Arrow
    batches (mapInPandas — swap the sha256 stub for a real encoder and
    the plan is unchanged); the probe scoring is a per-row expression,
    and the only shuffle is the media_type-partitioned top-k window —
    grouped, never a global sort. At 100 TB the same shape holds with
    the probe broadcast; k-per-group keeps the result bounded."""
    from pyspark.sql import Window

    media = mm.documents_as_media(load_table(spark, sf_dir, "documents"))
    feats = mm.extract_features(media)
    dot = F.expr(
        " + ".join(
            f"CAST(round(element_at(features, {i + 1}) * 1000000) AS BIGINT)"
            f" * {p}"
            for i, p in enumerate(_PROBE)
        )
    ).alias("dot_probe")
    # media_type is a pure function of media_id (the shared
    # mm.media_type_expr rule), so re-derive it instead of joining the
    # media relation back in — one scan, no join shuffle.
    scored = feats.select(
        "media_id",
        mm.media_type_expr(F.col("media_id")).alias("media_type"),
        dot,
    )
    w = Window.partitionBy("media_type").orderBy(
        F.col("dot_probe").desc(), F.col("media_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("media_type", "media_id", "dot_probe", "rk")
    )
