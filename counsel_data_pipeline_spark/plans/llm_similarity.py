"""Similarity-search query plans over `embeddings` — ops/similarity.py
surfaced through the driver contract.

Brute-force cosine top-k has a full DuckDB oracle: both engines evaluate
the dot product as a strict left-to-right double fold (verified bit-exact
on this data), so ranking and values hash-match without rounding. The LSH
variant is approximate by construction → rows-only + pytest recall check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from counsel_data_pipeline_spark.catalog import register
from counsel_data_pipeline_spark.io.sources import load_table
from counsel_data_pipeline_spark.ops import similarity as sim

QUERY_IDS = list(range(8))
K = 10


@register(
    "sim_cosine_topk_bruteforce",
    oracle=f"""
        WITH emb AS (
          SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ),
        n AS (
          SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM emb
        ),
        q AS (
          SELECT vec_id AS query_id, v AS qv, nrm AS qn
          FROM n WHERE vec_id < {len(QUERY_IDS)}
        ),
        s AS (
          SELECT query_id, a.vec_id AS neighbor_id,
                 list_dot_product(qv, a.v) / (qn * a.nrm) AS cosine
          FROM n a, q WHERE a.vec_id <> query_id
        )
        SELECT query_id, neighbor_id, cosine, rank FROM (
          SELECT *, row_number() OVER (
                   PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
                 ) AS rank
          FROM s
        ) WHERE rank <= {K}
    """,
    description="exact top-10 cosine neighbors for 8 query vectors (broadcast brute force)",
    tags=("llm", "similarity"),
    bench=True,
)
def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sim.cosine_topk(load_table(spark, sf_dir, "embeddings"), QUERY_IDS, k=K)


@register(
    "sim_lsh_bucketed_topk",
    oracle=None,  # approximate (bucket-restricted); recall checked in pytest
    description="ANN top-10 via 4-plane sign-LSH multi-probe bucketing + in-bucket exact cosine",
    tags=("llm", "similarity"),
)
def lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sim.lsh_bucketed_topk(
        load_table(spark, sf_dir, "embeddings"), QUERY_IDS, k=K, n_planes=4
    ).orderBy("query_id", "rank")


@register(
    "sim_ivf_topk",
    oracle=None,  # approximate (probe-restricted); recall checked in pytest
    description="ANN top-10 via IVF: 16 deterministic centroid cells, 4-probe search",
    tags=("llm", "similarity"),
)
def ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sim.ivf_topk(
        load_table(spark, sf_dir, "embeddings"), QUERY_IDS, k=K,
        n_centroids=16, n_probe=4,
    ).orderBy("query_id", "rank")


@register(
    "sim_neighbor_doc_quality",
    oracle=f"""
        WITH emb AS (
          SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ),
        n AS (
          SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM emb
        ),
        q AS (
          SELECT vec_id AS query_id, v AS qv, nrm AS qn
          FROM n WHERE vec_id < {len(QUERY_IDS)}
        ),
        s AS (
          SELECT query_id, a.vec_id AS neighbor_id,
                 list_dot_product(qv, a.v) / (qn * a.nrm) AS cosine
          FROM n a, q WHERE a.vec_id <> query_id
        ),
        topk AS (
          SELECT query_id, neighbor_id FROM (
            SELECT *, row_number() OVER (
                     PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
                   ) AS rank
            FROM s
          ) WHERE rank <= {K}
        ),
        toks AS (
          SELECT doc_id,
                 len(string_split_regex(trim(text), '\\s+')) AS n_tok
          FROM documents
        )
        SELECT query_id,
               count(*) AS n_neighbors,
               CAST(sum(n_tok) AS BIGINT) AS neighbor_tokens,
               CAST(sum(n_tok) AS DOUBLE) / count(*) AS avg_neighbor_tokens
        FROM topk JOIN toks ON doc_id = neighbor_id
        GROUP BY query_id
    """,
    description="cross-modal composite: ANN neighbors joined to their documents' token stats",
    tags=("llm", "similarity", "multimodal-join"),
)
def neighbor_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from counsel_data_pipeline_spark.ops import text_analysis as ta

    topk = sim.cosine_topk(load_table(spark, sf_dir, "embeddings"), QUERY_IDS, k=K).select(
        "query_id", "neighbor_id"
    )
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id"), ta.token_count(F.col("text")).alias("n_tok")
    )
    return (
        topk.join(docs, topk.neighbor_id == docs.doc_id)
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_neighbors"),
            F.sum("n_tok").alias("neighbor_tokens"),
            (F.sum("n_tok").cast("double") / F.count(F.lit(1))).alias("avg_neighbor_tokens"),
        )
    )


@register(
    "sim_ivf_kmeans_topk",
    oracle=None,  # trained-centroid ANN is approximate by construction; recall floor pytest-checked
    description="IVF top-k with spherical k-means trained centroids (Lloyd's, 3 iterations)",
    tags=("llm", "similarity", "ann", "iterative"),
)
def ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cents = sim.kmeans_centroids(emb, n_centroids=16, n_iters=3)
    return sim.ivf_topk(
        emb, QUERY_IDS, k=K, n_probe=4, centroids_df=cents
    ).orderBy("query_id", "rank")
