"""Similarity-search query plans over `embeddings` — ops/similarity.py
surfaced through the driver contract.

Brute-force cosine top-k has a full DuckDB oracle: both engines evaluate
the dot product as a strict left-to-right double fold (verified bit-exact
on this data), so ranking and values hash-match without rounding. The LSH
variant is approximate by construction → rows-only + pytest recall check.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from counsel_data_pipeline_spark.catalog import register
from counsel_data_pipeline_spark.io.sources import load_table
from counsel_data_pipeline_spark.ops import similarity as sim
from counsel_data_pipeline_spark.ops.materialize import pin

QUERY_IDS = list(range(8))
K = 10


def _lsh_plane_literal(p: int, dim: int = 64) -> str:
    """DuckDB DOUBLE[] literal of hyperplane p, bit-identical to
    ops.similarity.hyperplane_lsh_bucket's md5-derived components: the
    Spark side constant-folds conv(substr(md5('p:d'),1,8),16,10)/16^8-0.5,
    and Python computes the exact same double (int→double exact below
    2^53, division by 2^32 and the 0.5 subtraction correctly rounded the
    same way); repr() round-trips it through DuckDB's literal parser."""
    import hashlib

    comps = [
        int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:8], 16) / float(16**8) - 0.5
        for d in range(dim)
    ]
    return "[" + ", ".join(repr(x) for x in comps) + "]::DOUBLE[]"


def _lsh_topk_oracle(n_planes: int = 4, dim: int = 64) -> str:
    """DuckDB twin of sim.lsh_bucketed_topk (multiprobe, k=K)."""
    bucket = " + ".join(
        f"(CASE WHEN list_dot_product({_lsh_plane_literal(p, dim)}, v) >= 0 "
        f"THEN {1 << p} ELSE 0 END)"
        for p in range(n_planes)
    )
    probes = ", ".join(["bucket"] + [f"xor(bucket, {1 << p})" for p in range(n_planes)])
    return f"""
        WITH emb AS (
          SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ),
        n AS (
          SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM emb
        ),
        b AS (
          SELECT vec_id, v, nrm, {bucket} AS bucket FROM n
        ),
        q AS (
          SELECT vec_id AS query_id, v AS qv, nrm AS qn,
                 unnest([{probes}]) AS qbucket
          FROM b WHERE vec_id < {len(QUERY_IDS)}
        ),
        s AS (
          SELECT query_id, a.vec_id AS neighbor_id,
                 list_dot_product(qv, a.v) / (qn * a.nrm) AS cosine
          FROM b a JOIN q ON a.bucket = qbucket AND a.vec_id <> query_id
        )
        SELECT query_id, neighbor_id, cosine, rank FROM (
          SELECT *, row_number() OVER (
                   PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
                 ) AS rank
          FROM s
        ) WHERE rank <= {K}
    """


def _ivf_topk_oracle(n_centroids: int = 16, n_probe: int = 4) -> str:
    """DuckDB twin of sim.ivf_topk with lowest-id centroid seeding."""
    return f"""
        WITH emb AS (
          SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ),
        n AS (
          SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM emb
        ),
        c AS (
          SELECT vec_id AS cid, v AS cv, nrm AS cn
          FROM n WHERE vec_id < {n_centroids}
        ),
        ranked AS (
          SELECT vec_id, v, nrm, cid,
                 row_number() OVER (
                   PARTITION BY vec_id
                   ORDER BY list_dot_product(v, cv) / (nrm * cn) DESC, cid
                 ) AS crank
          FROM n, c
        ),
        assigned AS (
          SELECT vec_id, v, nrm, cid AS cell FROM ranked WHERE crank = 1
        ),
        q AS (
          SELECT vec_id AS query_id, v AS qv, nrm AS qn, cid AS qcell
          FROM ranked WHERE vec_id < {len(QUERY_IDS)} AND crank <= {n_probe}
        ),
        s AS (
          SELECT query_id, a.vec_id AS neighbor_id,
                 list_dot_product(qv, a.v) / (qn * a.nrm) AS cosine
          FROM assigned a JOIN q ON a.cell = qcell AND a.vec_id <> query_id
        )
        SELECT query_id, neighbor_id, cosine, rank FROM (
          SELECT *, row_number() OVER (
                   PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
                 ) AS rank
          FROM s
        ) WHERE rank <= {K}
    """


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
    # deterministic md5-derived hyperplanes → the bucketing itself is
    # oracle-expressible (plane literals embedded above); recall vs exact
    # additionally checked in pytest
    oracle=_lsh_topk_oracle(n_planes=4),
    description="ANN top-10 via 4-plane sign-LSH multi-probe bucketing + in-bucket exact cosine",
    tags=("llm", "similarity"),
)
def lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sim.lsh_bucketed_topk(
        load_table(spark, sf_dir, "embeddings"), QUERY_IDS, k=K, n_planes=4
    ).orderBy("query_id", "rank")


@register(
    "sim_ivf_topk",
    # lowest-id centroid seeding is deterministic → cell assignment, probe
    # lists and in-cell ranking are all oracle-expressible
    oracle=_ivf_topk_oracle(n_centroids=16, n_probe=4),
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
    "dedup_semantic_blocked_pairs",
    # blocking AND verification are deterministic (lowest-id cells,
    # 2-probe multi-assignment, exact fold cosine) → the full pipeline
    # incl. which pairs the blocking surfaces is oracle-expressible
    oracle="""
        WITH emb AS (
          SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ),
        n AS (
          SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM emb
        ),
        c AS (
          SELECT vec_id AS cid, v AS cv, nrm AS cn
          FROM n WHERE vec_id < 16
        ),
        ranked AS (
          SELECT vec_id, cid,
                 row_number() OVER (
                   PARTITION BY vec_id
                   ORDER BY list_dot_product(v, cv) / (nrm * cn) DESC, cid
                 ) AS crank
          FROM n, c
        ),
        assigned AS (
          SELECT vec_id, cid AS cell FROM ranked WHERE crank <= 2
        ),
        cand AS (
          SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
          FROM assigned a JOIN assigned b
            ON a.cell = b.cell AND a.vec_id < b.vec_id
        )
        SELECT id_a, id_b,
               list_dot_product(x.v, y.v) / (x.nrm * y.nrm) AS cosine
        FROM cand
        JOIN n x ON x.vec_id = id_a
        JOIN n y ON y.vec_id = id_b
        WHERE list_dot_product(x.v, y.v) / (x.nrm * y.nrm) >= 0.45
    """,
    description="semantic-blocked near-dup pairs: 2-probe IVF cell blocking "
    "bounds the quadratic, exact fold cosine verifies candidates (SemDeDup-style scale path)",
    tags=("llm", "dedup", "similarity", "blocking"),
    bench=True,
)
def semantic_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sim.semantic_blocked_pairs(
        load_table(spark, sf_dir, "embeddings"),
        threshold=0.45, n_centroids=16, probes=2,
    )


def _lloyd_ctes(n_centroids: int, n_iters: int, dim: int) -> tuple[str, str]:
    """The exact-integer Lloyd iteration CTE chain (assign by BIGINT
    squared distance with lowest-cid tie-break, truncating-division mean
    update), shared by the batch IVF oracle and the streaming cell-stats
    oracle. Expects ``emb6(id, v6)`` and ``c0(cid, c6)`` CTEs upstream;
    returns (joined CTE SQL, final centroid CTE name)."""
    its = []
    prev = "c0"
    for t in range(1, n_iters + 1):
        its.append(f"""
        a{t} AS MATERIALIZED (
          SELECT id, v6, cid FROM (
            SELECT id, v6, cid,
                   row_number() OVER (PARTITION BY id ORDER BY d, cid) AS rn
            FROM (
              SELECT e.id, e.v6, c.cid,
                     list_sum(list_transform(range({dim}), i ->
                       (e.v6[i+1] - c.c6[i+1]) * (e.v6[i+1] - c.c6[i+1]))) AS d
              FROM emb6 e CROSS JOIN {prev} c
            )
          ) WHERE rn = 1
        ),
        c{t} AS MATERIALIZED (
          SELECT cid, list(s ORDER BY i) AS c6 FROM (
            SELECT cid, i, sum(v6[i+1]) // count(*) AS s
            FROM a{t} CROSS JOIN (SELECT unnest(range({dim})) AS i)
            GROUP BY cid, i
          ) GROUP BY cid
        )""")
        prev = f"c{t}"
    return ",".join(its), prev


def _ivf_kmeans_oracle(
    n_centroids: int = 16, n_iters: int = 3, n_probe: int = 4, dim: int = 64
) -> str:
    """DuckDB twin of exact-integer Lloyd training + trained-centroid IVF
    search: every training iterate is reproduced bit-for-bit (BIGINT
    squared distance, lowest-cid tie-break, truncating-division centroid
    update), so the ITERATIVE trainer itself is oracle-checked — k-means
    joins PageRank and PCA as the third exact iterative algorithm."""
    lloyd, prev = _lloyd_ctes(n_centroids, n_iters, dim)
    return f"""
        -- Exact integer Lloyd's k-means ({n_iters} iterations on the 1e-6
        -- grid: BIGINT squared Euclidean assignment, lowest-cid ties,
        -- truncating-division mean update) + IVF search over the trained
        -- centroids — training AND search hash-match the Spark plan.
        WITH emb6 AS MATERIALIZED (
          SELECT vec_id AS id,
                 list_transform(embedding::DOUBLE[],
                   x -> CAST(round(x * 1000000, 0) AS BIGINT)) AS v6
          FROM embeddings
        ),
        c0 AS (SELECT id AS cid, v6 AS c6 FROM emb6 WHERE id < {n_centroids}),
        {lloyd},
        cd AS (
          SELECT cid, list_transform(c6, x -> CAST(x AS DOUBLE) / 1000000) AS cv
          FROM {prev}
        ),
        c AS (SELECT cid, cv, sqrt(list_dot_product(cv, cv)) AS cn FROM cd),
        n AS (
          SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm
          FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        ),
        ranked AS (
          SELECT vec_id, v, nrm, cid,
                 row_number() OVER (
                   PARTITION BY vec_id
                   ORDER BY list_dot_product(v, cv) / (nrm * cn) DESC, cid
                 ) AS crank
          FROM n, c
        ),
        assigned AS (
          SELECT vec_id, v, nrm, cid AS cell FROM ranked WHERE crank = 1
        ),
        q AS (
          SELECT vec_id AS query_id, v AS qv, nrm AS qn, cid AS qcell
          FROM ranked WHERE vec_id < {len(QUERY_IDS)} AND crank <= {n_probe}
        ),
        s AS (
          SELECT query_id, a.vec_id AS neighbor_id,
                 list_dot_product(qv, a.v) / (qn * a.nrm) AS cosine
          FROM assigned a JOIN q ON a.cell = qcell AND a.vec_id <> query_id
        )
        SELECT query_id, neighbor_id, cosine, rank FROM (
          SELECT *, row_number() OVER (
                   PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
                 ) AS rank
          FROM s
        ) WHERE rank <= {K}
    """


@register(
    "sim_ivf_kmeans_topk",
    # r7: flipped from rows-only to a full value-hash oracle — the trainer
    # now runs exact integer Lloyd iterations (ops/similarity.py
    # kmeans_centroids_exact), so centroids, cell assignment, probe lists
    # and in-cell ranking are all engine-independent
    oracle=_ivf_kmeans_oracle(n_centroids=16, n_iters=3, n_probe=4),
    description="IVF top-k with k-means trained centroids: 3 exact "
    "integer Lloyd iterations (BIGINT squared distance on the 1e-6 grid, "
    "truncating-division mean update) then 4-probe search — the iterative "
    "trainer itself is oracle-checked, the third exact iterative "
    "algorithm after PageRank and PCA",
    tags=("llm", "similarity", "ann", "iterative"),
)
def ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained-centroid ANN with nothing left to trust: per iteration one
    broadcast of the tiny centroid table against the persisted integer
    corpus + one map-side-combined aggregate (the float trainer's plan
    shape, integer arithmetic). At 100 TB the corpus never reshuffles
    during training; search is the standard IVF cell-probe plan."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = sim.kmeans_centroids_exact(emb, n_centroids=16, n_iters=3)
    return sim.ivf_topk(
        emb, QUERY_IDS, k=K, n_probe=4, centroids_df=cents
    ).orderBy("query_id", "rank")


@register(
    "sim_quantized_topk",
    # int8 scalar quantization ranks by an INTEGER dot product, so unlike
    # the float paths there is no parity risk in the ranking key: the
    # floor-based quantizer and the code dot are exact arithmetic both
    # engines reproduce bit-for-bit (normalization itself is the same
    # left-to-right double fold the brute-force oracle already matches).
    oracle=f"""
        WITH emb AS (
          SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ),
        n AS (
          -- zero-norm vectors excluded: no direction to quantize (matches
          -- the Spark op's norm > 0 filter)
          SELECT vec_id, v, nrm FROM (
            SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM emb
          ) WHERE nrm > 0
        ),
        coded AS (
          SELECT vec_id,
                 list_transform(v, x ->
                   CAST(floor(x / nrm * 127.0 + 0.5) AS BIGINT)) AS q
          FROM n
        ),
        p AS (
          SELECT b.vec_id AS query_id, a.vec_id AS neighbor_id,
                 CAST(list_dot_product(a.q::DOUBLE[], b.q::DOUBLE[]) AS BIGINT)
                   AS qdot
          FROM coded a JOIN coded b
            ON b.vec_id < {len(QUERY_IDS)} AND a.vec_id <> b.vec_id
        )
        SELECT query_id, neighbor_id, qdot, rank FROM (
          SELECT *, row_number() OVER (
                   PARTITION BY query_id ORDER BY qdot DESC, neighbor_id
                 ) AS rank
          FROM p
        ) WHERE rank <= {K}
    """,
    description="compressed exact search: unit-normalize, symmetric int8 "
    "codes in [-127,127], top-10 by integer code dot (4x smaller scan, "
    "bit-exact ranking, ~127^2·cosine)",
    tags=("llm", "similarity"),
    bench=True,
)
def quantized_topk_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sim.quantized_topk(
        load_table(spark, sf_dir, "embeddings"), QUERY_IDS, k=K
    ).orderBy("query_id", "rank")


@register(
    "sim_embedding_dim_profile",
    # min/max are exact; mean and E[x²] go through the decimal parity path
    # (exact associative sums, coarse round, double cast); std is then the
    # same double expression over those two reproducible inputs.
    oracle="""
        WITH emb AS (
          SELECT embedding::DOUBLE[] AS v FROM embeddings
        ),
        x AS (
          -- positionally-aligned unnest: length-agnostic (a hardcoded
          -- range(dim) would fabricate NULL rows for short vectors and
          -- miss positions of long ones, silently diverging from the
          -- Spark posexplode side)
          SELECT generate_subscripts(v, 1) - 1 AS pos, unnest(v) AS x
          FROM emb
        ),
        s AS (
          SELECT pos,
                 count(*) AS n,
                 min(x) AS dim_min,
                 max(x) AS dim_max,
                 CAST(round(sum(CAST(x AS DECIMAL(30,6))), 6) AS DOUBLE)
                   / count(*) AS dim_mean,
                 CAST(round(sum(CAST(x * x AS DECIMAL(30,6))), 6) AS DOUBLE)
                   / count(*) AS msq
          FROM x GROUP BY pos
        )
        SELECT pos, n, dim_min, dim_max, dim_mean,
               sqrt(greatest(msq - dim_mean * dim_mean, 0.0)) AS dim_std
        FROM s
    """,
    description="per-dimension embedding profile (n/min/max/mean/std) for "
    "drift monitoring — posexplode + 64-group aggregate, decimal-exact moments",
    tags=("llm", "similarity", "quality"),
)
def embedding_dim_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from counsel_data_pipeline_spark.plans._parity import dec, to_double

    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.select(
        F.posexplode(sim.as_double_array(F.col("embedding"))).alias("pos", "x")
    )
    s = x.groupBy(F.col("pos").cast("bigint").alias("pos")).agg(
        F.count("x").alias("n"),
        F.min("x").alias("dim_min"),
        F.max("x").alias("dim_max"),
        (to_double(F.sum(dec("x")), 6) / F.count("x")).alias("dim_mean"),
        (to_double(F.sum(dec(F.col("x") * F.col("x"))), 6) / F.count("x")).alias(
            "msq"
        ),
    )
    return s.select(
        "pos",
        "n",
        "dim_min",
        "dim_max",
        "dim_mean",
        F.sqrt(
            F.greatest(
                F.col("msq") - F.col("dim_mean") * F.col("dim_mean"), F.lit(0.0)
            )
        ).alias("dim_std"),
    )


# ---------------------------------------------------------------------------
# Persisted-index ANN: build once, query the next batch against the store
# ---------------------------------------------------------------------------


def _ivf_index_path(sf_dir: str) -> str:
    """Deterministic per-source-data index location.

    NOTE: building the index is EAGER (two parquet writes at
    plan-construction time) — unlike the other plan builders, which are
    lazy. The index is therefore cached under a path keyed by the source
    embeddings' file fingerprint (io/fingerprint.py): repeated
    correctness sweeps and bench iterations reuse one copy instead of
    accumulating mkdtemp directories, while a testdata regeneration
    changes the fingerprint and forces a rebuild.
    """
    from counsel_data_pipeline_spark.io.fingerprint import derived_cache_dir

    return derived_cache_dir("counsel_ivf_index", sf_dir, "embeddings")


@register(
    "sim_ivf_persisted_query",
    # centroids = 16 lowest-id vectors of the INDEXED (even-id) half;
    # queries = the first 8 odd-id vectors, probing 4 cells; disjoint
    # halves, so no self-exclusion is needed. Deterministic end to end —
    # the parquet round-trip preserves doubles bit-exactly, so the whole
    # lifecycle (build → store → query) is oracle-checkable.
    oracle="""
        WITH emb AS (
          SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ),
        n AS (
          SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM emb
        ),
        c AS (
          -- mirrors lowest_id_centroids(even half, 16): the 16 LOWEST ids of
          -- the indexed half, whatever the id layout — not a hardcoded
          -- "vec_id < 32" that only equals it while ids are 0-based and
          -- contiguous (a testdata regeneration must not desynchronize us)
          SELECT vec_id AS cid, v AS cv, nrm AS cn
          FROM n WHERE vec_id % 2 = 0 ORDER BY vec_id LIMIT 16
        ),
        ranked AS (
          SELECT vec_id, v, nrm, cid,
                 row_number() OVER (
                   PARTITION BY vec_id
                   ORDER BY list_dot_product(v, cv) / (nrm * cn) DESC, cid
                 ) AS crank
          FROM n, c
        ),
        assigned AS (
          SELECT vec_id, v, nrm, cid AS cell FROM ranked
          WHERE crank = 1 AND vec_id % 2 = 0
        ),
        q AS (
          SELECT vec_id AS query_id, v AS qv, nrm AS qn, cid AS qcell
          FROM ranked WHERE vec_id % 2 = 1 AND vec_id < 16 AND crank <= 4
        ),
        s AS (
          SELECT query_id, a.vec_id AS neighbor_id,
                 list_dot_product(qv, a.v) / (qn * a.nrm) AS cosine
          FROM assigned a JOIN q ON a.cell = qcell
        )
        SELECT query_id, neighbor_id, cosine, rank FROM (
          SELECT *, row_number() OVER (
                   PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
                 ) AS rank
          FROM s
        ) WHERE rank <= 5
    """,
    description="persisted-IVF lifecycle: index the even-id half to parquet "
    "(lists partitioned by cell, centroids beside them), then top-5 ANN for "
    "8 odd-id query vectors against the store — query cost is the probed "
    "cells only (file-level partition pruning), the corpus is never rescanned",
    tags=("llm", "similarity", "index"),
)
def ivf_persisted_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    path = _ivf_index_path(sf_dir)
    done = os.path.join(path, "centroids", "_SUCCESS")
    if not os.path.exists(done):
        sim.build_ivf_index(
            emb.filter(F.col("vec_id") % 2 == 0), path, n_centroids=16
        )
    queries = emb.filter((F.col("vec_id") % 2 == 1) & (F.col("vec_id") < 16))
    return sim.query_ivf_index(spark, path, queries, k=5, n_probe=4).orderBy(
        "query_id", "rank"
    )


# ---------------------------------------------------------------------------
# Incremental index maintenance: append a new batch to the store, monitor
# centroid drift — the production ANN loop build-once/query-many doesn't close
# ---------------------------------------------------------------------------

# Shared SQL prefix for the incremental-store oracles: centroids come from
# the INITIAL batch only (vec_id % 4 == 0, 16 lowest — mirrors the frozen
# centroid table an append never re-derives); the indexed corpus after the
# append is every even id.
_INCR_ORACLE_PREFIX = """
        WITH emb AS (
          SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ),
        n AS (
          SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM emb
        ),
        c AS (
          SELECT vec_id AS cid, v AS cv, nrm AS cn
          FROM n WHERE vec_id % 4 = 0 ORDER BY vec_id LIMIT 16
        ),
        ranked AS (
          SELECT vec_id, v, nrm, cid, cv, cn,
                 list_dot_product(v, cv) / (nrm * cn) AS csim,
                 row_number() OVER (
                   PARTITION BY vec_id
                   ORDER BY list_dot_product(v, cv) / (nrm * cn) DESC, cid
                 ) AS crank
          FROM n, c
        )
"""


def _ensure_incr_store(spark: SparkSession, sf_dir: str) -> str:
    """Build-then-append the incremental IVF store once per testdata
    fingerprint: initial batch = vec_id % 4 == 0 (seeds the centroids),
    appended batch = vec_id % 4 == 2 (assigned from the STORED centroids,
    initial corpus never re-read). Eager like _ivf_index_path, cached the
    same way; the _APPEND_DONE marker distinguishes a completed
    build+append from a partial one (a partial store rebuilds from
    scratch — build writes lists with mode=overwrite)."""
    from counsel_data_pipeline_spark.io.fingerprint import derived_cache_dir

    path = derived_cache_dir("counsel_ivf_incr", sf_dir, "embeddings")
    marker = os.path.join(path, "_APPEND_DONE")
    if not os.path.exists(marker):
        emb = load_table(spark, sf_dir, "embeddings")
        sim.build_ivf_index(
            emb.filter(F.col("vec_id") % 4 == 0), path, n_centroids=16
        )
        sim.append_ivf_index(
            spark, path, emb.filter(F.col("vec_id") % 4 == 2), gen=1
        )
        with open(marker, "w") as f:
            f.write("ok")
    return path


@register(
    "sim_ivf_incremental_append",
    oracle=_INCR_ORACLE_PREFIX
    + """,
        assigned AS (
          SELECT vec_id, v, nrm, cid AS cell FROM ranked
          WHERE crank = 1 AND vec_id % 2 = 0
        ),
        q AS (
          SELECT vec_id AS query_id, v AS qv, nrm AS qn, cid AS qcell
          FROM ranked WHERE vec_id % 2 = 1 AND vec_id < 16 AND crank <= 4
        ),
        s AS (
          SELECT query_id, a.vec_id AS neighbor_id,
                 list_dot_product(qv, a.v) / (qn * a.nrm) AS cosine
          FROM assigned a JOIN q ON a.cell = qcell
        )
        SELECT query_id, neighbor_id, cosine, rank FROM (
          SELECT *, row_number() OVER (
                   PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
                 ) AS rank
          FROM s
        ) WHERE rank <= 5
    """,
    description="incremental IVF maintenance: append the vec_id%4==2 batch "
    "to a store built from vec_id%4==0 (cells assigned from the STORED "
    "centroids, O(batch x centroids), corpus never rescanned), then top-5 "
    "ANN for 8 odd-id queries against the appended store",
    tags=("llm", "similarity", "index", "incremental"),
)
def ivf_incremental_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    path = _ensure_incr_store(spark, sf_dir)
    queries = emb.filter((F.col("vec_id") % 2 == 1) & (F.col("vec_id") < 16))
    return sim.query_ivf_index(spark, path, queries, k=5, n_probe=4).orderBy(
        "query_id", "rank"
    )


@register(
    "sim_ivf_centroid_drift",
    oracle=_INCR_ORACLE_PREFIX
    + """,
        m AS (
          SELECT cid AS cell, vec_id % 4 = 0 AS is_init,
                 CAST(round(csim, 6) AS DECIMAL(30,6)) AS cosr
          FROM ranked WHERE crank = 1 AND vec_id % 2 = 0
        )
        SELECT cell,
               CAST(sum(CASE WHEN is_init THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_initial,
               CASE WHEN sum(CASE WHEN is_init THEN 1 ELSE 0 END) > 0
                    THEN CAST(round(sum(CASE WHEN is_init THEN cosr END), 6)
                              AS DOUBLE)
                         / sum(CASE WHEN is_init THEN 1 ELSE 0 END)
               END AS avg_cos_initial,
               CAST(sum(CASE WHEN is_init THEN 0 ELSE 1 END) AS BIGINT)
                 AS n_appended,
               CASE WHEN sum(CASE WHEN is_init THEN 0 ELSE 1 END) > 0
                    THEN CAST(round(sum(CASE WHEN NOT is_init THEN cosr END), 6)
                              AS DOUBLE)
                         / sum(CASE WHEN is_init THEN 0 ELSE 1 END)
               END AS avg_cos_appended
        FROM m GROUP BY cell
    """,
    description="per-cell centroid-drift report over the incrementally "
    "maintained store: member counts and mean member-to-centroid cosine for "
    "the build generation vs the appended generation — the rebuild-trigger "
    "signal of the production ANN loop (one scan of the lists, broadcast "
    "centroids, centroid-table-sized output)",
    tags=("llm", "similarity", "index", "incremental", "quality"),
)
def ivf_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _ensure_incr_store(spark, sf_dir)
    return sim.ivf_centroid_drift(spark, path)


# ---------------------------------------------------------------------------
# Embedding-space outlier scoring — the data-cleaning signal: vectors whose
# direction is farthest from the corpus mean direction are mislabeled/noise
# candidates in a training corpus
# ---------------------------------------------------------------------------


@register(
    "quality_embedding_outliers",
    # parity grid: per-dim means via the decimal path (= dim-profile);
    # the vector·mean dot product sums per-term round-to-1e-9 in exact
    # DECIMAL (the BM25 trick) so the fold order can't drift; the vector
    # norm is the established bit-exact left-to-right fold; mean-norm² is
    # a 64-term rounded-decimal sum. The final division is one IEEE op
    # over identical inputs.
    oracle="""
        WITH emb AS (
          SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ),
        n AS (
          SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM emb
          WHERE sqrt(list_dot_product(v, v)) > 0
        ),
        x AS (
          SELECT vec_id, generate_subscripts(v, 1) - 1 AS pos, unnest(v) AS x
          FROM n
        ),
        dims AS (
          SELECT pos,
                 CAST(round(sum(CAST(x AS DECIMAL(30,6))), 6) AS DOUBLE)
                   / count(*) AS dm
          FROM x GROUP BY pos
        ),
        mn AS (
          SELECT sqrt(CAST(round(sum(CAST(round(dm * dm, 12)
                   AS DECIMAL(30,12))), 12) AS DOUBLE)) AS mnorm
          FROM dims
        ),
        dots AS (
          SELECT vec_id,
                 CAST(round(sum(CAST(round(x * dm, 9) AS DECIMAL(30,9))), 9)
                   AS DOUBLE) AS dotm
          FROM x JOIN dims USING (pos)
          GROUP BY vec_id
        )
        SELECT n.vec_id, dotm / (nrm * mnorm) AS center_cos
        FROM n JOIN dots USING (vec_id) CROSS JOIN mn
        ORDER BY center_cos, n.vec_id
        LIMIT 30
    """,
    description="embedding-space outlier report: the 30 vectors whose "
    "direction is farthest (lowest cosine) from the corpus mean direction — "
    "the noise/mislabel cleaning signal; one posexplode pass for the "
    "64-row dim-mean table (broadcast back), per-vector dot via rounded-"
    "decimal terms, no pairwise work anywhere",
    tags=("llm", "similarity", "quality"),
)
def embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from counsel_data_pipeline_spark.plans._parity import dec, to_double

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select(
            "vec_id", sim.as_double_array(F.col("embedding")).alias("v")
        )
        .withColumn("nrm", sim.l2_norm(F.col("v")))
        .filter(F.col("nrm") > 0)
    )
    # norms ride the exploded stream so the scoring pass needs no join
    # back to the vector table; the 64-row dim-mean table is materialized
    # once (it feeds the mean-norm scalar AND the broadcast scoring join —
    # re-deriving it cost two extra fact scans in the r11 audit). Two
    # fact passes total: dim-mean build, then score.
    x = emb.select("vec_id", "nrm", F.posexplode("v").alias("pos", "x"))
    dims = pin(x.groupBy("pos").agg(
        (to_double(F.sum(dec("x")), 6) / F.count("x")).alias("dm")
    ), eager=False)
    mn = dims.agg(
        F.sqrt(
            to_double(
                F.sum(
                    F.round(F.col("dm") * F.col("dm"), 12).cast("decimal(30,12)")
                ),
                12,
            )
        ).alias("mnorm")
    )
    dots = (
        x.join(F.broadcast(dims), "pos")
        .groupBy("vec_id")
        .agg(
            to_double(
                F.sum(
                    F.round(F.col("x") * F.col("dm"), 9).cast("decimal(30,9)")
                ),
                9,
            ).alias("dotm"),
            F.max("nrm").alias("nrm"),
        )
    )
    return (
        dots.crossJoin(F.broadcast(mn))
        .select(
            "vec_id",
            (F.col("dotm") / (F.col("nrm") * F.col("mnorm"))).alias("center_cos"),
        )
        .orderBy("center_cos", "vec_id")
        .limit(30)
    )


# ---------------------------------------------------------------------------
# Label-noise audit: kNN label agreement (confident-learning shape)
# ---------------------------------------------------------------------------

_AUDIT_IDS = list(range(64))


@register(
    "sim_knn_label_agreement",
    oracle=f"""
        -- Label-noise audit over a {len(_AUDIT_IDS)}-vector sample: each
        -- audited embedding's top-{K} cosine neighbors vote on its label;
        -- low agreement flags a probably-mislabeled row (the
        -- confident-learning / kNN-consistency heuristic used to clean
        -- classifier training sets). Same bit-exact dot-product fold as
        -- the other similarity oracles.
        WITH emb AS (
          SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
        ),
        n AS (
          SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm FROM emb
        ),
        q AS (
          SELECT vec_id AS query_id, label AS q_label, v AS qv, nrm AS qn
          FROM n WHERE vec_id < {len(_AUDIT_IDS)}
        ),
        s AS (
          SELECT query_id, q_label, a.vec_id AS neighbor_id, a.label AS n_label,
                 list_dot_product(qv, a.v) / (qn * a.nrm) AS cosine
          FROM n a, q WHERE a.vec_id <> query_id
        ),
        topk AS (
          SELECT query_id, q_label, n_label FROM (
            SELECT *, row_number() OVER (
                     PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
                   ) AS rank
            FROM s
          ) WHERE rank <= {K}
        )
        SELECT query_id AS vec_id,
               CAST(max(q_label) AS INT) AS label,
               CAST(sum(CASE WHEN n_label = q_label THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_agree,
               CAST(sum(CASE WHEN n_label = q_label THEN 1 ELSE 0 END)
                          AS DOUBLE) / count(*) AS agree_frac,
               2 * sum(CASE WHEN n_label = q_label THEN 1 ELSE 0 END)
                 < count(*) AS suspect
        FROM topk
        GROUP BY query_id
    """,
    description=f"kNN label-noise audit: top-{K} neighbor label agreement "
    f"per audited embedding (confident-learning heuristic; suspect = "
    f"majority disagreement) — queries broadcast, corpus streams, output "
    f"is sample-sized",
    tags=("llm", "similarity", "quality"),
)
def knn_label_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-label QA at corpus scale: the audited sample is broadcast
    (bounded), the corpus streams through the scorer once, and only
    sample × k rows survive to the vote — the same plan shape as
    sim_cosine_topk_bruteforce, with the label vote folded on top. A
    full-corpus audit swaps the broadcast for the blocked-pairs path
    (_exact_pairs_blocked) without changing the vote semantics."""
    emb = load_table(spark, sf_dir, "embeddings")
    labels = emb.select("vec_id", "label")
    topk = sim.cosine_topk(emb, _AUDIT_IDS, k=K).select(
        "query_id", "neighbor_id"
    )
    q_lab = labels.filter(F.col("vec_id").isin(_AUDIT_IDS)).select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("q_label")
    )
    n_lab = labels.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("n_label")
    )
    votes = topk.join(F.broadcast(q_lab), "query_id").join(n_lab, "neighbor_id")
    agree = F.sum((F.col("n_label") == F.col("q_label")).cast("int"))
    return (
        votes.groupBy("query_id")
        .agg(
            F.max("q_label").cast("int").alias("label"),
            agree.cast("bigint").alias("n_agree"),
            (agree.cast("double") / F.count(F.lit(1))).alias("agree_frac"),
            (F.lit(2) * agree < F.count(F.lit(1))).alias("suspect"),
        )
        .withColumnRenamed("query_id", "vec_id")
    )


# ---------------------------------------------------------------------------
# Class prototypes: per-label centroid + per-dimension variance
# ---------------------------------------------------------------------------


@register(
    "sim_label_centroid_stats",
    oracle="""
        -- Per-label class prototypes over the embedding table: centroid
        -- and variance per dimension, computed on a 1e-6 integer grid so
        -- the sums are exact BIGINT and the only float steps per output
        -- value are two divisions, one subtraction, one multiply, and the
        -- final round — same-order IEEE in both engines.
        WITH d AS (
          SELECT label,
                 unnest(range(len(embedding))) AS dim,
                 unnest(embedding::DOUBLE[]) AS val
          FROM embeddings
        ),
        g AS (
          SELECT label, dim,
                 count(*) AS n,
                 CAST(sum(CAST(round(val * 1000000, 0) AS BIGINT)) AS BIGINT) AS s6,
                 CAST(sum(CAST(round(val * 1000000, 0) AS BIGINT)
                          * CAST(round(val * 1000000, 0) AS BIGINT)) AS BIGINT) AS ss6
          FROM d GROUP BY 1, 2
        )
        SELECT CAST(label AS INT) AS label, CAST(dim AS INT) AS dim,
               CAST(n AS BIGINT) AS n,
               CAST(s6 AS DOUBLE) / n / 1000000 AS centroid,
               (CAST(ss6 AS DOUBLE) / n
                      - (CAST(s6 AS DOUBLE) / n) * (CAST(s6 AS DOUBLE) / n))
                     / 1000000000000 AS variance
        FROM g
    """,
    description="per-label embedding class prototypes: centroid and "
    "variance per dimension on a 1e-6 integer grid (exact BIGINT sums, "
    "two aggregates in one pass) — one posexplode + one map-side-combined "
    "shuffle whose output is labels x dims regardless of corpus size",
    tags=("llm", "similarity", "quality"),
)
def label_centroid_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-set health check ANN curation needs: compact class
    prototypes (for centroid-distance outlier scoring, per-class drift,
    or seeding IVF with class-aware centroids). At 100 TB the explode is
    map-local and the aggregate's partial combine bounds the shuffle at
    partitions x (labels x dims)."""
    emb = load_table(spark, sf_dir, "embeddings")
    d = emb.select(
        "label", F.posexplode(sim.as_double_array(F.col("embedding"))).alias("dim", "val")
    )
    v6 = F.round(F.col("val") * 1_000_000, 0).cast("bigint")
    g = d.groupBy("label", "dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v6).cast("bigint").alias("s6"),
        F.sum(v6 * v6).cast("bigint").alias("ss6"),
    )
    mean6 = F.col("s6").cast("double") / F.col("n")
    return g.select(
        F.col("label").cast("int").alias("label"),
        F.col("dim").cast("int").alias("dim"),
        F.col("n").cast("bigint").alias("n"),
        (mean6 / 1_000_000).alias("centroid"),
        (
            (F.col("ss6").cast("double") / F.col("n") - mean6 * mean6)
            / 1_000_000_000_000
        ).alias("variance"),
    )


# ---------------------------------------------------------------------------
# Distributed PCA: one-pass moments + exact integer power iteration
# ---------------------------------------------------------------------------

_PCA_DIMS = 64
_PCA_ITERS = 96


def _pca_oracle() -> str:
    its = []
    prev = "it0"
    for k in range(1, _PCA_ITERS + 1):
        its.append(f"""
        w{k} AS MATERIALIZED (
          SELECT c.i AS i, CAST(sum(c.mm * p.x) AS BIGINT) AS w
          FROM cov c JOIN {prev} p ON p.i = c.j GROUP BY 1
        ),
        n{k} AS MATERIALIZED (
          SELECT greatest(max(abs(w)) // 1000000, 1) AS d FROM w{k}
        ),
        it{k} AS MATERIALIZED (
          SELECT i, w // d AS x FROM w{k} CROSS JOIN n{k}
        )""")
        prev = f"it{k}"
    d = _PCA_DIMS
    return f"""
        -- Distributed PCA, method-of-moments form: ONE corpus pass builds
        -- the d x d scaled-integer covariance (sums of v6_i*v6_j products
        -- on the 1e-6 grid); the dominant eigenvector then comes from
        -- {_PCA_ITERS} power iterations over that tiny matrix in EXACT
        -- integer arithmetic (truncating division — identical in both
        -- engines), so the iterative eigensolve itself hash-matches.
        WITH arr AS MATERIALIZED (
          SELECT list_transform(embedding::DOUBLE[],
                 x -> CAST(round(x * 1000000, 0) AS BIGINT)) AS v
          FROM embeddings
        ),
        pairs AS MATERIALIZED (
          SELECT unnest(flatten(list_transform(range({d}), i ->
                   list_transform(range({d}), j ->
                     {{'i': i, 'j': j, 'p': v[i+1] * v[j+1]}})))) AS s
          FROM arr
        ),
        m AS MATERIALIZED (
          SELECT s.i AS i, s.j AS j, count(*) AS n,
                 CAST(sum(s.p) AS BIGINT) AS sp
          FROM pairs GROUP BY 1, 2
        ),
        s1 AS MATERIALIZED (
          SELECT i, CAST(sum(v[i+1]) AS BIGINT) AS s6, count(*) AS n
          FROM arr CROSS JOIN (SELECT unnest(range({d})) AS i)
          GROUP BY i
        ),
        cov AS MATERIALIZED (
          SELECT m.i, m.j,
                 (m.sp // m.n - (a.s6 // a.n) * (b.s6 // b.n)) // 1000 AS mm
          FROM m JOIN s1 a ON a.i = m.i JOIN s1 b ON b.i = m.j
        ),
        it0 AS (SELECT unnest(range({d})) AS i, CAST(1000000 AS BIGINT) AS x),
        {",".join(its)}
        SELECT CAST(i AS INT) AS dim, x AS eigvec_scaled FROM it{_PCA_ITERS}
    """


def _tdiv(a: int, b: int) -> int:
    """Truncating integer division — matches Spark div() and DuckDB //."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


@register(
    "sim_pca_power_iteration",
    oracle=_pca_oracle(),
    description=f"distributed PCA: one-pass {_PCA_DIMS}x{_PCA_DIMS} "
    f"scaled-integer covariance moments (map-side combined, output d² "
    f"rows regardless of corpus) + {_PCA_ITERS} exact integer power "
    f"iterations for the dominant eigenvector — the iterative eigensolve "
    f"is fully oracle-checked (truncating division, no float anywhere)",
    tags=("llm", "similarity", "iterative"),
    bench=True,
)
def pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The textbook distributed-PCA split: the corpus-sized work is ONE
    scan producing d² exact integer moments (the only shuffle, bounded at
    partitions × d² by map-side combine); the eigensolve runs on that
    d²-row matrix — data-independent, bounded by construction — with
    truncating-division integer arithmetic that both engines (and this
    driver-side loop) compute identically. At 100 TB nothing after the
    scan grows with the data; collecting a fixed 4096-cell matrix is the
    same bounded-small class as the 64-row prefix-sum collects."""
    d, scale = _PCA_DIMS, 1_000_000
    emb = load_table(spark, sf_dir, "embeddings")
    arr = emb.select(
        F.expr(
            f"transform(CAST(embedding AS ARRAY<DOUBLE>), "
            f"x -> CAST(round(x * {scale}, 0) AS BIGINT))"
        ).alias("v")
    )
    # r16 moment pass (guide §2.3 "aggregate before you shuffle" + §1.2
    # step 1): ONE aggregation replaces the r15 shape's two jobs — a d²-
    # struct-per-row explode (N·d² = 8.2M rows at sf0.1) feeding a (i,j)
    # groupBy, plus a second posexplode scan for the column sums. Here
    # the row stream is posexplode alone (N·d rows), each row carrying
    # its vector once, and the d per-i row sums Σ x·v[j] are d AGGREGATE
    # COLUMNS of a single d-group hash aggregate — partial aggregation
    # compacts everything map-side, the shuffle is partitions × d rows,
    # and the arithmetic is the identical exact-integer Σ v_i·v_j.
    pos = arr.select(F.posexplode("v").alias("i", "x"), "v")
    row_aggs = pos.groupBy("i").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("bigint").alias("s6"),
        *[
            F.sum(F.col("x") * F.col("v")[j]).cast("bigint").alias(f"sp{j}")
            for j in range(d)
        ],
    )
    # bounded-by-construction collect: d rows × (d + 2) cols,
    # data-independent — the same d² + d integers as the r15 two-collect
    # shape, in one job
    rows = row_aggs.collect()
    mom = {(r["i"], j): (r["n"], r[f"sp{j}"]) for r in rows for j in range(d)}
    s1m = {r["i"]: (r["s6"], r["n"]) for r in rows}
    mean = {i: _tdiv(s6, n) for i, (s6, n) in s1m.items()}
    cov = {
        (i, j): _tdiv(_tdiv(sp, n) - mean[i] * mean[j], 1000)
        for (i, j), (n, sp) in mom.items()
    }
    x = [scale] * d
    for _ in range(_PCA_ITERS):
        w = [sum(cov[(i, j)] * x[j] for j in range(d)) for i in range(d)]
        dd = max(max(abs(v) for v in w) // scale, 1)
        x = [_tdiv(v, dd) for v in w]
    return spark.createDataFrame(
        [(i, x[i]) for i in range(d)], "dim int, eigvec_scaled bigint"
    )
