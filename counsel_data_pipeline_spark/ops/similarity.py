"""Similarity search over embedding columns (north-star extension,
SURVEY §7 M6 — no reference analog; BASELINE.json requires it).

Brute-force cosine top-k is the exact baseline: queries are broadcast, the
corpus streams through one stage, a per-query window keeps the top k.
At 100 TB: corpus-side scan is embarrassingly parallel; the top-k window
shuffles only (n_queries × k) candidate rows — compute a per-partition
partial top-k first via groupBy(query).agg if k is small (Catalyst's
TakeOrderedAndProject does this for global sorts; for grouped top-k the
window on the pre-filtered candidates is the standard shape).

The LSH bucket path (random-hyperplane signs) bounds the candidate set per
query for the approximate variant; hyperplanes are derived deterministically
from md5 so runs are reproducible without a stored model.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_double_array(c: Column) -> Column:
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Left-to-right fold of elementwise double products — the evaluation
    order is pinned so results are bit-reproducible across engines."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(c: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda a, x: a + x))


def cosine_topk(
    corpus: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id (self excluded).

    Returns (query_id, neighbor_id, cosine, rank); deterministic tiebreak
    on neighbor id.
    """
    emb = corpus.select(
        F.col(id_col).alias("__id"), as_double_array(F.col(vec_col)).alias("__v")
    ).withColumn("__norm", l2_norm(F.col("__v")))
    queries = emb.filter(F.col("__id").isin(query_ids)).select(
        F.col("__id").alias("query_id"),
        F.col("__v").alias("__qv"),
        F.col("__norm").alias("__qnorm"),
    )
    pairs = emb.crossJoin(F.broadcast(queries)).filter(F.col("__id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        F.col("__id").alias("neighbor_id"),
        (dot(F.col("__qv"), F.col("__v")) / (F.col("__qnorm") * F.col("__norm"))).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def near_dup_pairs_topn(
    corpus: DataFrame,
    top_n: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact_threshold: int | None = 100_000,
    n_planes: int = 8,
    n_tables: int = 6,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate detection: the ``top_n`` most
    similar (id_a < id_b) pairs, globally ranked by cosine desc with a
    deterministic id tiebreak.

    Two physical strategies behind one result contract:

    - corpus ≤ ``exact_threshold`` rows → exact all-pairs: normalized
      self-join with the smaller side broadcast, then a global top-n
      (Catalyst compiles orderBy+limit to TakeOrderedAndProject —
      per-partition partial top-n, no full sort).
    - larger → banded sign-LSH candidates (the MinHash-banding shape
      applied to hyperplane signs): ``n_tables`` independent plane sets,
      a row hashes to one bucket PER table, candidates are rows agreeing
      exactly in at least one table — a (table, bucket) equi-self-join, a
      plain shuffle join with NO broadcast of the corpus anywhere — and
      the exact cosine runs only on candidates. For a pair at angle θ,
      P(candidate) = 1-(1-(1-θ/π)^planes)^tables — steep around the
      near-dup regime; recall < 1 by design (asserted against the exact
      path in tests). Shuffle volume is n_tables× the corpus width-wise,
      bounded and tunable.

    The gate exists because round 1 shipped the exact path unguarded —
    ``F.broadcast`` of the whole corpus OOMs every executor the moment the
    table outgrows the driver. Pass ``exact_threshold=None`` to force the
    exact plan (the oracle twin does, at sf scales where it's safe), or
    ``0`` to force the LSH plan.
    """
    emb = corpus.select(
        F.col(id_col).alias("__id"), as_double_array(F.col(vec_col)).alias("__v")
    ).withColumn("__norm", l2_norm(F.col("__v")))

    use_exact = exact_threshold is None or corpus.count() <= exact_threshold
    if use_exact:
        right = emb.select(
            F.col("__id").alias("id_b"),
            F.col("__v").alias("__vb"),
            F.col("__norm").alias("__nb"),
        )
        pairs = emb.join(F.broadcast(right), F.col("__id") < F.col("id_b"))
    else:
        # (n_planes, n_tables) tune to the target similarity: defaults are
        # sized for the near-dup regime (cos ≥ 0.9 → sign-agreement prob
        # ≥ 0.86/plane → pair recall ≈ 0.87). Pairs at cos ≈ 0.5 are NOT
        # near-dups and are deliberately unlikely candidates.
        banded = emb.select(
            "__id",
            "__v",
            "__norm",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("t"),
                            hyperplane_lsh_bucket(
                                F.col("__v"), n_planes, dim, seed=t
                            ).alias("b"),
                        )
                        for t in range(n_tables)
                    ]
                )
            ).alias("__tb"),
        )
        right = banded.select(
            F.col("__id").alias("id_b"),
            F.col("__v").alias("__vb"),
            F.col("__norm").alias("__nb"),
            F.col("__tb").alias("__tbb"),
        )
        pairs = banded.join(
            right,
            (F.col("__tb") == F.col("__tbb")) & (F.col("__id") < F.col("id_b")),
        ).dropDuplicates(["__id", "id_b"])

    scored = pairs.select(
        F.col("__id").alias("id_a"),
        "id_b",
        (dot(F.col("__v"), F.col("__vb")) / (F.col("__norm") * F.col("__nb"))).alias(
            "cosine"
        ),
    )
    return (
        scored.orderBy(F.col("cosine").desc(), "id_a", "id_b")
        .limit(top_n)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("cosine").desc(), "id_a", "id_b")
            ),
        )
    )


def kmeans_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    n_iters: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Spherical k-means (Lloyd's) centroid training for IVF — the
    'drop-in upgrade' over lowest-id seeding.

    Each iteration: assign every vector to its max-cosine centroid (one
    broadcast of the tiny centroid table — the corpus never shuffles),
    then recompute each cell's mean vector (one hash aggregate with dim
    partial-avg columns, map-side combined). localCheckpoint() truncates
    the per-iteration lineage, same discipline as ops/clusters.py. Cells
    that lose all members drop out (n_centroids is an upper bound).

    Deterministic: seed = lowest-id vectors, assignment ties broken by
    struct comparison — reruns converge identically.

    Returns (__cid, __cv, __cn) ready for ``ivf_topk(centroids_df=...)``.
    """
    emb = corpus.select(
        F.col(id_col).alias("__id"), as_double_array(F.col(vec_col)).alias("__v")
    ).withColumn("__norm", l2_norm(F.col("__v")))

    cents = (
        emb.orderBy("__id")
        .limit(n_centroids)
        .select(
            F.col("__id").alias("__cid"),
            F.col("__v").alias("__cv"),
            F.col("__norm").alias("__cn"),
        )
        .localCheckpoint()
    )
    for _ in range(n_iters):
        sim = emb.crossJoin(F.broadcast(cents)).select(
            "__id",
            F.struct(
                (
                    dot(F.col("__v"), F.col("__cv"))
                    / (F.col("__norm") * F.col("__cn"))
                ).alias("csim"),
                F.col("__cid").alias("cid"),
                F.col("__v").alias("v"),
            ).alias("s"),
        )
        best = sim.groupBy("__id").agg(F.max("s").alias("s"))
        assigned = best.select(F.col("s.cid").alias("__cid"), F.col("s.v").alias("__v"))
        new_cv = F.array(*[F.avg(F.col("__v")[d]) for d in range(dim)])
        cents = (
            assigned.groupBy("__cid")
            .agg(new_cv.alias("__cv"))
            .withColumn("__cn", l2_norm(F.col("__cv")))
            .localCheckpoint()
        )
    return cents


def ivf_topk(
    corpus: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids_df: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k via IVF (inverted-file) lists — the classic ANN
    scale path: partition the corpus into ``n_centroids`` Voronoi cells,
    search only the ``n_probe`` cells nearest each query.

    Centroid selection is deterministic without a trained model: the
    ``n_centroids`` lowest-id vectors seed the cells (reproducible across
    runs/engines; a k-means refinement is a drop-in upgrade). Assignment
    is one broadcast join + ``min_by`` over cells; queries fan out to
    their probe list, so per-query work is (n_probe/n_centroids) of the
    corpus. Recall < 1 by design — measured against the exact brute force
    in tests.
    """
    emb = corpus.select(
        F.col(id_col).alias("__id"), as_double_array(F.col(vec_col)).alias("__v")
    ).withColumn("__norm", l2_norm(F.col("__v")))

    centroids = centroids_df if centroids_df is not None else (
        emb.orderBy("__id")
        .limit(n_centroids)
        .select(
            F.col("__id").alias("__cid"),
            F.col("__v").alias("__cv"),
            F.col("__norm").alias("__cn"),
        )
    )

    def nearest_cells(df: DataFrame, n: int, out_col: str) -> DataFrame:
        """Rank centroids by cosine for each row; keep the n nearest."""
        sim = df.crossJoin(F.broadcast(centroids)).select(
            df["*"],
            F.col("__cid"),
            (dot(F.col("__v"), F.col("__cv")) / (F.col("__norm") * F.col("__cn"))).alias(
                "__csim"
            ),
        )
        w = Window.partitionBy("__id").orderBy(F.col("__csim").desc(), F.col("__cid"))
        return (
            sim.withColumn("__crank", F.row_number().over(w))
            .filter(F.col("__crank") <= n)
            .withColumnRenamed("__cid", out_col)
            .drop("__csim", "__crank")
        )

    assigned = nearest_cells(emb, 1, "__cell")
    queries = nearest_cells(emb.filter(F.col("__id").isin(query_ids)), n_probe, "__qcell").select(
        F.col("__id").alias("query_id"),
        F.col("__v").alias("__qv"),
        F.col("__norm").alias("__qnorm"),
        F.col("__qcell"),
    )
    pairs = assigned.join(
        F.broadcast(queries),
        (F.col("__cell") == F.col("__qcell")) & (F.col("__id") != F.col("query_id")),
    )
    scored = pairs.select(
        "query_id",
        F.col("__id").alias("neighbor_id"),
        (dot(F.col("__qv"), F.col("__v")) / (F.col("__qnorm") * F.col("__norm"))).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def hyperplane_lsh_bucket(
    vec: Column, n_planes: int = 16, dim: int = 64, seed: int | None = None
) -> Column:
    """Sign-LSH bucket id from ``n_planes`` deterministic pseudo-random
    hyperplanes. Plane p's component d is derived from md5(p:d) — a uniform
    value in [-0.5, 0.5) — so the partitioning is stable across runs and
    engines without storing a model. ``seed`` derives an independent plane
    set per hash table (banded LSH); None keeps the original single-table
    plane values."""
    bits = []
    for p in range(n_planes):
        label = f"{seed}:{p}" if seed is not None else f"{p}"
        comps = F.array(
            *[
                (
                    F.conv(F.substring(F.md5(F.lit(f"{label}:{d}")), 1, 8), 16, 10).cast(
                        "double"
                    )
                    / F.lit(float(16**8))
                    - F.lit(0.5)
                )
                for d in range(dim)
            ]
        )
        bits.append(F.when(dot(comps, vec) >= 0, F.lit(1)).otherwise(F.lit(0)) * (2**p))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_bucketed_topk(
    corpus: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    multiprobe: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket,
    plus (multiprobe) every bucket one bit-flip away — the standard
    recall/cost knob, probing the n_planes nearest buckets.

    The scale path — corpus rows hash to ONE bucket each (narrow shuffle on
    a small int key); only the broadcast query side fans out to its probe
    set, so candidate volume is (probes/2^planes) of the corpus per query.
    Recall < 1 by design; exact cosine runs only within probed buckets.
    """
    emb = corpus.select(
        F.col(id_col).alias("__id"), as_double_array(F.col(vec_col)).alias("__v")
    ).withColumn("__bucket", hyperplane_lsh_bucket(F.col("__v"), n_planes, dim))
    emb = emb.withColumn("__norm", l2_norm(F.col("__v")))
    probe_offsets = [0] + ([1 << p for p in range(n_planes)] if multiprobe else [])
    queries = (
        emb.filter(F.col("__id").isin(query_ids))
        .select(
            F.col("__id").alias("query_id"),
            F.col("__v").alias("__qv"),
            F.col("__norm").alias("__qnorm"),
            F.explode(
                F.array(*[F.col("__bucket").bitwiseXOR(F.lit(o)) for o in probe_offsets])
            ).alias("__qbucket"),
        )
    )
    pairs = emb.join(
        F.broadcast(queries),
        (F.col("__bucket") == F.col("__qbucket")) & (F.col("__id") != F.col("query_id")),
    )
    scored = pairs.select(
        "query_id",
        F.col("__id").alias("neighbor_id"),
        (dot(F.col("__qv"), F.col("__v")) / (F.col("__qnorm") * F.col("__norm"))).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
