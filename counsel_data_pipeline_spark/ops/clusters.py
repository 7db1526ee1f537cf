"""Connected components over near-duplicate pairs — pairs → dedup CLUSTERS.

Pairwise near-dup output (ops/text_dedup) is not yet a dedup decision: if
A~B and B~C, all three must collapse to ONE canonical doc even when A~C
scored below threshold. That closure is a connected-components problem —
inherently iterative, the one operator in the dedup family that a single
SQL query can't express (the DuckDB oracle uses a recursive CTE instead).

Algorithm: min-label propagation. Every node starts labeled with its own
id; each round a node takes the min of its label and its neighbors'
labels; fixpoint = component id (the component's minimum node id — a
deterministic canonical representative, same rule as exact_dedup's
min(doc_id) survivor).

Scale design:
  - Each round is one shuffle (join on node id + min-aggregate); rounds
    needed = graph diameter, and near-dup graphs are shallow (clusters of
    copies, diameter ≲ 5-6), so the loop is short.
  - pin(loop=True) every round truncates the lineage (localCheckpoint
    by default; reliable checkpoint under spark.counsel.pin.mode, see
    ops/materialize) — without it the plan doubles per iteration and the
    driver, not the data, becomes the bottleneck.
  - Convergence is detected with a count of changed labels (one cheap
    action per round); max_rounds bounds the worst case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from counsel_data_pipeline_spark.ops.materialize import pin


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_rounds: int = 20,
) -> DataFrame:
    """Components of the undirected graph given as (src, dst) pairs.

    Returns (id, component): one row per node appearing in any edge,
    component = min node id reachable from it.

    Label propagation converges in O(diameter) rounds; if ``max_rounds``
    is exhausted while labels are still changing the result would be
    silently wrong (long chains split into several components), so that
    case raises instead. Raise ``max_rounds`` for graphs whose diameter
    can exceed it — near-dup clusters are almost always shallow.
    """
    sym = pin(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct(),
        loop=True,
    )
    labels = pin(
        sym.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id")),
        loop=True,
    )
    changed = -1
    for _ in range(max_rounds):
        neighbor_min = (
            sym.join(labels.withColumnRenamed("id", "v"), "v")
            .groupBy(F.col("u").alias("id"))
            .agg(F.min("comp").alias("nmin"))
        )
        new_labels = pin(
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.least(F.col("comp"), F.coalesce("nmin", F.col("comp"))).alias("comp"),
                (F.col("nmin") < F.col("comp")).alias("changed"),
            ),
            loop=True,
        )
        changed = new_labels.filter(F.col("changed")).count()
        labels = new_labels.select("id", "comp")
        if changed == 0:
            break
    if changed != 0:
        # The final round may have written the fixpoint labels (changed
        # counts updates MADE, not updates REMAINING) — one extra check
        # distinguishes "converged on the last round" from truly
        # unfinished before raising.
        neighbor_min = (
            sym.join(labels.withColumnRenamed("id", "v"), "v")
            .groupBy(F.col("u").alias("id"))
            .agg(F.min("comp").alias("nmin"))
        )
        still = (
            labels.join(neighbor_min, "id", "left")
            .filter(F.col("nmin") < F.col("comp"))
            .count()
        )
        if still != 0:
            raise RuntimeError(
                f"connected_components did not converge in {max_rounds} rounds "
                f"({still} labels still changing) — graph diameter exceeds "
                f"max_rounds; raise it"
            )
    return labels


def dedup_clusters(pairs: DataFrame, src: str = "id_a", dst: str = "id_b") -> DataFrame:
    """Near-dup pairs → (doc_id, cluster_id, cluster_size). cluster_id is
    the min doc id of the component (the canonical survivor)."""
    cc = connected_components(pairs, src, dst)
    sizes = cc.groupBy("comp").agg(F.count(F.lit(1)).alias("cluster_size"))
    return cc.join(sizes, "comp").select(
        F.col("id").alias("doc_id"),
        F.col("comp").alias("cluster_id"),
        "cluster_size",
    )


def keep_list_frame(docs, threshold: float = 0.5, n: int = 3):
    """Per-doc keep/drop verdict with canonical pointer and reason — the
    applied artifact of the near-dup cluster family (behind the
    ``dedup_keep_list`` catalog query; shared so tests exercise the
    registered composition).

    Compose (jaccard pairs ∪ exact-hash pairs) → connected clusters →
    min-id canonical → reason classification (exact = same content md5 as
    the canonical). The explicit exact edges matter for documents SHORTER
    than ``n`` tokens: they produce no shingles, hence no jaccard pair, so
    without them two identical short texts would each stay a keep/canonical
    singleton — the near closure subsumes exact only for shingle-bearing
    docs. Scale shape: the cluster query's plan plus one extra hash-groupBy
    and two narrow id-joins; every added join moves hashes, never text.
    """
    from pyspark.sql import functions as F

    from counsel_data_pipeline_spark.ops import text_dedup as td
    from counsel_data_pipeline_spark.ops.text_analysis import content_md5

    # Persisted: three consumers (exact-mins aggregation, exact-pairs
    # probe, the cluster assignment spine) would otherwise re-scan and
    # re-hash every document's text — same rationale as the dedup-family
    # signature persists.
    h = docs.select("doc_id", content_md5(F.col("text")).alias("__h")).persist()
    near_pairs = td.jaccard_pairs(
        docs, n=n, threshold=threshold, max_shingle_df=None
    ).select("id_a", "id_b")
    # Star edges (group-min ↔ member) connect every member of an exact
    # group, including groups of 3+ (a single min-max edge would miss the
    # middle members).
    exact_mins = h.groupBy("__h").agg(F.min("doc_id").alias("id_a"))
    exact_pairs = (
        h.join(exact_mins, "__h")
        .filter(F.col("doc_id") != F.col("id_a"))
        .select("id_a", F.col("doc_id").alias("id_b"))
    )
    pairs = near_pairs.unionByName(exact_pairs)
    clusters = dedup_clusters(pairs).select("doc_id", "cluster_id")
    assigned = (
        h.join(clusters, "doc_id", "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", "doc_id"))
        .persist()
    )
    canon = assigned.select(F.col("doc_id").alias("__cid"), F.col("__h").alias("__hc"))
    keep = F.col("doc_id") == F.col("cluster_id")
    return (
        assigned.join(canon, F.col("cluster_id") == F.col("__cid"))
        .select(
            "doc_id",
            F.when(keep, F.lit("keep")).otherwise(F.lit("drop")).alias("verdict"),
            F.when(keep, F.lit(-1).cast("bigint"))
            .otherwise(F.col("cluster_id"))
            .alias("dup_of"),
            F.when(keep, F.lit("canonical"))
            .when(F.col("__h") == F.col("__hc"), F.lit("exact"))
            .otherwise(F.lit("near"))
            .alias("reason"),
        )
    )
