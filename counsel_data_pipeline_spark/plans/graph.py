"""Graph analytics over relational data — iterative algorithms expressed
as a bounded chain of joins, with EXACT scaled-integer arithmetic so even
the iterative ranking is fully oracle-checkable (the same determinism
trick as the md5 sketches: no float accumulation anywhere).

The graph is the part co-purchase graph (parts appearing in the same
order — the lineitem self-join that already powers
tpch_copurchase_part_pairs), symmetrized. Each PageRank iteration is one
edges ⋈ ranks join + one aggregate; ranks are BIGINT in 1e-12 units and
every division is floor division, which Spark's ``div`` and DuckDB's
``//`` compute identically. The rank vector is node-sized, so each
iteration broadcasts it against the persisted degree-annotated edge list
— the edges are NEVER reshuffled, and the dst aggregate's map-side
combine bounds the only shuffle at partitions × nodes. When the node set
outgrows broadcast (billions of vertices), the same loop runs with both
sides hash-partitioned on the join key and ranks localCheckpoint'ed per
iteration, exactly like ops/clusters.py's connected-components loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from counsel_data_pipeline_spark.catalog import register
from counsel_data_pipeline_spark.io.sources import load_table

_PR_SCALE = 10**12
_PR_ITERS = 3
_TOPK = 100


def _pagerank_oracle() -> str:
    it_prev = "it0"
    its = []
    for i in range(1, _PR_ITERS + 1):
        its.append(
            f"""
        it{i} AS (
          SELECT n.node,
                 c.base + (85 * COALESCE(s.contrib, 0)) // 100 AS pr
          FROM nodes n
          CROSS JOIN consts c
          LEFT JOIN (
            SELECT e.dst AS node, sum(p.pr // d.outdeg) AS contrib
            FROM edges e
            JOIN {it_prev} p ON p.node = e.src
            JOIN deg d ON d.node = e.src
            GROUP BY 1
          ) s ON s.node = n.node
        )"""
        )
        it_prev = f"it{i}"
    its_sql = ",".join(its)
    return f"""
        -- Exact integer PageRank (alpha=0.85, {_PR_ITERS} iterations) over
        -- the symmetrized part co-purchase graph. Ranks are BIGINT in
        -- 1e-12 units; every division is floor division, so the iterate
        -- is bit-identical in any engine — the iterative algorithm itself
        -- is oracle-checked, not just sampled.
        WITH pairs AS (
          SELECT a.l_partkey AS src, b.l_partkey AS dst
          FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
          JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        ),
        edges AS (SELECT DISTINCT src, dst FROM pairs),
        nodes AS (SELECT DISTINCT src AS node FROM edges),
        deg AS (SELECT src AS node, count(*) AS outdeg FROM edges GROUP BY 1),
        consts AS (
          SELECT (15 * ({_PR_SCALE} // n)) // 100 AS base,
                 {_PR_SCALE} // n AS pr0
          FROM (SELECT count(*) AS n FROM nodes)
        ),
        it0 AS (SELECT node, c.pr0 AS pr FROM nodes CROSS JOIN consts c),
        {its_sql}
        SELECT node AS part_id, CAST(pr AS BIGINT) AS pr_scaled
        FROM it{_PR_ITERS}
        ORDER BY pr DESC, node
        LIMIT {_TOPK}
    """


@register(
    "graph_pagerank_copurchase",
    oracle=_pagerank_oracle(),
    description=f"exact integer PageRank (alpha=0.85, {_PR_ITERS} "
    f"iterations, ranks in 1e-12 units, floor division) over the "
    f"symmetrized part co-purchase graph; top-{_TOPK} by rank — one "
    f"edges-partitioned join + aggregate per iteration, no float "
    f"accumulation, fully oracle-checked despite being iterative",
    tags=("graph", "tpch", "iterative"),
    bench=True,
)
def pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative graph ranking as a deterministic relational program.
    Each iteration: contrib = pr // outdeg per edge source, shuffled on
    dst, summed, damped in integer arithmetic. The edge list is persisted
    once (it drives every iteration); ranks are a node-sized frame. The
    fixed iteration count keeps the plan a finite join chain — the
    unbounded-convergence variant lives in ops/clusters.py's CC loop with
    localCheckpoint, same shape."""
    return pagerank_copurchase_plan(spark, sf_dir, broadcast_ranks=True)


def pagerank_copurchase_plan(
    spark: SparkSession, sf_dir: str, broadcast_ranks: bool = True
) -> DataFrame:
    """``broadcast_ranks=True`` is the benchable-scale shape: the
    node-sized rank vector broadcasts against the persisted edge list, so
    edges never reshuffle. ``broadcast_ranks=False`` is the
    billions-of-vertices shape the module docstring promises: the edge
    list is hash-partitioned ONCE on src and persisted in that layout;
    each iteration repartitions only the (small) rank vector to the same
    key and localCheckpoints the result, so every edges⋈ranks join is a
    co-partitioned sort-merge with zero edge movement and no node-sized
    broadcast anywhere. Both paths run the identical integer arithmetic —
    ``tests/test_r6_ops.py`` asserts rank-for-rank equality under
    autoBroadcastJoinThreshold=-1."""
    # no pre-distinct on (orderkey, partkey): the edge-level distinct
    # below already canonicalizes, and skipping it removes a full
    # fact-table shuffle (duplicate same-part lines per order are rare)
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    b = li.select("l_orderkey", F.col("l_partkey").alias("dst"))
    edges = (
        li.withColumnRenamed("l_partkey", "src")
        .join(b, "l_orderkey")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    # deg is node-sized and feeds nodes/consts AND every iteration's rank
    # rebuild — persisting it cuts the co-purchase self-join out of all of
    # their lineages (without it, each of the 3 iterations re-ran the full
    # fact self-join just to enumerate the node set).
    deg = (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("outdeg"))
        .persist()
    )
    # One materialized pass builds the degree-annotated edge list every
    # iteration reuses; outdeg rides along so the per-iteration work is a
    # single broadcast join + aggregate over this cached frame.
    src_deg = edges.join(F.broadcast(deg), edges.src == deg.node).select(
        "src", "dst", "outdeg"
    )
    if not broadcast_ranks:
        # pin the edge layout: hash-partitioned on the per-iteration join
        # key, materialized once — iterations move only rank rows
        src_deg = src_deg.repartition("src")
    src_deg = src_deg.persist()
    nodes = deg.select("node")
    consts = nodes.agg(F.count(F.lit(1)).alias("n")).select(
        F.expr(f"div(15 * div({_PR_SCALE}, n), 100)").alias("base"),
        F.expr(f"div({_PR_SCALE}, n)").alias("pr0"),
    )
    pr = nodes.crossJoin(F.broadcast(consts)).select(
        "node", F.col("pr0").cast("bigint").alias("pr")
    )
    for _ in range(_PR_ITERS):
        ranks_as_src = pr.withColumnRenamed("node", "src")
        if broadcast_ranks:
            # rank vector is node-sized — broadcast it so the edge list is
            # never reshuffled; the dst aggregate's map-side combine bounds
            # the only shuffle at partitions × nodes
            ranks_side = F.broadcast(ranks_as_src)
        else:
            # extreme-scale path: ranks shuffle to the edges' pinned
            # layout; the persisted edge side never moves
            ranks_side = ranks_as_src.repartition("src")
        contrib = (
            src_deg.join(ranks_side, "src")
            .select("dst", F.expr("div(pr, outdeg)").alias("c"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("c").alias("contrib"))
        )
        new_pr = (
            nodes.crossJoin(F.broadcast(consts))
            .join(
                F.broadcast(contrib) if broadcast_ranks else contrib,
                "node",
                "left",
            )
            .select(
                "node",
                (
                    F.col("base")
                    + F.expr("div(85 * coalesce(contrib, 0), 100)")
                ).cast("bigint").alias("pr"),
            )
        )
        # without broadcasts the per-iteration plan would nest join trees
        # _PR_ITERS deep — truncate lineage so iteration cost stays flat
        pr = new_pr if broadcast_ranks else new_pr.localCheckpoint()
    return (
        pr.orderBy(F.col("pr").desc(), "node")
        .limit(_TOPK)
        .select(F.col("node").alias("part_id"), F.col("pr").alias("pr_scaled"))
    )
