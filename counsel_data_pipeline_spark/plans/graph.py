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
from counsel_data_pipeline_spark.ops.materialize import pin

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
    # r16 edge build (guide §2.4/§3.3 — explode after the key-local work,
    # never a fact self-join): group each order's DISTINCT parts into one
    # array (the groupBy reuses the repartition's hash layout, so the
    # whole build costs one narrow shuffle of (orderkey, partkey) ints),
    # then emit the ordered pairs per order IN-ARRAY via transform —
    # replacing the r15 self-join whose probe side ran on the scan's
    # single input partition and whose pair stream carried into the
    # distinct at full width. The per-order fan-out is bounded by the
    # order's distinct-part count (TPC-H: ≤7), so the explode never
    # amplifies a hot key the way an uncapped join side would.
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    per_order = (
        li.repartition("l_orderkey")
        .groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("ps"))
        .filter(F.size("ps") >= 2)
    )
    # persisted: the pair stream feeds BOTH deg and src_deg — without the
    # cache it ran twice (r9 fix; the cache is freed as soon as src_deg
    # materializes below)
    edges = (
        per_order.select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, x -> transform("
                    "filter(ps, y -> y != x), "
                    "y -> struct(x AS src, y AS dst))))"
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
        .persist()
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
    # materialize the one-pass build now and free the raw edge cache: the
    # iterations only ever touch src_deg/deg, so at scale only ONE
    # edge-sized frame stays resident, not two
    src_deg.count()
    edges.unpersist()
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
        # r16: no nodes ⋈ contrib rebuild. The co-purchase graph is
        # symmetrized by construction (every (src, dst) has its (dst,
        # src) twin), so contrib's group keys are EXACTLY the node set —
        # the oracle's LEFT JOIN onto nodes never takes its NULL branch —
        # and the damped rank can be computed straight off the aggregate,
        # dropping one join + one node-sized broadcast per iteration
        # (guide §2.4: two operations keyed the same way share one
        # exchange; here the second operation disappears entirely).
        new_pr = contrib.crossJoin(F.broadcast(consts)).select(
            "node",
            (
                F.col("base") + F.expr("div(85 * contrib, 100)")
            ).cast("bigint").alias("pr"),
        )
        # without broadcasts the per-iteration plan would nest join trees
        # _PR_ITERS deep — truncate lineage so iteration cost stays flat
        pr = new_pr if broadcast_ranks else pin(new_pr, loop=True)
    return (
        pr.orderBy(F.col("pr").desc(), "node")
        .limit(_TOPK)
        .select(F.col("node").alias("part_id"), F.col("pr").alias("pr_scaled"))
    )


# ---------------------------------------------------------------------------
# HITS on the bipartite customer→part purchase graph (4th exact iterative)
# ---------------------------------------------------------------------------

_HITS_SCALE = 10**6  # small enough that a_raw * SCALE stays far below 2^53
_HITS_ITERS = 3


def _hits_oracle() -> str:
    its = []
    h_prev = "h0"
    for i in range(1, _HITS_ITERS + 1):
        its.append(f"""
        a{i}r AS MATERIALIZED (
          SELECT e.part, sum(h.h) AS raw
          FROM edges e JOIN {h_prev} h ON h.cust = e.cust
          GROUP BY 1
        ),
        a{i} AS MATERIALIZED (
          SELECT part, (raw * {_HITS_SCALE}) // (SELECT max(raw) FROM a{i}r) AS a
          FROM a{i}r
        ),
        h{i}r AS MATERIALIZED (
          SELECT e.cust, sum(a.a) AS raw
          FROM edges e JOIN a{i} a ON a.part = e.part
          GROUP BY 1
        ),
        h{i} AS MATERIALIZED (
          SELECT cust, (raw * {_HITS_SCALE}) // (SELECT max(raw) FROM h{i}r) AS h
          FROM h{i}r
        )""")
        h_prev = f"h{i}"
    return f"""
        -- Exact integer HITS ({_HITS_ITERS} iterations) on the bipartite
        -- customer→part purchase graph: authority(part) = Σ hub(customer),
        -- hub(customer) = Σ authority(part), each vector renormalized to
        -- max = SCALE with floor division — every iterate bit-identical
        -- in any engine (intermediate sums may widen, the OUTPUT is
        -- BIGINT). The 4th fully-oracle-checked iterative algorithm
        -- after PageRank, PCA and k-means.
        WITH edges AS MATERIALIZED (
          SELECT DISTINCT o_custkey AS cust, l_partkey AS part
          FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        ),
        h0 AS (
          SELECT DISTINCT cust, CAST({_HITS_SCALE} AS BIGINT) AS h FROM edges
        ),
        {",".join(its)}
        SELECT part AS part_id, CAST(a AS BIGINT) AS auth_scaled
        FROM a{_HITS_ITERS}
        ORDER BY a DESC, part
        LIMIT 100
    """


@register(
    "graph_hits_bipartite",
    oracle=_hits_oracle(),
    description=f"exact integer HITS ({_HITS_ITERS} iterations, scores "
    f"renormalized to max={_HITS_SCALE} with floor division) on the "
    "bipartite customer→part purchase graph; top-100 parts by authority "
    "— per iteration two edge joins + aggregates and a 1-row max "
    "broadcast, edges persisted once and never reshuffled",
    tags=("graph", "tpch", "iterative"),
)
def hits_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS needs direction; the co-purchase graph is symmetric, so the
    natural directed graph is the customer→part purchase bipartite. Each
    half-iteration is one edges⋈scores join (score vector broadcast —
    node-sized) + a map-side-combined sum + a 1-row max broadcast for
    the integer renormalization. The edge list is persisted once; at
    billions of edges the same loop runs co-partitioned like the
    PageRank non-broadcast path."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("part"))
        .distinct()
        .persist()
    )
    h = edges.select("cust").distinct().select(
        "cust", F.lit(_HITS_SCALE).cast("bigint").alias("h")
    )

    # raw * SCALE runs in non-ANSI BIGINT, which wraps silently past 2^63
    # while the DuckDB oracle widens to HUGEINT — so fail loud before the
    # multiply can wrap. raw <= SCALE * max_degree, so the guard trips only
    # past ~9.2e12 (a node of degree ~9 million); salt/partial-normalize
    # the hub sums before raising SCALE if that graph ever appears.
    _mx_limit = (2**63 - 1) // _HITS_SCALE

    def renorm(raw: DataFrame, key: str, val: str) -> DataFrame:
        mx = raw.agg(F.max("raw").alias("mx")).select(
            F.when(
                F.col("mx") > _mx_limit,
                F.raise_error(
                    F.concat(
                        F.lit(f"HITS renorm overflow: max(raw) > {_mx_limit}; "),
                        F.col("mx").cast("string"),
                    )
                ).cast("bigint"),
            )
            .otherwise(F.col("mx"))
            .alias("mx")
        )
        return raw.crossJoin(F.broadcast(mx)).select(
            key, F.expr(f"div(raw * {_HITS_SCALE}, mx)").alias(val)
        )

    for _ in range(_HITS_ITERS):
        a_raw = (
            edges.join(F.broadcast(h), "cust")
            .groupBy("part")
            .agg(F.sum("h").alias("raw"))
        )
        a = pin(renorm(a_raw, "part", "a"), loop=True)
        h_raw = (
            edges.join(F.broadcast(a), "part")
            .groupBy("cust")
            .agg(F.sum("a").alias("raw"))
        )
        h = pin(renorm(h_raw, "cust", "h"), loop=True)
    return (
        a.orderBy(F.col("a").desc(), "part")
        .limit(100)
        .select(F.col("part").alias("part_id"), F.col("a").cast("bigint").alias("auth_scaled"))
    )


_BFS_MAX_HOPS = 3


@register(
    "graph_bfs_copurchase_hops",
    oracle=f"""
        -- BFS as a recursive CTE: UNION dedups (node, hop) pairs so the
        -- recursion is finite under the hop bound; min(hop) per node is
        -- the BFS distance (a node reachable in h hops is generated at
        -- hop h). Seed = the smallest part key.
        WITH RECURSIVE edges AS (
          SELECT a.l_partkey AS src, b.l_partkey AS dst
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey
           AND a.l_partkey <> b.l_partkey
          GROUP BY 1, 2
        ),
        seed AS (SELECT min(l_partkey) AS s FROM lineitem),
        walk(node, hop) AS (
          SELECT s, 0 FROM seed
          UNION
          SELECT e.dst, w.hop + 1
          FROM walk w JOIN edges e ON e.src = w.node
          WHERE w.hop < {_BFS_MAX_HOPS}
        )
        SELECT node AS part, CAST(min(hop) AS BIGINT) AS hops
        FROM walk GROUP BY node
    """,
    description=f"BFS shortest-hops (<= {_BFS_MAX_HOPS}) from the smallest "
    "part over the co-purchase graph — frontier expansion with a "
    "left-anti visited filter and localCheckpoint per level (the 5th "
    "fully-oracle-checked iterative algorithm); the DuckDB twin is a "
    "recursive CTE, so the traversal itself is hash-attested",
    tags=("graph", "iterative"),
)
def bfs_copurchase_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale notes: the edge list is built once, hash-partitioned on src
    by the first frontier join and persisted in that layout — every
    level's frontier⋈edges join moves only the (node-sized) frontier,
    never the edges; the visited set stays node-sized and the per-level
    localCheckpoint cuts the growing lineage exactly like the CC loop
    (ops/clusters.py). Levels are set-valued (distinct + left-anti), so
    the result is independent of join order and partitioning — which is
    what lets a recursive CTE attest it."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    b = li.select("l_orderkey", F.col("l_partkey").alias("dst"))
    edges = (
        li.withColumnRenamed("l_partkey", "src")
        .join(b, "l_orderkey")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .persist()
    )
    try:
        seed = li.agg(F.min("l_partkey")).collect()[0][0]  # one scalar
        visited = spark.createDataFrame(
            [(int(seed), 0)], "part BIGINT, hops BIGINT"
        )
        frontier = visited
        for hop in range(1, _BFS_MAX_HOPS + 1):
            nxt = (
                frontier.join(edges, frontier["part"] == edges["src"])
                .select(F.col("dst").alias("part"))
                .distinct()
                .join(visited.select("part"), "part", "left_anti")
                .withColumn("hops", F.lit(hop).cast("bigint"))
            )
            nxt = pin(nxt, loop=True)
            visited = visited.unionByName(nxt)
            frontier = nxt
        # every level is eagerly pinned (loop=True: localCheckpoint or
        # reliable checkpoint per the pin mode — materialized either
        # way), so the union no longer reads the edge cache — safe to
        # free it, no collect
        return visited
    finally:
        edges.unpersist()


@register(
    "graph_triangle_count",
    oracle="""
        -- Triangle count is orientation-invariant: the oracle counts each
        -- triangle once via the simple u<v<w id-ordering; the Spark plan
        -- uses the degree-ordered orientation (the skew-safe scheme) and
        -- must land on the identical numbers. Wedge total = sum C(d,2)
        -- over the degree table; clustering in exact integer ppm.
        WITH e AS (
          SELECT a.l_partkey AS u, b.l_partkey AS v
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2
        ),
        deg AS (
          SELECT x, count(*) AS d FROM (
            SELECT u AS x FROM e UNION ALL SELECT v FROM e) t GROUP BY 1
        ),
        tri AS (
          SELECT count(*) AS n
          FROM e e1 JOIN e e2 ON e1.v = e2.u
          JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
        ),
        w AS (SELECT sum(d * (d - 1) // 2) AS n FROM deg)
        SELECT CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
               CAST((SELECT n FROM w) AS BIGINT) AS n_wedges,
               CAST((SELECT n FROM tri) AS BIGINT) AS n_triangles,
               CAST(3 * (SELECT n FROM tri) * 1000000 // (SELECT n FROM w)
                    AS BIGINT) AS clustering_ppm
    """,
    description="exact triangle count + global clustering coefficient "
    "over the co-purchase graph via DEGREE-ORDERED edge orientation "
    "(each triangle counted once at its lowest-degree corner — the "
    "hub-safe scheme); the oracle recounts with the simple id-ordering, "
    "so the green row certifies the orientation rewrite is exact",
    tags=("graph",),
)
def triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale notes: orienting every edge toward the higher (degree, id)
    bounds each node's out-degree near sqrt(2m) REGARDLESS of hubs — a
    celebrity part with degree 10^6 contributes no wedges (all its
    edges point INTO it), so the wedge join stays ~m^1.5 total instead
    of sum(deg^2) blowing up on skew. The wedge build and the closing
    probe are the only shuffles; the degree table is node-sized. The
    oracle deliberately uses the naive id-orientation — equality of the
    two counts is exactly the orientation-invariance theorem."""
    # r17: the shared in-array co-purchase edge build (see
    # _copurchase_edge_list) replaces this query's last remaining fact
    # self-join — identical (u < v) distinct edge set, one narrow
    # shuffle instead of the orderkey self-join + full-width distinct.
    e = _copurchase_edge_list(spark, sf_dir).persist()
    try:
        deg = (
            e.select(F.col("u").alias("x"))
            .unionByName(e.select(F.col("v").alias("x")))
            .groupBy("x")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        eu = e.join(
            deg.withColumnRenamed("x", "u").withColumnRenamed("d", "du"), "u"
        ).join(
            deg.withColumnRenamed("x", "v").withColumnRenamed("d", "dv"), "v"
        )
        lower_u = (F.col("du") < F.col("dv")) | (
            (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
        )
        o = eu.select(
            F.when(lower_u, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(lower_u, F.col("v")).otherwise(F.col("u")).alias("dst"),
            F.when(lower_u, F.col("dv")).otherwise(F.col("du")).alias("ddst"),
        ).persist()
        try:
            # The wedge stays a SELF-JOIN here, deliberately: an r17
            # interleaved A/B of the common_neighbors-style in-array
            # emission measured it SLOWER (best 11.1 s vs 9.0 s at
            # sf0.1) — degree-ordered out-degree is bounded by ~sqrt(2m)
            # (~10^3 here), so the per-src emission does d slice-copies
            # of O(d) structs in interpreted HOF evaluation, where the
            # codegen'd hash join streams the same wedge count. The
            # in-array form only wins under a SMALL bound (deg_cap=64 in
            # common_neighbors).
            a1 = o.select("src", F.col("dst").alias("y"), F.col("ddst").alias("dy"))
            a2 = o.select("src", F.col("dst").alias("z"), F.col("ddst").alias("dz"))
            # each wedge once: its two out-neighbors ordered by (deg, id)
            wedges = a1.join(a2, "src").filter(
                (F.col("dy") < F.col("dz"))
                | ((F.col("dy") == F.col("dz")) & (F.col("y") < F.col("z")))
            )
            n_tri = wedges.join(
                o.select(F.col("src").alias("y"), F.col("dst").alias("z")),
                ["y", "z"],
            ).count()
            n_edges = e.count()
            n_wedges = int(
                deg.agg(F.sum(F.expr("d * (d - 1) div 2"))).collect()[0][0]
            )
        finally:
            o.unpersist()
    finally:
        e.unpersist()
    return spark.createDataFrame(
        [
            (
                n_edges,
                n_wedges,
                n_tri,
                3 * n_tri * 1_000_000 // n_wedges,
            )
        ],
        "n_edges BIGINT, n_wedges BIGINT, n_triangles BIGINT, "
        "clustering_ppm BIGINT",
    )


# ---------------------------------------------------------------------------
# Link prediction: common-neighbor scores over the co-purchase graph
# ---------------------------------------------------------------------------

_CN_DEG_CAP = 64  # middles above this degree carry no signal (hub guard)
_CN_TOPK = 50


@register(
    "graph_common_neighbors",
    oracle=f"""
        -- Common-neighbor link prediction, hub-capped: a candidate pair
        -- (y, z) scores one point per shared neighbor m with deg(m) <=
        -- {_CN_DEG_CAP}; already-adjacent pairs are excluded. The cap is part
        -- of the query semantics (hubs connect everyone and predict
        -- nothing) and is exactly what bounds the wedge join at scale.
        WITH e AS (
          SELECT a.l_partkey AS u, b.l_partkey AS v
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2
        ),
        deg AS (
          SELECT x, count(*) AS d FROM (
            SELECT u AS x FROM e UNION ALL SELECT v FROM e) GROUP BY 1
        ),
        adj AS (
          SELECT u AS m, v AS n FROM e
          UNION ALL
          SELECT v AS m, u AS n FROM e
        ),
        small_adj AS (
          SELECT adj.m, adj.n FROM adj JOIN deg ON deg.x = adj.m
          WHERE deg.d <= {_CN_DEG_CAP}
        ),
        cand AS (
          SELECT a1.n AS y, a2.n AS z, count(*) AS common_mid
          FROM small_adj a1 JOIN small_adj a2
            ON a1.m = a2.m AND a1.n < a2.n
          GROUP BY 1, 2
        )
        SELECT y, z, CAST(common_mid AS BIGINT) AS common_mid
        FROM cand
        WHERE NOT EXISTS (
          SELECT 1 FROM e WHERE e.u = cand.y AND e.v = cand.z)
        ORDER BY common_mid DESC, y, z
        LIMIT {_CN_TOPK}
    """,
    description="link prediction over the co-purchase graph: top-50 "
    f"non-adjacent part pairs by common-neighbor count through middles "
    f"with degree <= {_CN_DEG_CAP} (the hub cap that bounds the wedge "
    "self-join), existing edges removed by anti-join",
    tags=("graph", "join"),
    bench=True,
)
def common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale notes: the wedge self-join is the quadratic risk — capping
    middle degree at 64 bounds each middle's contribution at C(cap,2)
    pairs, so total candidates are O(nodes * cap^2) instead of
    sum(deg^2) (148M wedges uncapped vs 252k capped at sf0.1). The
    degree table is node-sized and broadcast; the candidate->edge
    anti-join shuffles only the capped candidate set. Top-k is
    TakeOrderedAndProject with a unique (score desc, y, z) tiebreak —
    no global sort materializes. Hub middles are pruned BEFORE the
    self-join, at the scan side of the adjacency build.

    The result is pinned eagerly (per the session's pin policy —
    localCheckpoint by default) so the persisted edge list can be
    released without the top-k ever round-tripping the driver."""
    e = _copurchase_edge_list(spark, sf_dir).persist()
    try:
        return pin(common_neighbors_plan(e))
    finally:
        e.unpersist()


def _copurchase_edge_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    # same r16 array-pair build as the PageRank edges (see
    # pagerank_copurchase_plan): one narrow shuffle + in-array pair
    # emission replaces the fact self-join; u < v emitted directly from
    # the per-order distinct-part array
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    per_order = (
        li.repartition("l_orderkey")
        .groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("ps"))
        .filter(F.size("ps") >= 2)
    )
    return (
        per_order.select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, x -> transform("
                    "filter(ps, y -> y > x), "
                    "y -> struct(x AS u, y AS v))))"
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .distinct()
    )


def common_neighbors_plan(
    e: DataFrame, deg_cap: int = _CN_DEG_CAP, topk: int = _CN_TOPK
) -> DataFrame:
    """Top-k common-neighbor candidates from an undirected (u < v) edge
    list — the pre-collect plan, shared by the catalog query and the
    plan-shape/semantic tests.

    r17 wedge build (guide §2.4/§3.3 — the same in-array pair emission
    as the co-purchase edge build): the hub-capped middles' neighbor
    sets are gathered into per-middle ARRAYS (bounded at ``deg_cap``
    elements by the pre-aggregation degree filter, so the agg buffer
    can never hold a hub) and the (y, z) wedge endpoints are emitted
    in-array via ``transform`` — replacing the r16 wedge SELF-JOIN that
    shuffled the capped adjacency twice more and sorted both sides.
    The degree filter must stay BEFORE the collect (not a ``size(ns)``
    filter after it): collecting an uncapped hub's neighbor list is
    exactly the per-key memory blow-up the cap exists to prevent."""
    adj = e.select(F.col("u").alias("m"), F.col("v").alias("n")).unionByName(
        e.select(F.col("v").alias("m"), F.col("u").alias("n"))
    )
    # deg(m) = adj-row count of m (e is distinct (u, v) pairs, so each
    # neighbor appears exactly once) — identical to the r16 union-count.
    deg = adj.groupBy(F.col("m").alias("x")).agg(
        F.count(F.lit(1)).alias("d")
    )
    small = adj.join(
        F.broadcast(deg.filter(F.col("d") <= deg_cap)),
        adj.m == F.col("x"),
    ).select("m", "n")
    nbrs = small.groupBy("m").agg(F.collect_set("n").alias("ns"))
    cand = (
        nbrs.select(
            F.explode(
                F.expr(
                    "flatten(transform(ns, x -> transform("
                    "filter(ns, y -> y > x), "
                    "y -> struct(x AS ya, y AS za))))"
                )
            ).alias("p")
        )
        .groupBy(F.col("p.ya").alias("y"), F.col("p.za").alias("z"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("common_mid"))
    )
    return (
        cand.join(
            e.select(F.col("u").alias("y"), F.col("v").alias("z")),
            ["y", "z"],
            "left_anti",
        )
        .orderBy(F.col("common_mid").desc(), "y", "z")
        .limit(topk)
    )


@register(
    "graph_bfs_recursive_sql",
    oracle=f"""
        -- Identical recursive-CTE text to the Spark side: UNION ALL with
        -- a per-level DISTINCT keeps each working table at most
        -- node-sized (a node may reappear at several hops; min(hop)
        -- recovers the BFS distance), so the recursion is bounded by
        -- nodes x hops with no path enumeration.
        WITH RECURSIVE edges AS (
          SELECT a.l_partkey AS src, b.l_partkey AS dst
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey
           AND a.l_partkey <> b.l_partkey
          GROUP BY 1, 2
        ),
        seed AS (SELECT min(l_partkey) AS s FROM lineitem),
        walk(node, hop) AS (
          SELECT s, 0 FROM seed
          UNION ALL
          SELECT DISTINCT e.dst, w.hop + 1
          FROM walk w JOIN edges e ON e.src = w.node
          WHERE w.hop < {_BFS_MAX_HOPS}
        )
        SELECT node AS part, CAST(min(hop) AS BIGINT) AS hops
        FROM walk GROUP BY node
    """,
    description="the same BFS computed BY Spark's recursive CTE engine "
    "(WITH RECURSIVE, new in Spark 4): UNION ALL recursion with a "
    "per-level DISTINCT frontier, min(hop) per node — the DuckDB twin "
    "runs the identical SQL, and graph_bfs_copurchase_hops' DataFrame "
    "loop triangulates both, so the three traversals (DataFrame loop, "
    "Spark recursion, DuckDB recursion) must agree row-for-row",
    tags=("graph", "iterative", "sql"),
)
def bfs_recursive_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale notes: each recursive step's working table is the DISTINCT
    frontier — node-sized, never path-sized (UNION ALL without the
    DISTINCT would enumerate walks, ~deg^hops). The engine executes the
    step as an ordinary join+distinct per level, so the same
    frontier⋈edges shuffle discipline as the hand-rolled loop applies;
    the hop bound caps the recursion depth well under
    spark.sql.cteRecursionLevelLimit. The DataFrame-loop twin
    (graph_bfs_copurchase_hops) additionally pins the visited-set /
    localCheckpoint discipline the SQL engine hides."""
    load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).createOrReplaceTempView("lineitem_rcte")
    return spark.sql(f"""
        WITH RECURSIVE edges AS (
          SELECT a.l_partkey AS src, b.l_partkey AS dst
          FROM lineitem_rcte a JOIN lineitem_rcte b
            ON a.l_orderkey = b.l_orderkey
           AND a.l_partkey <> b.l_partkey
          GROUP BY 1, 2
        ),
        seed AS (SELECT min(l_partkey) AS s FROM lineitem_rcte),
        walk(node, hop) AS (
          SELECT s, 0 FROM seed
          UNION ALL
          SELECT DISTINCT e.dst, w.hop + 1
          FROM walk w JOIN edges e ON e.src = w.node
          WHERE w.hop < {_BFS_MAX_HOPS}
        )
        SELECT node AS part, CAST(min(hop) AS BIGINT) AS hops
        FROM walk GROUP BY node
    """)
