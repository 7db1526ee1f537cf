"""Semantic properties of the round-9 additions that the DuckDB oracle
doesn't express: the TPC-H Q2/Q9/Q11/Q12/Q20/Q21 adaptations' internal
invariants (min-cost rows really are per-part minima, dominance really
means >half the part's volume, blocked suppliers really are unique
latest shippers), watermark late-drop monotonicity (drops only remove
rows; pre-watermark hours match the batch truth), salted-join
losslessness against the plain join, and the bench write-path reset
teardown actually forcing a rebuild with identical values."""

import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def _q(name):
    from counsel_data_pipeline_spark.catalog import all_queries

    return all_queries()[name]


def _rows(name, spark, sf=SF):
    return _q(name).fn(spark, sf).collect()


# ---------------------------------------------------------------------------
# tpch_q2_min_cost_supplier
# ---------------------------------------------------------------------------


def test_q2_rows_are_per_part_minima(spark):
    rows = _rows("tpch_q2_min_cost_supplier", spark, SF01)
    assert 0 < len(rows) <= 100
    # all surviving rows of one part share its (single) minimum cost
    by_part = {}
    for r in rows:
        by_part.setdefault(r.p_partkey, set()).add(r.supply_cost)
    assert all(len(costs) == 1 for costs in by_part.values())
    # ordering contract: acctbal desc with the documented tiebreaks
    keys = [
        (-r.s_acctbal, r.n_name, r.s_name, r.p_partkey, r.s_suppkey)
        for r in rows
    ]
    assert keys == sorted(keys)


def test_q2_costs_match_unrestricted_min(spark):
    # the per-part min over ELIGIBLE suppliers can never be below the
    # unrestricted min line price of that part
    rows = _rows("tpch_q2_min_cost_supplier", spark, SF01)
    li = spark.read.parquet(os.path.join(SF01, "lineitem.parquet"))
    true_min = {
        r.l_partkey: r.mn
        for r in li.groupBy("l_partkey")
        .agg(F.min(F.expr("CAST(round(l_extendedprice*100) AS BIGINT)")).alias("mn"))
        .collect()
    }
    for r in rows:
        assert round(r.supply_cost * 100) >= true_min[r.p_partkey]


# ---------------------------------------------------------------------------
# tpch_q9_product_type_profit
# ---------------------------------------------------------------------------


def test_q9_covers_every_red_nation_year(spark):
    rows = _rows("tpch_q9_product_type_profit", spark, SF01)
    seen = {(r.nation, r.o_year) for r in rows}
    assert len(seen) == len(rows)  # (nation, year) is a key
    # group count equals the distinct (nation, year) pairs of the joined
    # relation computed independently
    li = spark.read.parquet(os.path.join(SF01, "lineitem.parquet"))
    o = spark.read.parquet(os.path.join(SF01, "orders.parquet"))
    s = spark.read.parquet(os.path.join(SF01, "supplier.parquet"))
    n = spark.read.parquet(os.path.join(SF01, "nation.parquet"))
    p = (
        spark.read.parquet(os.path.join(SF01, "part.parquet"))
        .filter(F.col("p_name").like("%red%"))
    )
    expect = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .select("n_name", F.year("o_orderdate").alias("y"))
        .distinct()
        .count()
    )
    assert len(rows) == expect


# ---------------------------------------------------------------------------
# tpch_q11_important_stock
# ---------------------------------------------------------------------------


def test_q11_threshold_is_1_5x_mean(spark):
    rows = _rows("tpch_q11_important_stock", spark, SF01)
    assert rows
    values = [r.part_value for r in rows]
    # recompute the full per-part value set independently
    li = spark.read.parquet(os.path.join(SF01, "lineitem.parquet"))
    s = spark.read.parquet(os.path.join(SF01, "supplier.parquet"))
    n = (
        spark.read.parquet(os.path.join(SF01, "nation.parquet"))
        .filter(F.col("n_name") == "NATION_7")
    )
    all_vals = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(F.expr("CAST(round(l_extendedprice*100) AS BIGINT)")).alias("v"))
        .collect()
    )
    total = sum(r.v for r in all_vals)
    cnt = len(all_vals)
    survivors = {r.l_partkey for r in all_vals if 2 * r.v * cnt > 3 * total}
    assert {r.p_partkey for r in rows} == survivors
    assert min(values) * 100 * cnt * 2 > 3 * total * 0.999  # boundary sanity


# ---------------------------------------------------------------------------
# tpch_q12_ship_latency_priority
# ---------------------------------------------------------------------------


def test_q12_counts_partition_the_joined_lines(spark):
    rows = _rows("tpch_q12_ship_latency_priority", spark, SF01)
    assert {r.latency_bucket for r in rows} <= {"SLOW", "FAST"}
    li = spark.read.parquet(os.path.join(SF01, "lineitem.parquet")).filter(
        (F.col("l_shipdate") >= "1998-01-01") & (F.col("l_shipdate") < "1999-01-01")
    )
    o = spark.read.parquet(os.path.join(SF01, "orders.parquet"))
    joined = li.join(o, li.l_orderkey == o.o_orderkey).count()
    assert sum(r.high_line_count + r.low_line_count for r in rows) == joined


# ---------------------------------------------------------------------------
# tpch_q20_dominant_suppliers
# ---------------------------------------------------------------------------


def test_q20_suppliers_really_dominate_some_part(spark):
    rows = _rows("tpch_q20_dominant_suppliers", spark, SF01)
    assert rows
    li = spark.read.parquet(os.path.join(SF01, "lineitem.parquet")).filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    p = spark.read.parquet(os.path.join(SF01, "part.parquet")).filter(
        F.col("p_name").like("red%")
    )
    sq = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.expr("CAST(round(l_quantity*100) AS BIGINT)")).alias("q"))
        .collect()
    )
    tot = {}
    for r in sq:
        tot[r.l_partkey] = tot.get(r.l_partkey, 0) + r.q
    dominant = {r.l_suppkey for r in sq if 2 * r.q > tot[r.l_partkey]}
    assert {r.s_suppkey for r in rows} == dominant


# ---------------------------------------------------------------------------
# tpch_q21_blocking_supplier
# ---------------------------------------------------------------------------


def test_q21_blocked_orders_have_unique_latest_shipper(spark):
    rows = _rows("tpch_q21_blocking_supplier", spark, SF01)
    assert rows and all(r.numwait >= 1 for r in rows)
    li = spark.read.parquet(os.path.join(SF01, "lineitem.parquet"))
    o = spark.read.parquet(os.path.join(SF01, "orders.parquet")).filter(
        F.col("o_orderstatus") == "F"
    )
    os_ = (
        li.join(o, li.l_orderkey == o.o_orderkey, "left_semi")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("smax"))
        .collect()
    )
    per_order = {}
    for r in os_:
        per_order.setdefault(r.l_orderkey, []).append((r.l_suppkey, r.smax))
    blocked = {}
    for sups in per_order.values():
        if len(sups) < 2:
            continue
        mx = max(t for _, t in sups)
        at_max = [sk for sk, t in sups if t == mx]
        if len(at_max) == 1:
            blocked[at_max[0]] = blocked.get(at_max[0], 0) + 1
    expect = sorted(blocked.items(), key=lambda kv: (-kv[1], kv[0]))
    got = {r.s_suppkey: r.numwait for r in rows}
    # top-100 subset of the independently recomputed blocking counts
    for sk, nw in got.items():
        assert blocked[sk] == nw
    assert len(got) == min(100, len(expect))


# ---------------------------------------------------------------------------
# streaming_watermark_late_drop
# ---------------------------------------------------------------------------


def test_watermark_drops_only_and_matches_clean_prefix(spark):
    from counsel_data_pipeline_spark.plans.streaming_live import (
        _WM_DELAY_HOURS,
        _WM_N_BATCHES,
    )

    rows = _rows("streaming_watermark_late_drop", spark, SF01)
    assert rows
    got = {r.hour_start: r.n_events for r in rows}
    ev = spark.read.parquet(os.path.join(SF01, "events.parquet"))
    batch = {
        r.h: r.n
        for r in ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("h")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # 1) drops only remove rows — no emitted hour exceeds the batch truth
    assert all(got[h] <= batch[h] for h in got)
    # 2) nothing newer than the final watermark is emitted
    import datetime as dt

    mx = ev.agg(F.max("ts")).first()[0]
    final_wm = mx - dt.timedelta(hours=_WM_DELAY_HOURS)
    for h in got:
        end = dt.datetime.strptime(h, "%Y-%m-%d %H:%M:%S") + dt.timedelta(hours=1)
        assert end <= final_wm
    # 3) something was genuinely dropped somewhere (the late classes exist)
    assert sum(got.values()) < sum(
        batch[h]
        for h in batch
        if dt.datetime.strptime(h, "%Y-%m-%d %H:%M:%S") + dt.timedelta(hours=1)
        <= final_wm
    )
    # 4) batches 0 and 1 run at the initial zero watermark, so in the
    # earliest hour the one-batch-late class (event_id%7==1, arriving in
    # batch 1) survives and ONLY the two-batch-late class (%7==0,
    # arriving in batch 2 where the watermark has advanced past hour 0)
    # is missing
    earliest = min(batch)
    n_twolate = ev.filter(
        (
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss")
            == earliest
        )
        & (F.col("event_id") % 7 == 0)
    ).count()
    assert n_twolate > 0
    assert got[earliest] == batch[earliest] - n_twolate


# ---------------------------------------------------------------------------
# join_salted_hot_users
# ---------------------------------------------------------------------------


def test_salted_join_is_lossless(spark):
    rows = _rows("join_salted_hot_users", spark, SF01)
    ev = spark.read.parquet(os.path.join(SF01, "events.parquet"))
    cust = spark.read.parquet(os.path.join(SF01, "customer.parquet"))
    plain = (
        ev.join(cust, ev.user_id == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.expr("CAST(round(value*1000000) AS BIGINT)")).alias("s"),
        )
        .collect()
    )
    expect = {r.c_mktsegment: (r.n_events, r.n_users, r.s) for r in plain}
    got = {r.c_mktsegment: (r.n_events, r.n_users, r.sum_value_mi) for r in rows}
    assert got == expect


# ---------------------------------------------------------------------------
# bench write-path resets
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "name",
    [
        "layout_time_partition_prune",
        "layout_zorder_write_prune",
        "dedup_store_bucketed_ingest",
        "layout_compact_small_files",
    ],
)
def test_bench_write_reset_forces_identical_rebuild(spark, name):
    q = _q(name)
    assert q.reset is not None and "bench-write" in q.tags
    before = sorted(map(tuple, q.fn(spark, SF).collect()))
    q.reset(spark, SF)
    after = sorted(map(tuple, q.fn(spark, SF).collect()))
    assert before == after


# ---------------------------------------------------------------------------
# streaming_stream_stream_join (late-r9)
# ---------------------------------------------------------------------------


def test_stream_stream_join_equals_batch_interval_join(spark):
    """The streamed inner interval join must emit EXACTLY the batch
    join's match set — the eviction-safety argument (ascending batches,
    24h watermark >> 1h range) made executable."""
    from counsel_data_pipeline_spark.io.sources import load_table

    rows = _rows("streaming_stream_stream_join", spark, SF01)
    ev = load_table(spark, SF01, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("cu"),
        F.col("ts").alias("c_ts"),
    )
    batch = (
        p.join(
            c,
            F.expr(
                "user_id = cu AND c_ts >= p_ts - INTERVAL 1 HOUR "
                "AND c_ts <= p_ts"
            ),
        )
        .select(
            "purchase_id",
            "click_id",
            "user_id",
            (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("gap_us"),
        )
        .collect()
    )
    key = lambda r: (r.purchase_id, r.click_id, r.user_id, r.gap_us)
    assert sorted(map(key, rows)) == sorted(map(key, batch))
    assert len(rows) > 0
    # every gap respects the interval predicate
    assert all(0 <= r.gap_us <= 3_600_000_000 for r in rows)


# ---------------------------------------------------------------------------
# incremental_cdc_upsert_apply (late-r9)
# ---------------------------------------------------------------------------


def test_cdc_apply_merge_semantics(spark):
    rows = _rows("incremental_cdc_upsert_apply", spark, SF01)
    by_key = {r.c_custkey: r for r in rows}
    assert len(by_key) == len(rows)  # one row per key — it's a snapshot
    cust = {
        r.c_custkey: r
        for r in spark.read.parquet(os.path.join(SF01, "customer.parquet"))
        .select(
            "c_custkey",
            "c_mktsegment",
            F.expr("CAST(round(c_acctbal*100) AS BIGINT)").alias("cents"),
        )
        .collect()
    }
    for k, src in cust.items():
        if k % 13 == 0:  # delete is the latest op — key must be gone
            assert k not in by_key
            continue
        r = by_key[k]
        if k % 21 == 0:  # double update: seq-3 image wins
            assert r.applied_op == "U" and r.acctbal_cents == src.cents + 9999
        elif k % 7 == 0:  # single update
            assert r.applied_op == "U" and r.acctbal_cents == src.cents + 5000
        elif k % 10 == 0:  # insert of a key absent from the base
            assert r.applied_op == "I" and r.acctbal_cents == src.cents
        else:  # untouched base row passes through unchanged
            assert r.applied_op == "K" and r.acctbal_cents == src.cents
        assert r.c_mktsegment == src.c_mktsegment
    # nothing in the result that isn't in the source universe
    assert set(by_key) <= set(cust)


# ---------------------------------------------------------------------------
# multimodal_feature_topk (late-r9)
# ---------------------------------------------------------------------------


def test_feature_topk_matches_recomputed_dot(spark):
    """The windowed top-3 must agree with a from-scratch numpy recompute
    of the sha256-derived float32 features and probe dot product."""
    import hashlib

    import numpy as np

    rows = _rows("multimodal_feature_topk", spark, SF01)
    assert len(rows) == 9  # 3 media types x top-3
    docs = spark.read.parquet(os.path.join(SF01, "documents.parquet")).select(
        "doc_id", "text"
    ).collect()
    probe = (3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9, 3)
    scored = {}
    for d in docs:
        h = hashlib.sha256(d.text.encode("utf-8")).digest()
        dot = sum(
            round(float(np.float32(round(h[i] / 255.0, 6))) * 1_000_000) * p
            for i, p in enumerate(probe)
        )
        mt = ("image", "audio", "video")[d.doc_id % 3]
        scored.setdefault(mt, []).append((-dot, d.doc_id))
    for mt, lst in scored.items():
        expect = sorted(lst)[:3]
        got = sorted(
            (-r.dot_probe, r.media_id) for r in rows if r.media_type == mt
        )
        assert got == expect, mt
    # rank column is 1..3 per type
    for mt in scored:
        assert sorted(r.rk for r in rows if r.media_type == mt) == [1, 2, 3]


# ---------------------------------------------------------------------------
# streaming_stream_stream_outer_join (late-r9)
# ---------------------------------------------------------------------------


def test_stream_stream_outer_join_null_boundary(spark):
    """Outer rows = unmatched clicks strictly behind the min-policy
    final watermark; matched rows = exactly the inner join's set."""
    from counsel_data_pipeline_spark.io.sources import load_table

    rows = _rows("streaming_stream_stream_outer_join", spark, SF01)
    matched = [r for r in rows if r.purchase_id is not None]
    nulls = [r for r in rows if r.purchase_id is None]
    assert matched and nulls
    inner = _rows("streaming_stream_stream_join", spark, SF01)
    assert sorted((r.click_id, r.purchase_id) for r in matched) == sorted(
        (r.click_id, r.purchase_id) for r in inner
    )
    # null rows carry null gaps; matched gaps respect the interval
    assert all(r.gap_us is None for r in nulls)
    assert all(0 <= r.gap_us <= 3_600_000_000 for r in matched)
    # the watermark gate: every emitted null click is strictly behind
    # min(max click, max purchase) - 24h - 1h; no unmatched click at or
    # beyond the gate is emitted
    ev = load_table(spark, SF01, "events")
    agg = ev.groupBy("event_type").agg(F.max("ts").alias("mx")).collect()
    mx = {r.event_type: r.mx for r in agg}
    wm = min(mx["click"], mx["purchase"])
    import datetime as dt

    # the engine tracks event-time stats in ms — truncate like the
    # oracle does before applying delay + join range
    wm = wm.replace(microsecond=wm.microsecond // 1000 * 1000)
    gate = wm - dt.timedelta(hours=25)  # 24h delay + 1h join range
    clicks = {
        r.event_id: r.ts
        for r in ev.filter(F.col("event_type") == "click")
        .select("event_id", "ts")
        .collect()
    }
    emitted_null = {r.click_id for r in nulls}
    matched_ids = {r.click_id for r in matched}
    for cid, cts in clicks.items():
        if cid in matched_ids:
            continue
        assert (cid in emitted_null) == (cts < gate), (cid, cts, gate)


# ---------------------------------------------------------------------------
# text_udtf_token_chunks (late-r9)
# ---------------------------------------------------------------------------


def test_udtf_chunks_cover_every_token_exactly_once(spark):
    from counsel_data_pipeline_spark.io.sources import load_table

    rows = _rows("text_udtf_token_chunks", spark, SF01)
    docs = {
        r.doc_id: r.text.split(" ")
        for r in load_table(spark, SF01, "documents")
        .filter(F.col("doc_id") % 17 == 0)
        .select("doc_id", "text")
        .collect()
    }
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(docs)
    for did, toks in docs.items():
        chunks = sorted(by_doc[did], key=lambda r: r.chunk_idx)
        # contiguous indices, sizes partition the token list, all full
        # except possibly the last
        assert [c.chunk_idx for c in chunks] == list(range(len(chunks)))
        assert sum(c.n_tokens for c in chunks) == len(toks)
        assert all(c.n_tokens == 16 for c in chunks[:-1])
        # boundary tokens point back into the source token list
        for c in chunks:
            assert c.first_token == toks[c.chunk_idx * 16]
            assert c.last_token == toks[c.chunk_idx * 16 + c.n_tokens - 1]


# ---------------------------------------------------------------------------
# streaming_python_source_agg / range_stream_source (late-r9)
# ---------------------------------------------------------------------------


def test_range_stream_source_slices_partition_the_table(spark):
    """The source's ascending slices must serve every row exactly once,
    and replay (readBetweenOffsets) must reproduce read()'s rows."""
    from counsel_data_pipeline_spark.io.range_stream_source import (
        RangeParquetStreamReader,
    )

    path = os.path.join(SF01, "events.parquet")
    r = RangeParquetStreamReader({"path": path, "batches": "4"})
    served = []
    off = r.initialOffset()
    n_batches = 0
    while True:
        rows, nxt = r.read(off)
        rows = list(rows)
        if not rows and nxt == off:
            break
        n_batches += 1
        served.extend(rows)
        assert list(r.readBetweenOffsets(off, nxt)) == rows  # replay ≡ read
        off = nxt
    assert n_batches == 4
    ids = [t[0] for t in served]
    assert len(ids) == len(set(ids))  # exactly once
    assert ids == sorted(ids)  # ascending key order across batches
    assert len(ids) == spark.read.parquet(path).count()


def test_streaming_python_source_agg_multibatch(spark):
    rows = _rows("streaming_python_source_agg", spark, SF01)
    assert len(rows) == 5  # one row per event_type
    assert sum(r.n_events for r in rows) == 10000


# ---------------------------------------------------------------------------
# graph_bfs_copurchase_hops (late-r9)
# ---------------------------------------------------------------------------


def test_bfs_hops_are_true_shortest_paths(spark):
    """Recompute BFS distances with a driver-side queue over the same
    edge set and compare level-for-level."""
    from collections import deque

    from counsel_data_pipeline_spark.io.sources import load_table

    rows = _rows("graph_bfs_copurchase_hops", spark, SF)
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    pairs = (
        li.withColumnRenamed("l_partkey", "src")
        .join(li.select("l_orderkey", F.col("l_partkey").alias("dst")), "l_orderkey")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .collect()
    )
    adj = {}
    for r in pairs:
        adj.setdefault(r.src, set()).add(r.dst)
    seed = li.agg(F.min("l_partkey")).collect()[0][0]
    dist = {seed: 0}
    q = deque([seed])
    while q:
        u = q.popleft()
        if dist[u] >= 3:
            continue
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    got = {r.part: r.hops for r in rows}
    assert got == dist


# ---------------------------------------------------------------------------
# graph_triangle_count (late-r9)
# ---------------------------------------------------------------------------


def test_triangle_count_matches_naive_recount(spark):
    """Degree-ordered orientation must land on the same count as a
    driver-side brute-force recount (orientation invariance), and the
    clustering ppm must be the exact integer quotient."""
    from counsel_data_pipeline_spark.io.sources import load_table

    row = _rows("graph_triangle_count", spark, SF)[0]
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    pairs = (
        li.withColumnRenamed("l_partkey", "u")
        .join(li.select("l_orderkey", F.col("l_partkey").alias("v")), "l_orderkey")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
        .collect()
    )
    edges = {(r.u, r.v) for r in pairs}
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    tri = sum(
        1
        for (u, v) in edges
        for w in adj[u] & adj[v]
        if v < w  # u < v < w counts each triangle once
    )
    wedges = sum(len(n) * (len(n) - 1) // 2 for n in adj.values())
    assert row.n_edges == len(edges)
    assert row.n_triangles == tri
    assert row.n_wedges == wedges
    assert row.clustering_ppm == 3 * tri * 1_000_000 // wedges
