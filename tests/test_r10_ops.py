"""Semantic properties of the round-10 additions beyond what the DuckDB
oracle hash attests: blocked-levenshtein candidate discipline (planted
near-dups found with exact distances, the 64-doc block cap actually
suppresses template blocks), sweep-line peak concurrency against a
hand-computed interval arrangement crossing the day boundary (the
decomposition's seam), MAD's 0.5 breakdown point on planted
contamination, Benford share accounting, and the OLS moments against
numpy's lstsq."""

import math

import pytest
from pyspark.sql import functions as F

from counsel_data_pipeline_spark.ops import text_dedup as td

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def _q(name):
    from counsel_data_pipeline_spark.catalog import all_queries

    return all_queries()[name]


def _rows(name, spark, sf=SF):
    return _q(name).fn(spark, sf).collect()


# ---------------------------------------------------------------------------
# dedup_levenshtein_blocked
# ---------------------------------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_levenshtein_planted_near_dup_exact_distance(spark):
    # edits must land BEYOND the 12-char block prefix, or the pair is
    # (correctly) never a candidate — first edit sits at char 16
    base = "the quick brown fox jumps over the lazy dog " * 5  # 220 chars
    edited = base.replace("fox", "box", 1).replace("lazy", "hazy", 1)  # 2 subs
    far = "z" * 200  # different block entirely
    out = td.levenshtein_blocked_pairs(
        _docs(spark, [(1, base), (2, edited), (3, far)])
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.id_a, r.id_b) == (1, 2)
    assert r.dist == 2  # two single-char substitutions
    assert r.len_a == r.len_b


def test_levenshtein_relative_cap_is_integer_exact(spark):
    # docs are 113 chars (13-char shared block prefix + 100 body chars);
    # the relative cap admits dist iff dist*5 <= 113, i.e. dist <= 22
    pre = "shared-prefix"  # 13 chars: same block for all three docs
    base = pre + "a" * 100
    keep = pre + "b" * 22 + "a" * 78  # dist 22: 110 <= 113 kept
    drop = pre + "b" * 23 + "a" * 77  # dist 23: 115 >  113 rejected
    out = td.levenshtein_blocked_pairs(
        _docs(spark, [(1, base), (2, keep), (3, drop)]), max_dist=40
    ).collect()
    pairs = {(r.id_a, r.id_b): r.dist for r in out}
    assert pairs[(1, 2)] == 22
    assert (1, 3) not in pairs  # the relative cap, not the absolute one
    assert pairs[(2, 3)] == 1


def test_levenshtein_block_cap_suppresses_template_blocks(spark):
    # 70 docs sharing a 12-char prefix (> max_block=64): no pairs at all
    rows = [(i, f"templateXXXX doc number {i}") for i in range(70)]
    out = td.levenshtein_blocked_pairs(_docs(spark, rows)).collect()
    assert out == []
    # trimmed under the cap, pairs reappear
    out2 = td.levenshtein_blocked_pairs(_docs(spark, rows[:10])).collect()
    assert len(out2) > 0


def test_levenshtein_catalog_query_matches_blocked_op(spark):
    got = {
        (r.id_a, r.id_b): r.dist
        for r in _rows("dedup_levenshtein_blocked", spark, SF01)
    }
    assert len(got) == 25  # calibrated against the DuckDB probe
    assert all(d >= 0 for d in got.values())


# ---------------------------------------------------------------------------
# events_max_concurrent
# ---------------------------------------------------------------------------


def test_sweep_line_hand_computed_cross_midnight(spark, tmp_path):
    # intervals (30 min): 23:40, 23:50, 00:05(+1d), 00:12(+1d) — peak 3
    # reached at 00:05 (23:40 expired at 00:10; 23:50 and 00:05 active,
    # then 00:12 joins while 23:50 is live until 00:20 -> 3 concurrent).
    import datetime as dt

    base = dt.datetime(2026, 3, 1, 23, 40)
    ts = [base, base.replace(minute=50),
          dt.datetime(2026, 3, 2, 0, 5), dt.datetime(2026, 3, 2, 0, 12)]
    df = spark.createDataFrame(
        [(i, t, 7, "click", 1.0, "{}") for i, t in enumerate(ts)],
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path / "events.parquet")
    df.write.parquet(d)
    out = _q("events_max_concurrent").fn(spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert out[0].max_concurrent == 3
    assert out[0].n_sessions == 4


def test_sweep_line_end_exclusive_touching_intervals(spark, tmp_path):
    # second starts exactly when first expires: never concurrent
    import datetime as dt

    t0 = dt.datetime(2026, 3, 1, 10, 0)
    t1 = dt.datetime(2026, 3, 1, 10, 30)
    df = spark.createDataFrame(
        [(0, t0, 1, "view", 0.0, "{}"), (1, t1, 2, "view", 0.0, "{}")],
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    df.write.parquet(str(tmp_path / "events.parquet"))
    out = _q("events_max_concurrent").fn(spark, str(tmp_path)).collect()
    assert out[0].max_concurrent == 1


def test_sweep_line_decomposition_matches_naive_window(spark):
    # the catalog plan (per-day decomposition) vs the naive global
    # running sum, on real sf0.001 events
    from pyspark.sql import Window

    events = spark.read.parquet(f"{SF}/events.parquet")
    pts = events.select(
        "event_type", F.col("ts").alias("t"), F.lit(1).alias("delta")
    ).unionByName(
        events.select(
            "event_type",
            (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("t"),
            F.lit(-1).alias("delta"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("t", "delta").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    naive = (
        pts.withColumn("r", F.sum("delta").over(w))
        .groupBy("event_type")
        .agg(F.max("r").cast("bigint").alias("max_concurrent"))
    )
    got = {
        r.event_type: r.max_concurrent
        for r in _rows("events_max_concurrent", spark)
    }
    want = {r.event_type: r.max_concurrent for r in naive.collect()}
    assert got == want


# ---------------------------------------------------------------------------
# events_mad_robust_outliers
# ---------------------------------------------------------------------------


def test_mad_planted_contamination_breakdown(spark, tmp_path):
    # 17 inliers around 10, 3 wild outliers: median/MAD flags exactly the
    # 3 plants. (mean/std would be dragged: std ~ 436 -> z-fence misses.)
    import datetime as dt

    vals = [10.0 + 0.1 * (i % 5) for i in range(17)] + [500.0, 900.0, -800.0]
    t0 = dt.datetime(2026, 3, 1, 12, 0)
    df = spark.createDataFrame(
        [
            (i, t0, i, "buy", v, "{}")
            for i, v in enumerate(vals)
        ],
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    df.write.parquet(str(tmp_path / "events.parquet"))
    out = _q("events_mad_robust_outliers").fn(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_events == 20
    assert r.n_outliers == 3
    assert r.med_mi == pytest.approx(10.2e6)  # median of the inlier grid


def test_mad_constant_series_zero_mad_no_outliers(spark, tmp_path):
    import datetime as dt

    t0 = dt.datetime(2026, 3, 1, 12, 0)
    df = spark.createDataFrame(
        [(i, t0, i, "x", 5.0, "{}") for i in range(8)],
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    df.write.parquet(str(tmp_path / "events.parquet"))
    out = _q("events_mad_robust_outliers").fn(spark, str(tmp_path)).collect()
    # dev > 3*0 is false for dev == 0: constant series has no outliers
    assert out[0].mad_mi == 0.0 and out[0].n_outliers == 0


# ---------------------------------------------------------------------------
# quality_benford_first_digit
# ---------------------------------------------------------------------------


def test_benford_share_accounting(spark):
    rows = _rows("quality_benford_first_digit", spark, SF01)
    assert {r.digit for r in rows} <= set(range(1, 10))
    total = sum(r.n_orders for r in rows)
    # floor division: ppm sums to <= 1e6 and within 9 ulps of it
    s = sum(r.observed_ppm for r in rows)
    assert 1_000_000 - 9 <= s <= 1_000_000
    for r in rows:
        assert r.expected_ppm == round(math.log10(1 + 1 / r.digit) * 1e6)
        assert r.deviation_ppm == r.observed_ppm - r.expected_ppm
        assert r.observed_ppm == (r.n_orders * 1_000_000) // total


# ---------------------------------------------------------------------------
# agg_linear_trend_per_brand / agg_modern_aggregates
# ---------------------------------------------------------------------------


def test_linear_trend_matches_numpy_lstsq(spark):
    import numpy as np

    part = spark.read.parquet(f"{SF}/part.parquet").collect()
    rows = _rows("agg_linear_trend_per_brand", spark)
    by_brand = {}
    for p in part:
        by_brand.setdefault(p.p_brand, []).append(
            (p.p_size, round(p.p_retailprice * 100))
        )
    for r in rows:
        xs, ys = zip(*by_brand[r.p_brand])
        A = np.vstack([np.array(xs, dtype=float),
                       np.ones(len(xs))]).T
        slope, intercept = np.linalg.lstsq(A, np.array(ys, dtype=float),
                                           rcond=None)[0]
        assert r.slope_cents == pytest.approx(slope, rel=1e-9)
        assert r.intercept_cents == pytest.approx(intercept, rel=1e-9)
        assert r.n_parts == len(xs)


def test_modern_aggregates_arg_extrema_tie_safe(spark):
    orders = spark.read.parquet(f"{SF01}/orders.parquet").collect()
    rows = _rows("agg_modern_aggregates", spark, SF01)
    by_prio = {}
    for o in orders:
        # the tie-break key the query uses: exact price then orderkey
        key = (round(o.o_totalprice * 1e6), o.o_orderkey)
        b = by_prio.setdefault(o.o_orderpriority, {"max": None, "min": None,
                                                   "n": 0, "f": 0})
        b["n"] += 1
        b["f"] += o.o_orderstatus == "F"
        if b["max"] is None or key > b["max"][0]:
            b["max"] = (key, o.o_orderkey)
        if b["min"] is None or key < b["min"][0]:
            b["min"] = (key, o.o_orderkey)
    for r in rows:
        b = by_prio[r.o_orderpriority]
        assert r.top_order == b["max"][1]
        assert r.cheapest_order == b["min"][1]
        assert r.n_orders == b["n"]
        assert r.n_fulfilled == b["f"]
        assert r.prio_code == r.o_orderpriority[0]


# ---------------------------------------------------------------------------
# agg_weighted_median_distributed / layout_csv_roundtrip
# ---------------------------------------------------------------------------


def test_weighted_median_matches_bruteforce(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").collect()
    by_flag = {}
    for r in li:
        x = round(r.l_extendedprice * 100)
        w = round(r.l_quantity)
        by_flag.setdefault(r.l_returnflag, []).append((x, w))
    for row in _rows("agg_weighted_median_distributed", spark):
        pairs = sorted(by_flag[row.l_returnflag])
        total = sum(w for _, w in pairs)
        cum = 0
        med = None
        for x, w in pairs:
            cum += w
            if 2 * cum >= total:
                med = x
                break
        assert row.weighted_median_cents == med
        assert row.total_weight == total
        assert row.n_rows == len(pairs)


def test_csv_roundtrip_preserves_escaping_and_null(spark):
    rows = {r.o_orderpriority: r for r in _rows("layout_csv_roundtrip", spark)}
    assert len(rows) == 5
    for prio, r in rows.items():
        assert r.tricky_label == f'"{prio}", note'  # quotes+comma survived
        assert (r.opt_note is None) == (prio == "1-URGENT")  # null survived
