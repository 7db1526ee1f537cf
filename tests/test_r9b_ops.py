"""Semantic tests for the late-r9 additions: VARIANT roundtrip exactness,
gap-fill interpolation on known points, common-neighbor scores on a toy
graph, and dropDuplicatesWithinWatermark emission invariants."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_variant_double_roundtrip_is_exact(spark):
    # to_json prints shortest-repr doubles; parse_json keeps the exact
    # digits; variant_get(... 'double') must return the original bits.
    vals = [0.1, -3.5e10, 1e-7, 123456.789012, -0.0649375]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    out = df.select(
        F.variant_get(
            F.parse_json(F.to_json(F.struct(F.col("v")))), "$.v", "double"
        ).alias("rt"),
        "v",
    ).collect()
    for r in out:
        assert r.rt == r.v


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )


def test_gap_fill_interpolates_known_points(spark, tmp_path):
    from counsel_data_pipeline_spark.catalog import all_queries

    t0 = dt.datetime(2024, 1, 1, 0, 30)
    rows = [
        # user 7: observations at hours 0 and 4 -> 3 interpolated hours
        (1, t0, 7, "view", 0.0, "{}"),
        (2, t0 + dt.timedelta(hours=4), 7, "view", 1.0, "{}"),
        # user 8: two readings in ONE hour -> last by (ts, event_id) wins
        (3, t0 + dt.timedelta(minutes=1), 8, "view", 5.0, "{}"),
        (4, t0 + dt.timedelta(minutes=2), 8, "view", 7.0, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    out = {
        r.user_id: r
        for r in all_queries()["window_gap_fill_interpolate"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    u7 = out[7]
    assert u7.n_grid_hours == 5
    assert u7.n_observed == 2 and u7.n_interpolated == 3
    # filled series: 0, 250000, 500000, 750000, 1000000 micro-units
    assert u7.sum_filled_v6 == 2_500_000
    # position-weighted checksum: sum(fv6 * (off%97 + 1))
    assert u7.checksum_v6 == sum(
        v * (i + 1) for i, v in enumerate([0, 250000, 500000, 750000, 1000000])
    )
    u8 = out[8]
    assert u8.n_grid_hours == 1 and u8.n_observed == 1
    assert u8.sum_filled_v6 == 7_000_000  # last reading of the hour


def test_common_neighbors_toy_graph(spark, tmp_path):
    from counsel_data_pipeline_spark.plans.graph import (
        common_neighbors_plan,
    )

    # edges: 1-2, 2-3, 1-4, 3-4 (a 4-cycle): non-adjacent pairs (1,3)
    # and (2,4) each share TWO middles; adjacent pairs excluded.
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 4), (3, 4)], "u BIGINT, v BIGINT"
    )
    got = {
        (r.y, r.z): r.common_mid
        for r in common_neighbors_plan(e).collect()
    }
    assert got == {(1, 3): 2, (2, 4): 2}
    # hub cap: with deg_cap=1 every middle (all degree 2) is pruned
    assert common_neighbors_plan(e, deg_cap=1).count() == 0


def test_dropdup_within_watermark_class_invariants(spark):
    """Protocol invariants independent of the DuckDB oracle: same-batch
    and next-batch duplicates never re-emit (state provably alive under
    the offset-log watermark lag); far duplicates re-emit for a strict
    subset of keys; untouched classes emit exactly once per key."""
    from counsel_data_pipeline_spark.catalog import all_queries
    from counsel_data_pipeline_spark.io.sources import load_table

    base = (
        load_table(spark, SF, "events")
        .groupBy((F.col("event_id") % 10).alias("cls"))
        .count()
        .collect()
    )
    base_n = {int(r.cls): r["count"] for r in base}
    res = (
        all_queries()["streaming_dropdup_within_watermark"]
        .fn(spark, SF)
        .groupBy("dup_class")
        .agg(F.sum("n_emitted").alias("n"))
        .collect()
    )
    got = {int(r.dup_class): int(r.n) for r in res}
    for cls in (0, 1, 3, 4, 5, 6, 7, 8, 9):
        assert got[cls] == base_n[cls], f"class {cls}"
    # far-dup class: every key emits its first occurrence; a nonempty
    # strict subset re-emits after state eviction
    assert base_n[2] < got[2] <= 2 * base_n[2]


def test_bfs_recursive_sql_matches_dataframe_loop(spark):
    # Three independent traversals must agree: the DataFrame frontier
    # loop, Spark's recursive-CTE engine, and (via the correctness
    # harness) DuckDB's recursive CTE. Pin the first two here.
    from counsel_data_pipeline_spark.catalog import all_queries

    loop = {
        (r.part, r.hops)
        for r in all_queries()["graph_bfs_copurchase_hops"]
        .fn(spark, SF)
        .collect()
    }
    rec = {
        (r.part, r.hops)
        for r in all_queries()["graph_bfs_recursive_sql"]
        .fn(spark, SF)
        .collect()
    }
    assert loop == rec and len(loop) > 0


def test_arrow_profile_percentile_disc_indices(spark, tmp_path):
    # percentile_disc semantics on even and odd group sizes: the value
    # at ceil(p*n)-1 of the sorted lengths, an actual member.
    from counsel_data_pipeline_spark.catalog import all_queries

    rows = [
        # source a / en: n=4 -> p25 idx 0, median idx 1, p75 idx 2
        (1, "w", "en", "a", 10),
        (2, "x", "en", "a", 20),
        (3, "y", "en", "a", 30),
        (4, "z", "en", "a", 40),
        # source b / fr: n=5 -> p25 idx 1, median idx 2, p75 idx 3
        (5, "v", "fr", "b", 1),
        (6, "w", "fr", "b", 2),
        (7, "x", "fr", "b", 3),
        (8, "y", "fr", "b", 4),
        (9, "z", "fr", "b", 5),
    ]
    spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {
        (r.source, r.lang): r
        for r in all_queries()["text_arrow_group_profile"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    a = out[("a", "en")]
    assert (a.n_docs, a.p25_chars, a.median_chars, a.p75_chars) == (4, 10, 20, 30)
    b = out[("b", "fr")]
    assert (b.n_docs, b.p25_chars, b.median_chars, b.p75_chars) == (5, 2, 3, 4)


def test_observe_metrics_equal_direct_aggregate(spark):
    # The accumulator-channel numbers must equal a dedicated aggregation
    # over the same gate (independent code path from the oracle).
    from pyspark.sql import functions as F

    from counsel_data_pipeline_spark.catalog import all_queries
    from counsel_data_pipeline_spark.io.sources import load_table

    got = (
        all_queries()["quality_observe_scan_metrics"].fn(spark, SF).collect()[0]
    )
    li = load_table(spark, SF, "lineitem").filter(F.col("l_returnflag") == "R")
    ref = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("hd"),
        F.sum(F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).alias("sp"),
        F.min("l_quantity").cast("bigint").alias("mn"),
        F.max("l_quantity").cast("bigint").alias("mx"),
    ).collect()[0]
    assert (got.n_rows, got.n_high_discount, got.sum_price_c) == (
        ref.n, ref.hd, ref.sp,
    )
    assert (got.min_qty, got.max_qty) == (ref.mn, ref.mx)


def test_jsonl_sink_two_phase_commit_and_abort(tmp_path):
    # Unit-level walk of the writer's commit protocol, no Spark: staged
    # files are invisible until commit publishes them atomically with a
    # totals manifest; abort leaves the target untouched.
    import json
    import os

    from pyspark.sql import Row

    from counsel_data_pipeline_spark.io.jsonl_sink import JsonlSinkWriter

    target = str(tmp_path / "out")
    os.makedirs(target)
    w = JsonlSinkWriter({"path": target})
    m1 = w.write(iter([Row(event_id=1, user_id=7, value_mi=100)]))
    m2 = w.write(iter([Row(event_id=2, user_id=8, value_mi=250),
                       Row(event_id=3, user_id=7, value_mi=50)]))
    # nothing published yet
    assert not [f for f in os.listdir(target) if f.startswith("part-")]
    w.commit([m1, m2])
    parts = sorted(f for f in os.listdir(target) if f.startswith("part-"))
    assert parts == ["part-00000.jsonl", "part-00001.jsonl"]
    manifest = json.load(open(os.path.join(target, "_SUCCESS")))
    assert manifest == {"n_files": 2, "n_rows": 3, "value_sum_mi": 400}
    # abort path: stage another file, then abort — target unchanged and
    # the WHOLE staging dir is cleared (incl. orphans from task attempts
    # that died mid-write and never produced a commit message)
    m3 = w.write(iter([Row(event_id=4, user_id=9, value_mi=999)]))
    orphan = os.path.join(target, "_staging", "deadtask.jsonl")
    with open(orphan, "w") as fh:
        fh.write('{"event_id": -1}\n')
    w.abort([m3, None])
    assert not os.path.exists(m3.staged_path)
    assert not os.path.exists(orphan)
    assert sorted(f for f in os.listdir(target) if f.startswith("part-")) == parts
    # append job: new parts number AFTER the existing ones and the
    # manifest totals accumulate — nothing previously published moves
    m4 = w.write(iter([Row(event_id=5, user_id=9, value_mi=600)]))
    w.commit([m4])
    parts2 = sorted(f for f in os.listdir(target) if f.startswith("part-"))
    assert parts2 == ["part-00000.jsonl", "part-00001.jsonl", "part-00002.jsonl"]
    manifest = json.load(open(os.path.join(target, "_SUCCESS")))
    assert manifest == {"n_files": 3, "n_rows": 4, "value_sum_mi": 1000}
    # overwrite job: previously published parts and manifest are
    # replaced by exactly this job's output
    w_ow = JsonlSinkWriter({"path": target}, overwrite=True)
    m5 = w_ow.write(iter([Row(event_id=6, user_id=2, value_mi=70)]))
    w_ow.commit([m5])
    assert sorted(f for f in os.listdir(target) if f.startswith("part-")) == [
        "part-00000.jsonl"
    ]
    manifest = json.load(open(os.path.join(target, "_SUCCESS")))
    assert manifest == {"n_files": 1, "n_rows": 1, "value_sum_mi": 70}
    # commit also reaps staging (orphans included)
    assert not os.path.exists(os.path.join(target, "_staging"))
    # crash repair: parts beyond the manifest's n_files are orphans of a
    # commit that died before its manifest write — unpublished by
    # contract, so the next append removes them and its manifest matches
    # the directory again
    with open(os.path.join(target, "part-00001.jsonl"), "w") as fh:
        fh.write('{"event_id": 99, "value_mi": 5}\n')  # orphan
    m6 = w_ow.write(iter([Row(event_id=7, user_id=3, value_mi=30)]))
    JsonlSinkWriter({"path": target}).commit([m6])
    assert sorted(f for f in os.listdir(target) if f.startswith("part-")) == [
        "part-00000.jsonl", "part-00001.jsonl"
    ]
    manifest = json.load(open(os.path.join(target, "_SUCCESS")))
    assert manifest == {"n_files": 2, "n_rows": 2, "value_sum_mi": 100}
    # foreign part-*.jsonl files (non-numeric) neither crash a commit nor
    # get clobbered; numbering starts after the HIGHEST numeric index
    # even when lexicographic order disagrees (6-digit vs 5-digit names)
    foreign = os.path.join(target, "part-merged.jsonl")
    with open(foreign, "w") as fh:
        fh.write('{"event_id": -2}\n')
    os.rename(
        os.path.join(target, "part-00001.jsonl"),
        os.path.join(target, "part-100000.jsonl"),
    )
    m7 = w_ow.write(iter([Row(event_id=8, user_id=4, value_mi=1)]))
    JsonlSinkWriter({"path": target}).commit([m7])
    names = sorted(f for f in os.listdir(target) if f.startswith("part-"))
    assert "part-100001.jsonl" in names and "part-merged.jsonl" in names


def test_sequence_detect_known_patterns(spark, tmp_path):
    import datetime as dt

    from counsel_data_pipeline_spark.catalog import all_queries

    t0 = dt.datetime(2024, 1, 1)

    def ev(i, user, typ, val=10.0):
        return (i, t0 + dt.timedelta(minutes=i), user, typ, val, "{}")

    rows = [
        # user 1: view -> click -> purchase = one clean match
        ev(1, 1, "view"), ev(2, 1, "click"), ev(3, 1, "purchase", 5.0),
        # user 2: error between view and click kills the match
        ev(10, 2, "view"), ev(11, 2, "error"), ev(12, 2, "click"),
        ev(13, 2, "purchase"),
        # user 3: no view before the click — no match
        ev(20, 3, "click"), ev(21, 3, "purchase"),
        # user 4: error between click and purchase kills it
        ev(30, 4, "view"), ev(31, 4, "click"), ev(32, 4, "error"),
        ev(33, 4, "purchase"),
        # user 5: two purchases share the same clean view->click prefix
        ev(40, 5, "view"), ev(41, 5, "click"),
        ev(42, 5, "purchase", 1.0), ev(43, 5, "purchase", 2.0),
    ]
    _write_events(spark, tmp_path, rows)
    out = {
        r.user_id: (r.n_matches, r.matched_value_mi)
        for r in all_queries()["events_sequence_detect"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert out == {1: (1, 5_000_000), 5: (2, 3_000_000)}
