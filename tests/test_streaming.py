"""Streaming ≡ batch equivalence: the Structured Streaming windowed
aggregations must produce exactly the batch plans' results when run with
Trigger.AvailableNow over the same files (the reference's cron-micro-batch
execution model, SURVEY §2.10 T4)."""

from pyspark.sql import functions as F

from counsel_data_pipeline_spark.catalog import all_queries
from counsel_data_pipeline_spark.streaming import windows as sw

SF = "/root/testdata/sf0.001"


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_stream_tumbling_equals_batch(spark):
    stream = sw.stream_events(spark, SF)
    assert stream.isStreaming
    result = sw.run_available_now(sw.tumbling_hourly(stream))

    batch = all_queries()["events_tumbling_hourly"].fn(spark, SF)
    cols = ["hour_start", "event_type", "n_events", "sum_value"]
    assert _rows(result, cols) == _rows(batch, cols)


def test_stream_session_windows(spark):
    stream = sw.stream_events(spark, SF)
    result = sw.run_available_now(sw.session_windows_30m(stream))
    rows = result.collect()
    assert len(rows) > 0
    # Per-user session event counts must total the per-user event counts.
    from collections import defaultdict

    per_user = defaultdict(int)
    for r in rows:
        per_user[r["user_id"]] += r["session_events"]
    batch = all_queries()["events_sessionize_30m"].fn(spark, SF)
    expected = {r["user_id"]: r["n_events"] for r in batch.collect()}
    assert dict(per_user) == expected


def test_stateful_first_seen_dedup_matches_batch(spark):
    from counsel_data_pipeline_spark.io.sources import load_table
    from counsel_data_pipeline_spark.ops.dedup import first_wins
    from counsel_data_pipeline_spark.streaming import stateful, windows

    sf = "/root/testdata/sf0.001"
    stream = stateful.first_seen_filter(
        windows.stream_events(spark, sf), key_cols=["user_id", "event_type"]
    )
    got = windows.run_available_now(stream, "first_seen", output_mode="append")
    got_rows = {
        (r.user_id, r.event_type): r.event_id for r in got.collect()
    }

    batch = load_table(spark, sf, "events")
    exp = first_wins(batch, ["user_id", "event_type"], ["ts", "event_id"])
    exp_rows = {(r.user_id, r.event_type): r.event_id for r in exp.collect()}

    assert got_rows == exp_rows
    assert len(got_rows) >= 50  # sf0.001: ~15 users × 5 event types


def test_stream_sliding_equals_batch(spark):
    batch = all_queries()["events_sliding_6h_daily"].fn(spark, SF)
    stream = sw.sliding_6h_daily(sw.stream_events(spark, SF))
    got = _rows(sw.run_available_now(stream, "sliding6h"),
                ["win_start", "n_events", "sum_value"])
    exp = _rows(batch, ["win_start", "n_events", "sum_value"])
    assert got == exp and len(got) > 50


def test_stream_static_join_matches_batch(spark):
    """Stream-static dimension enrichment: streamed result ≡ the same plan
    over the batch reader."""
    from counsel_data_pipeline_spark.io.sources import load_table

    user_dim = (
        load_table(spark, SF, "events")
        .select("user_id")
        .distinct()
        .withColumn("tier", F.when(F.col("user_id") % 3 == 0, "gold").otherwise("std"))
    )
    stream = sw.stream_events(spark, SF)
    cols = ["hour_start", "tier", "n_events"]
    got = _rows(
        sw.run_available_now(
            sw.stream_static_enriched_hourly(stream, user_dim), "stream_static"
        ),
        cols,
    )
    batch_events = load_table(spark, SF, "events")
    want = _rows(sw.stream_static_enriched_hourly(batch_events, user_dim), cols)
    assert got == want


def test_stream_dedup_within_watermark_removes_replays(spark, tmp_path):
    """A source that delivered every file twice (at-least-once replay) must
    come out exactly-once after watermark-bounded streaming dedup."""
    from counsel_data_pipeline_spark.io.sources import load_table

    events = load_table(spark, SF, "events")
    dup_dir = str(tmp_path / "dup_events")
    events.write.mode("overwrite").parquet(dup_dir)
    events.write.mode("append").parquet(dup_dir)  # replay: every row twice

    schema = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    stream = spark.readStream.schema(schema).parquet(dup_dir)
    deduped = sw.run_available_now(
        sw.stream_dedup_within_watermark(stream), "dedup_wm", output_mode="append"
    )
    assert deduped.count() == events.count()
    assert deduped.select("event_id").distinct().count() == events.count()


def test_stream_stream_join_matches_batch(spark):
    """Watermarked stream-stream join (purchases x preceding clicks within
    10 min) must equal the identical batch join."""
    from counsel_data_pipeline_spark.io.sources import load_table

    def split(df):
        return (
            df.filter(F.col("event_type") == "click"),
            df.filter(F.col("event_type") == "purchase"),
        )

    s = sw.stream_events(spark, SF)
    got_df = sw.run_available_now(
        sw.stream_stream_click_purchase_join(*split(s)), "ss_join", output_mode="append"
    )
    cols = ["purchase_id", "user_id", "purchase_ts_s", "click_ts_s"]
    got = _rows(got_df, cols)

    b = load_table(spark, SF, "events")
    want = _rows(sw.stream_stream_click_purchase_join(*split(b)), cols)
    assert len(want) > 0
    assert got == want
