"""Streaming ≡ batch equivalence: the Structured Streaming windowed
aggregations must produce exactly the batch plans' results when run with
Trigger.AvailableNow over the same files (the reference's cron-micro-batch
execution model, SURVEY §2.10 T4)."""

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
