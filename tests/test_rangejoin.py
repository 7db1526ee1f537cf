"""Bucketized range join (ops/rangejoin.py): containment semantics,
bucket-boundary spanning, end exclusivity, exactly-once pairing."""

from pyspark.sql import functions as F

from counsel_data_pipeline_spark.ops.rangejoin import interval_join


def _mk(spark):
    intervals = spark.createDataFrame(
        [
            (1, "2024-01-01 00:05:00", "2024-01-01 00:25:00"),  # spans 3 buckets @600s
            (2, "2024-01-01 01:00:00", "2024-01-01 01:10:00"),  # aligned exactly
            (3, "2024-01-01 02:00:00", "2024-01-01 02:10:00"),  # empty
        ],
        "iv_id int, s string, e string",
    ).select(
        "iv_id",
        F.col("s").cast("timestamp").alias("w_start"),
        F.col("e").cast("timestamp").alias("w_end"),
    )
    points = spark.createDataFrame(
        [
            (10, "2024-01-01 00:05:00"),  # == start: included
            (11, "2024-01-01 00:19:59"),  # middle bucket
            (12, "2024-01-01 00:25:00"),  # == end: EXCLUDED
            (13, "2024-01-01 01:09:59"),
            (14, "2024-01-01 01:10:00"),  # == end of iv2: excluded
        ],
        "p_id int, t string",
    ).select("p_id", F.col("t").cast("timestamp").alias("pts"))
    return points, intervals


def test_containment_and_exclusive_end(spark):
    points, intervals = _mk(spark)
    got = interval_join(points, intervals, "pts", "w_start", "w_end", 600).select(
        "iv_id", "p_id"
    )
    assert sorted(map(tuple, got.collect())) == [(1, 10), (1, 11), (2, 13)]


def test_left_join_keeps_empty_intervals_for_counts(spark):
    points, intervals = _mk(spark)
    counts = {
        r.iv_id: r.n
        for r in interval_join(
            points, intervals, "pts", "w_start", "w_end", 600, how="left"
        )
        .groupBy("iv_id")
        .agg(F.count("pts").alias("n"))
        .collect()
    }
    assert counts == {1: 2, 2: 1, 3: 0}


def test_no_duplicate_pairs_across_bucket_widths(spark):
    points, intervals = _mk(spark)
    for width in (60, 600, 3600):
        got = interval_join(points, intervals, "pts", "w_start", "w_end", width).select(
            "iv_id", "p_id"
        )
        rows = list(map(tuple, got.collect()))
        assert len(rows) == len(set(rows)) == 3, f"width={width}: {rows}"
