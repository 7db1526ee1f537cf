"""AQE skew-join engagement: the session config (session.py) and the
salting ops (ops/skew.py) both lean on Spark's runtime skew mitigation
as the first line of defense — this pins that the optimizer actually
SPLITS a skewed partition, rather than the config being a silent no-op.

The data plants a 90%-hot key; thresholds are lowered only so test-sized
data crosses the same trigger a hot key crosses at production scale
(partition bytes > max(threshold, factor * median)). Assertions:
  - the AQE final plan carries the SortMergeJoin(skew=true) marker,
  - the differential run with skewJoin disabled does not,
  - both produce the identical (correct) result.
"""

from __future__ import annotations

from pyspark.sql import functions as F

_OVERRIDES = {
    # force SMJ (broadcast would bypass skew handling entirely)
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # scale the skew trigger down to test-sized partitions
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1MB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "512KB",
}

# key 0 matches 1.8M left rows x 1 right row; the 10% tail keys
# (id % 10 == 9) match iff id < 200000 -> 20000 singletons
_EXPECT_ROWS = 1_800_000 + 20_000


def _skewed_join_agg(spark):
    left = spark.range(2_000_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id")).alias("k"),
        (F.col("id") % 997).alias("v"),
    )
    right = spark.range(200_000).select(
        F.col("id").alias("k"), (F.col("id") % 31).alias("w")
    )
    return (
        left.join(right, "k")
        .groupBy(((F.col("v") + F.col("w")) % 7).alias("g"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
    )


def _run_final_plan(df):
    rows = {(r.g): (r.n, r.sv) for r in df.collect()}
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    return rows, plan


def test_aqe_splits_skewed_join_partition(spark):
    saved = {k: spark.conf.get(k) for k in _OVERRIDES}
    try:
        for k, v in _OVERRIDES.items():
            spark.conf.set(k, v)
        with_skew, plan_on = _run_final_plan(_skewed_join_agg(spark))
        assert "SortMergeJoin(skew=true)" in plan_on, plan_on
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        no_skew, plan_off = _run_final_plan(_skewed_join_agg(spark))
        assert "skew=true" not in plan_off
        # the split is a physical re-plan only: identical results
        assert with_skew == no_skew
        assert sum(n for n, _ in with_skew.values()) == _EXPECT_ROWS
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
