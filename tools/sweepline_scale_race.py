"""Scale race for the distributed sweep-line (`events_max_concurrent`):
naive single-window global prefix sum vs the per-(type, day) + offset-
cascade decomposition, on a corpus whose TIME SPAN grows.

Growth model: real event growth at fixed density is more days, not a
denser single day — copy i of the corpus is shifted by i * (span + 1)
days, so a k-fold corpus covers k disjoint span-sized stretches. Under
that model:

  - naive (the oracle formulation, run in Spark): one window partition
    per event type — EVERY point of a type funnels through one sorting
    task, so the single-task sort volume grows linearly with k and is
    unbounded at 100 TB;
  - decomposed (`plans.events.sweepline_peak`, the production code):
    the in-day window sorts one (type, day) group per task — the
    single-task volume is pinned at one day of one type's events no
    matter how many days the corpus covers; the cross-day cascade runs
    over the (type, day) GRID (k * days rows, not points).

Both formulations are exact (the green CORRECTNESS hash attests the
decomposition against the naive oracle in DuckDB); this race asserts
result equality in-Spark too, then prints the quantity that kills the
100 TB run — max rows sorted by a single task — plus wall times.

  python tools/sweepline_scale_race.py [sf_dir] [k]
  # defaults: /root/testdata/sf0.01, k=10
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from counsel_data_pipeline_spark.io.sources import load_table
from counsel_data_pipeline_spark.plans.events import sweepline_peak
from counsel_data_pipeline_spark.session import get_spark


def replicate_shifted_days(events: DataFrame, k: int) -> DataFrame:
    """k corpus copies on disjoint day ranges (copy i shifted by
    i * (span + 1) days) — the fixed-density, growing-history model."""
    span_days = (
        events.agg(
            (F.datediff(F.max("ts"), F.min("ts")) + F.lit(1)).alias("d")
        ).collect()[0]["d"]
    )
    copies = events.crossJoin(
        events.sparkSession.range(k).select(F.col("id").alias("copy"))
    )
    return copies.select(
        "event_type",
        F.timestamp_add(
            "DAY", (F.col("copy") * F.lit(span_days)).cast("int"), F.col("ts")
        ).alias("ts"),
    )


def naive_global_sweep(events: DataFrame) -> DataFrame:
    """The oracle formulation run in Spark: one unbounded running-sum
    window per event type — a single sorting task per type."""
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
    return (
        pts.withColumn("rs", F.sum("delta").over(w))
        .groupBy("event_type")
        .agg(F.max("rs").cast("bigint").alias("max_concurrent"))
    )


def single_task_sort_volumes(events: DataFrame) -> tuple[int, int]:
    """(naive, decomposed) max rows a single window-sort task holds:
    2 points per event, grouped per type vs per (type, day)."""
    per_type = (
        events.groupBy("event_type").count().agg(F.max("count")).collect()
    )[0][0]
    per_type_day = (
        events.select("event_type", F.date_trunc("day", "ts").alias("day"))
        .unionByName(
            events.select(
                "event_type",
                F.date_trunc(
                    "day", F.col("ts") + F.expr("INTERVAL 30 MINUTES")
                ).alias("day"),
            )
        )
        .groupBy("event_type", "day")
        .count()
        .agg(F.max("count"))
        .collect()
    )[0][0]
    return 2 * per_type, per_type_day


def run(events: DataFrame, label: str) -> None:
    n = events.count()
    naive_vol, decomp_vol = single_task_sort_volumes(events)

    t0 = time.time()
    naive = {
        r["event_type"]: r["max_concurrent"]
        for r in naive_global_sweep(events).collect()
    }
    t_naive = time.time() - t0

    t0 = time.time()
    decomp = {
        r["event_type"]: r["max_concurrent"]
        for r in sweepline_peak(events)
        .select("event_type", "max_concurrent")
        .collect()
    }
    t_decomp = time.time() - t0

    assert naive == decomp, f"decomposition diverged: {naive} vs {decomp}"
    print(
        f"{label}: {n} events — single-task sort volume "
        f"naive={naive_vol} decomposed={decomp_vol} "
        f"({naive_vol / max(decomp_vol, 1):.0f}x); wall "
        f"naive={t_naive:.2f}s decomposed={t_decomp:.2f}s; results equal"
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("sweepline-scale-race")
    events = load_table(spark, sf_dir, "events").select("event_type", "ts")

    base = events.persist()
    run(base, "base corpus")
    big = replicate_shifted_days(base, k).persist()
    run(big, f"{k}x corpus ({k} disjoint day ranges)")
    base.unpersist()
    big.unpersist()
    print(
        "# naive single-task volume grows with history; decomposed stays "
        "pinned at one (type, day) group — the 100 TB boundary"
    )
    spark.stop()


if __name__ == "__main__":
    main()
