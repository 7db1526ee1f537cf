"""Scale race for the ordered funnel (`events_funnel_view_click_purchase`):
naive per-stage aggregate+join-back (the oracle's formulation, and the
pre-r11 plan — six fact scans) vs the chained conditional-minima windows
(the production plan — one scan, one shuffle), under corpus replication.

Growth model: k corpus copies with shifted user ids (fixed per-user
event counts, more users — the funnel's natural growth axis). Under that
model both forms are linear, so the race measures the CONSTANT the scan
sweep removed: fact passes (6 vs 1) and the per-stage shuffle count. The
results are asserted equal at every scale.

  python tools/funnel_scale_race.py [sf_dir] [k]
  # defaults: /root/testdata/sf0.1, k=10
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from counsel_data_pipeline_spark.catalog import all_queries
from counsel_data_pipeline_spark.io.sources import load_table
from counsel_data_pipeline_spark.session import get_spark


def naive_funnel(ev: DataFrame) -> DataFrame:
    """The pre-r11 plan: one aggregate + join-back per stage."""
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_view_click")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_view_click_purchase")))
    )


def plan_stats(df: DataFrame) -> tuple[int, int]:
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    return (
        len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M))
        + len(re.findall(r"^\(\d+\) Scan ExistingRDD", plan, re.M))
        + len(re.findall(r"^\(\d+\) InMemoryTableScan", plan, re.M)),
        len(re.findall(r"^\(\d+\) Exchange", plan, re.M)),
    )


def run(spark, ev: DataFrame, sf_dir: str, label: str, replicated: bool) -> None:
    n = ev.count()
    windowed_fn = all_queries()["events_funnel_view_click_purchase"].fn

    t0 = time.time()
    [nr] = naive_funnel(ev).collect()
    t_naive = time.time() - t0

    t0 = time.time()
    if replicated:
        # on the replicated frame, run the SHARED production body
        # (plans/events.funnel_plan) — the race measures the shipped
        # plan, never a hand-copied twin that could drift
        from counsel_data_pipeline_spark.plans.events import funnel_plan

        wr_df = funnel_plan(ev)
    else:
        wr_df = windowed_fn(spark, sf_dir)
    [wr] = wr_df.collect()
    t_win = time.time() - t0

    got_n = (nr.n_view, nr.n_view_click, nr.n_view_click_purchase)
    got_w = (wr.n_view, wr.n_view_click, wr.n_view_click_purchase)
    assert got_n == got_w, f"funnel forms diverged: {got_n} vs {got_w}"

    ns, ne = plan_stats(naive_funnel(ev))
    ws, we = plan_stats(wr_df)
    print(
        f"{label}: {n} events, funnel {got_w} — naive {ns} input passes/"
        f"{ne} exchanges ({t_naive:.2f}s); windowed {ws} pass/"
        f"{we} exchanges ({t_win:.2f}s); results equal"
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("funnel-scale-race")
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    n_users = ev.agg(F.max("user_id")).collect()[0][0] + 1

    base = ev.persist()
    run(spark, base, sf_dir, "base corpus", replicated=False)
    big = (
        base.crossJoin(
            base.sparkSession.range(k).select(F.col("id").alias("__copy"))
        )
        .select(
            (F.col("user_id") + F.col("__copy") * n_users).alias("user_id"),
            "event_type",
            "ts",
        )
        .persist()
    )
    run(spark, big, sf_dir, f"{k}x corpus (shifted users)", replicated=True)
    base.unpersist()
    big.unpersist()
    print(
        "# both forms are linear; the windowed form removes the constant "
        "— input passes drop 6x and the per-stage join shuffles halve. "
        "Wall times here are cache-equalized (the input is persisted, so "
        "the naive form's extra passes hit memory, not parquet); at "
        "100 TB the extra passes are disk I/O the cache cannot hide"
    )
    spark.stop()


if __name__ == "__main__":
    main()
