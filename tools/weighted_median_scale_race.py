"""Scale race for the value-domain weighted median
(`agg_weighted_median_distributed`): naive row-sort formulation vs the
distinct-value decomposition, under corpus replication.

Growth model: replicate the fact table k-fold (weights scale k-fold, the
weighted median is invariant — so equality is assertable). Under that
model:

  - naive: the cumulative-weight window runs over RAW FACT ROWS per
    return flag — one sorting task per flag holds every fact row of the
    flag, growing linearly with k, unbounded at 100 TB;
  - decomposed (`plans.window.weighted_median_plan`, the production
    code): the fact table collapses FIRST to one row per distinct
    (flag, cents) via a map-side-combinable hash aggregate; the window
    then sorts only the VALUE DOMAIN, whose size is INVARIANT as rows
    replicate — the quantity this race prints.

Both are exact (the green CORRECTNESS hash attests the decomposition
against the row-level oracle in DuckDB); this race asserts equality
in-Spark, then prints per-group sort volumes and wall times.

  python tools/weighted_median_scale_race.py [sf_dir] [k]
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
from counsel_data_pipeline_spark.plans.window import weighted_median_plan
from counsel_data_pipeline_spark.session import get_spark


def naive_row_sort(li: DataFrame) -> DataFrame:
    """Row-level formulation: cumulative weight windowed over every fact
    row per flag (ties on x are closed by taking min(x) at the
    threshold, so the answer matches the value-domain form exactly)."""
    t = li.groupBy("l_returnflag").agg(
        F.sum("q").alias("total_weight"), F.count(F.lit(1)).alias("n_rows")
    )
    w = Window.partitionBy("l_returnflag").orderBy("x").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = li.withColumn("cum", F.sum("q").over(w))
    return (
        c.join(F.broadcast(t), "l_returnflag")
        .groupBy("l_returnflag", "n_rows", "total_weight")
        .agg(
            F.min(
                F.when(2 * F.col("cum") >= F.col("total_weight"), F.col("x"))
            )
            .cast("bigint")
            .alias("weighted_median_cents")
        )
        .select(
            "l_returnflag", "n_rows", "total_weight", "weighted_median_cents"
        )
    )


def run(li: DataFrame, label: str) -> None:
    naive_vol = (
        li.groupBy("l_returnflag").count().agg(F.max("count")).collect()
    )[0][0]
    decomp_vol = (
        li.select("l_returnflag", "x")
        .distinct()
        .groupBy("l_returnflag")
        .count()
        .agg(F.max("count"))
        .collect()
    )[0][0]

    t0 = time.time()
    naive = {
        r["l_returnflag"]: (r["total_weight"], r["weighted_median_cents"])
        for r in naive_row_sort(li).collect()
    }
    t_naive = time.time() - t0

    t0 = time.time()
    decomp = {
        r["l_returnflag"]: (r["total_weight"], r["weighted_median_cents"])
        for r in weighted_median_plan(li).collect()
    }
    t_decomp = time.time() - t0

    assert naive == decomp, f"decomposition diverged: {naive} vs {decomp}"
    print(
        f"{label}: per-group sort volume naive={naive_vol} rows, "
        f"decomposed={decomp_vol} distinct values "
        f"({naive_vol / max(decomp_vol, 1):.1f}x); wall "
        f"naive={t_naive:.2f}s decomposed={t_decomp:.2f}s; results equal"
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("weighted-median-scale-race")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("x"),
        F.round(F.col("l_quantity")).cast("bigint").alias("q"),
    )

    base = li.persist()
    run(base, "base corpus")
    big = base.crossJoin(
        base.sparkSession.range(k).select(F.lit(1).alias("_one"))
    ).drop("_one").persist()
    run(big, f"{k}x replicated corpus")
    base.unpersist()
    big.unpersist()
    print(
        "# naive per-group volume grows with rows; decomposed is pinned "
        "to the value domain (invariant under replication) — the 100 TB "
        "boundary"
    )
    spark.stop()


if __name__ == "__main__":
    main()
