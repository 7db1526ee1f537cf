"""Bucketed-table co-located joins — the shuffle-elimination pattern for
repeated big-table⋈big-table joins at 100 TB.

Writing both sides bucketed (and sorted) on the join key with the SAME
bucket count makes every subsequent equi-join on that key a zero-exchange
sort-merge join: each task reads bucket i of both tables, no shuffle, no
sort. At 100 TB the one-time bucketed write amortizes across every
downstream join/aggregation on the key (fact⋈fact joins, incremental
merges), which a broadcast can't cover (neither side fits) and AQE can't
avoid (it still shuffles, it only sizes the shuffle better).

tests/test_bucketing.py proves the property from the physical plan: the
bucketed join contains NO Exchange operator while the plain-parquet twin
contains two.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    path: str,
    sorted_by_key: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) parquet table.

    ``n_buckets`` should be sized so one bucket of the LARGER table fits an
    executor's memory at target scale (e.g. 100 TB / 8192 buckets ≈ 12 GB
    of raw input per bucket before column pruning).
    """
    writer = df.write.format("parquet").mode("overwrite").option("path", path)
    writer = writer.bucketBy(n_buckets, key)
    if sorted_by_key:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two tables previously written by ``write_bucketed`` with the
    same bucket count on ``key``. Catalyst sees matching ``HashPartitioning``
    output partitioning on both scans and drops both exchanges (and, if
    sorted, both sorts)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)


def plan_has_exchange(df: DataFrame) -> bool:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange" in plan
