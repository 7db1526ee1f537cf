"""Time-partitioned parquet layout: the 1-D sibling of ops/zorder.py.

The canonical 100 TB ingest layout: facts land hive-partitioned by event
date, so every time-ranged query prunes at the DIRECTORY level before a
single footer is opened. Like the Z-order module, the reader here is
manifest-driven — the write drops a tiny per-date manifest beside the
data, the survivor decision reads only that, and the pruned read hands
the scan exactly the surviving ``event_date=<d>`` directories (with
``basePath``), so pruned days cost nothing at any scale (a predicate
over a path-based read prunes FILES but still lists every partition
directory; at 10^5 partitions the listing is the cost).

Everything is a pure function of the data (ISO date strings sort
chronologically), so the write→prune→read loop is oracle-checkable.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_time_partitioned(
    df: DataFrame, path: str, ts_col: str = "ts"
) -> None:
    """Write ``df`` hive-partitioned by the ISO date of ``ts_col`` with a
    per-date manifest (row counts) beside it. ``repartition(event_date)``
    routes each day to one task → one file per day directory; a
    production variant splits days into size-bounded files, manifest and
    pruning unchanged."""
    dated = df.withColumn(
        "event_date", F.date_format(F.col(ts_col), "yyyy-MM-dd")
    ).persist()
    manifest = dated.groupBy("event_date").agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "_dates")
    )
    (
        dated.repartition(F.col("event_date"))
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(os.path.join(path, "data"))
    )
    dated.unpersist()


def date_survivors(
    spark: SparkSession, path: str, lo: str, hi: str
) -> tuple[list[str], int]:
    """Dates within [lo, hi] per the manifest (ISO strings — lexicographic
    BETWEEN is chronological), plus the total date count. The manifest is
    date-count-sized; collecting it is bounded by the calendar, not the
    data."""
    rows = spark.read.parquet(os.path.join(path, "_dates")).collect()
    dates = sorted(str(r["event_date"]) for r in rows)
    return [d for d in dates if lo <= d <= hi], len(dates)


def read_dates(
    spark: SparkSession, path: str, dates: list[str]
) -> DataFrame:
    """Read only the surviving date directories, manifest-driven (same
    listing-level skipping as ops/zorder.read_pruned)."""
    from counsel_data_pipeline_spark.ops.partitioning import read_partition_dirs

    data = os.path.join(path, "data")
    dirs = [os.path.join(data, f"event_date={d}") for d in dates]
    return read_partition_dirs(spark, data, dirs)
