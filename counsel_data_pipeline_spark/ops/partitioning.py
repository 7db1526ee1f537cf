"""Partitioning helpers shared across operator families."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Ensure compute-heavy per-row work fans out across cores.

    A small parquet file arrives as ONE input partition
    (``maxPartitionBytes`` never splits it), which would serialize heavy
    per-row projections (shingling, hashing, regex scoring) on a single
    task. Repartition up to the cluster's default parallelism only when
    the scan under-partitions — at real scale the input already has
    ≥ parallelism splits and this is a no-op (no shuffle inserted).
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
