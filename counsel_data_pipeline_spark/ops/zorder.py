"""Z-order WRITE path: Morton-sharded parquet + a zone-map-pruning reader.

plans/maintenance.layout_zorder_pruning *measures* how many shards a 2-D
box predicate could skip under a Morton layout; this module *delivers*
that skipping on plain parquet (the OPTIMIZE ZORDER write path without a
table format):

- :func:`write_zordered` writes the table hive-partitioned by a
  DETERMINISTIC Morton shard id (bucket ids are range-scaled against the
  column maxima, interleaved, top bits kept), one task per shard, plus a
  tiny per-shard zone-map manifest (min/max of both layout keys).
- :func:`zone_map_survivors` consults the manifest for a 2-D box
  predicate and returns the shards whose zone intersects the box.
- :func:`read_pruned` turns the survivor list into a MANIFEST-DRIVEN
  read: the scan is handed exactly the surviving ``__shard=N``
  directories (pruned shards are never listed — a ``__shard IN (...)``
  predicate over the full-table read would prune files but still pay
  the full directory listing), file skipping from min/max stats exactly
  like a lakehouse format's data-skipping index.

Everything is exact integer arithmetic (the same bucket/interleave
expressions as the audit query), so the shard assignment — and therefore
the zone maps and the surviving-shard count — is a pure function of the
data that an independent engine reproduces, making the whole write→prune
→read loop oracle-checkable.

At 100 TB: the write is one range-style shuffle on the z-value (the
standard ZORDER rewrite cost); the manifest is shard-count-sized and the
reader's pruning decision never touches data files. A production variant
would split each shard into size-bounded files — the per-shard zone map
and the pruning logic are unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from counsel_data_pipeline_spark.ops.partitioning import morton_interleave8

N_SHARDS = 256  # 16-bit z-value >> 8 — matches the layout audit query


def morton_shard(col_x, col_y, max_x, max_y):
    """Deterministic shard id: range-scale both keys to 8-bit buckets
    against their maxima, Morton-interleave, keep the top 8 bits."""
    bx = F.expr(f"div({col_x} * 256, {max_x} + 1)")
    by = F.expr(f"div({col_y} * 256, {max_y} + 1)")
    return F.shiftright(morton_interleave8(bx, by), 8)


def write_zordered(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    max_x: int,
    max_y: int,
) -> None:
    """Write ``df`` hive-partitioned by the Morton shard of
    (``col_x``, ``col_y``) with a per-shard zone-map manifest beside it.

    ``repartition(__shard)`` routes each shard to one task → one file per
    shard directory; the manifest is computed from the same frame (no
    read-back) because the shard function is deterministic.
    """
    sharded = df.withColumn(
        "__shard", morton_shard(col_x, col_y, max_x, max_y)
    ).persist()
    manifest = sharded.groupBy("__shard").agg(
        F.min(col_x).alias("min_x"),
        F.max(col_x).alias("max_x"),
        F.min(col_y).alias("min_y"),
        F.max(col_y).alias("max_y"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "_zonemap")
    )
    (
        sharded.repartition(F.col("__shard"))
        .write.mode("overwrite")
        .partitionBy("__shard")
        .parquet(os.path.join(path, "data"))
    )
    sharded.unpersist()


def zone_map_survivors(
    spark: SparkSession,
    path: str,
    x_range: tuple[int, int],
    y_range: tuple[int, int],
) -> tuple[list[int], int]:
    """Shards whose zone map intersects the 2-D box, plus the total shard
    count. The manifest is shard-count-sized — collecting it is the same
    bounded-small class as a format's file-stats index lookup."""
    zm = spark.read.parquet(os.path.join(path, "_zonemap"))
    rows = zm.collect()
    (x_lo, x_hi), (y_lo, y_hi) = x_range, y_range
    survivors = sorted(
        int(r["__shard"])
        for r in rows
        if r.min_x <= x_hi and r.max_x >= x_lo
        and r.min_y <= y_hi and r.max_y >= y_lo
    )
    return survivors, len(rows)


def read_pruned(
    spark: SparkSession, path: str, survivors: list[int]
) -> DataFrame:
    """Read only the surviving shard directories, manifest-driven: the
    scan is given EXACTLY the surviving ``__shard=N`` directories (with
    ``basePath`` so ``__shard`` stays a partition column), the same way a
    lakehouse reader turns a file-stats index lookup into a file list.
    Pruned shards are never listed, let alone opened — ``inputFiles()``
    on the result contains only surviving directories, which the catalog
    query asserts."""
    from counsel_data_pipeline_spark.ops.partitioning import read_partition_dirs

    data = os.path.join(path, "data")
    dirs = [os.path.join(data, f"__shard={int(s)}") for s in survivors]
    return read_partition_dirs(spark, data, dirs)
