"""SparkSession factory.

Single place where execution-relevant configuration lives so every entry
point (driver harness, pytest, bench.py) runs the same engine settings.

Scale design notes (local[32] here, 1000-executor cluster in production):
  - AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
    and empty-relation propagation (the reference's "early-exit on empty
    delta", SURVEY §2.10 T2, falls out of this for the plan side).
  - shuffle.partitions defaults to cores locally; on a real cluster this is
    a starting hint only — AQE re-coalesces by size (64 MB target).
  - Arrow enabled: all pandas_udf / mapInPandas exchange is vectorized.
  - Broadcast threshold left at default 10 MB; dimension tables (region,
    nation, county centroids, geocode cache) are explicitly broadcast() at
    the call sites so plans do not depend on stats being fresh.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(
    app_name: str = "counsel-data-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) the configured SparkSession."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(max(cpus, 8)))
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    )
    return builder.getOrCreate()


def tune_for_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable configs to an externally-provided session.

    The driver harness constructs its own SparkSession and hands it to
    ``__spark_entry__.entry``/``queries()`` callables; static configs
    (driver memory, master) are out of our control there, but SQL configs
    are runtime-settable and materially affect plan quality.
    """
    rc = spark.conf
    rc.set("spark.sql.adaptive.enabled", "true")
    rc.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    rc.set("spark.sql.adaptive.skewJoin.enabled", "true")
    rc.set("spark.sql.session.timeZone", "UTC")
    return spark
