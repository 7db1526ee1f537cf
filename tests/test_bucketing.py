"""Bucketed co-located join: the physical plan must contain NO Exchange
(shuffle) when both sides are bucketed on the join key with equal bucket
counts, while the plain-parquet twin shuffles both sides. Results must be
identical either way."""

import pytest
from pyspark.sql import functions as F

from counsel_data_pipeline_spark.io.sources import load_table
from counsel_data_pipeline_spark.ops import bucketing as bk

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    orders = load_table(spark, SF, "orders")
    customer = load_table(spark, SF, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    bk.write_bucketed(orders, "orders_b", "o_custkey", 8, str(base / "orders_b"))
    bk.write_bucketed(customer, "customer_b", "o_custkey", 8, str(base / "customer_b"))
    yield "orders_b", "customer_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")


def _no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    return prev


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    prev = _no_broadcast(spark)
    try:
        joined = bk.bucketed_join(spark, left, right, "o_custkey")
        assert not bk.plan_has_exchange(joined)

        plain = load_table(spark, SF, "orders").join(
            load_table(spark, SF, "customer").withColumnRenamed(
                "c_custkey", "o_custkey"
            ),
            "o_custkey",
        )
        assert bk.plan_has_exchange(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    left, right = bucketed_tables
    bucketed = (
        bk.bucketed_join(spark, left, right, "o_custkey")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("o_orderkey").alias("s"))
    )
    plain = (
        load_table(spark, SF, "orders")
        .join(
            load_table(spark, SF, "customer").withColumnRenamed(
                "c_custkey", "o_custkey"
            ),
            "o_custkey",
        )
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("o_orderkey").alias("s"))
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(map(tuple, plain.collect()))


def test_bucketed_aggregation_no_exchange(spark, bucketed_tables):
    """Bucketing also covers aggregation on the bucket key: groupBy the key
    reuses the scan's partitioning — no shuffle before the agg."""
    left, _ = bucketed_tables
    agg = (
        spark.table(left)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    assert not bk.plan_has_exchange(agg)
