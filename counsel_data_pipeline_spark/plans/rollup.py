"""Multi-dimensional aggregation: ROLLUP / CUBE / GROUPING SETS.

Not present in the reference (SURVEY §2.13) — stock Catalyst capability the
harness exercises. Each expands to a union of grouping sets executed as one
hash aggregate (Expand node) — a single shuffle regardless of set count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from counsel_data_pipeline_spark.catalog import register
from counsel_data_pipeline_spark.io.sources import load_table, register_views
from counsel_data_pipeline_spark.plans._parity import dsum, sql_dsum


@register(
    "rollup_revenue_region_nation",
    oracle=f"""
        SELECT r_name, n_name,
               {sql_dsum('o_totalprice', 'total_spend')},
               count(*) AS n_orders
        FROM orders, customer, nation, region
        WHERE o_custkey = c_custkey
          AND c_nationkey = n_nationkey
          AND n_regionkey = r_regionkey
        GROUP BY ROLLUP(r_name, n_name)
    """,
    description="ROLLUP region→nation order totals (subtotals + grand total)",
    tags=("rollup", "agg"),
)
def rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    dim = customer.join(
        F.broadcast(
            nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        ),
        customer.c_nationkey == F.col("n_nationkey"),
    ).select("c_custkey", "r_name", "n_name")
    return (
        orders.join(dim, orders.o_custkey == dim.c_custkey)
        .rollup("r_name", "n_name")
        .agg(dsum("o_totalprice", "total_spend"), F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "cube_orders_status_priority",
    oracle=f"""
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               {sql_dsum('o_totalprice', 'total_spend')}
        FROM orders
        GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    description="CUBE over order status × priority",
    tags=("rollup", "agg"),
)
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "total_spend")
    )


@register(
    "grouping_sets_lineitem",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               {sql_dsum('l_quantity', 'sum_qty')},
               count(*) AS n_items
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
    """,
    description="explicit GROUPING SETS via SQL surface",
    tags=("rollup", "sql"),
)
def grouping_sets_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(round(sum(CAST(l_quantity AS DECIMAL(30,6))), 2) AS DOUBLE) AS sum_qty,
               count(*) AS n_items
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        """
    )
