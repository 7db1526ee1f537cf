"""Set operations and semi/anti joins.

Reference parity: U1–U4 unions and the implicit semi/anti joins of the
snapshot diff (SURVEY §2.5 J5/J6, §2.7). Expressed as keyed semi/anti joins
— at 100 TB these hash on the join key only (no payload shuffle), and
Catalyst rewrites INTERSECT/EXCEPT to the same shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from counsel_data_pipeline_spark.catalog import register
from counsel_data_pipeline_spark.io.sources import load_table


def _buyers_in(spark, sf_dir: str, year: int) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(
            (F.col("o_orderdate") >= F.lit(f"{year}-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(f"{year + 1}-01-01 00:00:00").cast("timestamp"))
        )
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )


_SQL_BUYERS = (
    "SELECT DISTINCT o_custkey AS custkey FROM orders "
    "WHERE o_orderdate >= TIMESTAMP '{y}-01-01 00:00:00' "
    "AND o_orderdate < TIMESTAMP '{y1}-01-01 00:00:00'"
)


def _sql_buyers(year: int) -> str:
    return _SQL_BUYERS.format(y=year, y1=year + 1)


@register(
    "setop_repeat_buyers_intersect",
    oracle=f"({_sql_buyers(1996)}) INTERSECT ({_sql_buyers(1999)})",
    description="customers buying in both 1996 and 1999 (INTERSECT → semi join)",
    tags=("setop",),
)
def repeat_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _buyers_in(spark, sf_dir, 1996).intersect(_buyers_in(spark, sf_dir, 1999))


@register(
    "setop_lapsed_buyers_except",
    oracle=f"({_sql_buyers(1996)}) EXCEPT ({_sql_buyers(1999)})",
    description="customers active in 1996 but not 1999 (EXCEPT → anti join)",
    tags=("setop",),
)
def lapsed_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _buyers_in(spark, sf_dir, 1996).exceptAll(
        _buyers_in(spark, sf_dir, 1999)
    ).distinct()


@register(
    "setop_union_priority_buckets",
    oracle="""
        SELECT bucket, count(*) AS n_orders FROM (
          SELECT 'urgent' AS bucket, o_orderkey FROM orders
          WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
          UNION ALL
          SELECT 'big' AS bucket, o_orderkey FROM orders
          WHERE o_totalprice > 300000
        ) GROUP BY bucket
    """,
    description="UNION ALL of two derived sets + bucket counts (U1/U2 parity)",
    tags=("setop", "union"),
)
def union_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ).select(F.lit("urgent").alias("bucket"), "o_orderkey")
    big = orders.filter(F.col("o_totalprice") > 300000).select(
        F.lit("big").alias("bucket"), "o_orderkey"
    )
    return urgent.unionByName(big).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@register(
    "join_anti_customers_without_orders",
    oracle="""
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    description="left-anti join: customers with no orders at all (J5 parity)",
    tags=("join", "anti"),
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    return customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")


@register(
    "join_semi_suppliers_of_big_items",
    oracle="""
        SELECT s_suppkey, s_name FROM supplier
        WHERE EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_suppkey = s_suppkey AND l_quantity >= 49
        )
    """,
    description="left-semi join: suppliers having any near-max-quantity lineitem (J6 parity)",
    tags=("join", "semi"),
)
def suppliers_big_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    big = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49).select(
        "l_suppkey"
    )
    return supplier.join(big, supplier.s_suppkey == big.l_suppkey, "left_semi")


@register(
    "join_outer_nation_customer_counts",
    oracle="""
        SELECT n_name, count(c_custkey) AS n_customers
        FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    description="left-outer dim join preserving empty nations, count ignores nulls",
    tags=("join", "outer"),
)
def nation_customer_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    return (
        nation.join(customer, customer.c_nationkey == nation.n_nationkey, "left")
        .groupBy("n_name")
        .agg(F.count("c_custkey").alias("n_customers"))
    )
