"""Data-quality profiling plans — ops/profile.py surfaced through the
driver contract.

The oracle uses exact distinct counts (test scale); the production default
is HLL (see ops/profile.profile docstring). Profiled columns are limited
to int/string/small-double types whose string rendering is identical in
Spark and DuckDB (timestamps render differently and are excluded from the
oracle-checked set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from counsel_data_pipeline_spark.catalog import register
from counsel_data_pipeline_spark.io.sources import load_table
from counsel_data_pipeline_spark.ops.profile import profile

_COLS = [
    "l_orderkey",
    "l_partkey",
    "l_suppkey",
    "l_linenumber",
    "l_quantity",
    "l_returnflag",
    "l_linestatus",
]


def _col_sql(c: str) -> str:
    return (
        f"SELECT '{c}' AS col_name, n AS n_rows, null_{c} AS n_null, "
        f"round(CAST(null_{c} AS DOUBLE) / n, 6) AS null_frac, "
        f"dist_{c} AS n_distinct, min_{c} AS min_s, max_{c} AS max_s FROM a"
    )


@register(
    "quality_profile_lineitem",
    oracle=f"""
        WITH a AS (
          SELECT count(*) AS n,
                 {", ".join(
                     f"CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_{c}, "
                     f"count(DISTINCT {c}) AS dist_{c}, "
                     f"CAST(min({c}) AS VARCHAR) AS min_{c}, "
                     f"CAST(max({c}) AS VARCHAR) AS max_{c}"
                     for c in _COLS
                 )}
          FROM lineitem
        )
        {" UNION ALL ".join(_col_sql(c) for c in _COLS)}
    """,
    description="single-pass column profile of lineitem: null rate, distincts, extremes per column",
    tags=("quality", "profiling"),
    bench=True,
)
def profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profile(load_table(spark, sf_dir, "lineitem"), _COLS, exact=True)


@register(
    "quality_referential_integrity",
    oracle="""
        -- FK orphan audit across the star schema: one row per relation,
        -- counting child rows whose key has no parent (anti-join shape).
        SELECT 'lineitem.l_orderkey -> orders' AS relation,
               (SELECT count(*) FROM lineitem l
                WHERE NOT EXISTS (SELECT 1 FROM orders o
                                  WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans,
               (SELECT count(*) FROM lineitem) AS n_child_rows
        UNION ALL
        SELECT 'lineitem.l_partkey -> part',
               (SELECT count(*) FROM lineitem l
                WHERE NOT EXISTS (SELECT 1 FROM part p
                                  WHERE p.p_partkey = l.l_partkey)),
               (SELECT count(*) FROM lineitem)
        UNION ALL
        SELECT 'orders.o_custkey -> customer',
               (SELECT count(*) FROM orders o
                WHERE NOT EXISTS (SELECT 1 FROM customer c
                                  WHERE c.c_custkey = o.o_custkey)),
               (SELECT count(*) FROM orders)
        UNION ALL
        SELECT 'customer.c_nationkey -> nation',
               (SELECT count(*) FROM customer c
                WHERE NOT EXISTS (SELECT 1 FROM nation n
                                  WHERE n.n_nationkey = c.c_nationkey)),
               (SELECT count(*) FROM customer)
    """,
    description="FK orphan audit (anti-join counts) across the star schema",
    tags=("quality", "integrity"),
)
def referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    def audit(child: DataFrame, ckey: str, parent: DataFrame, pkey: str, label: str) -> DataFrame:
        orphans = child.join(
            parent.select(F.col(pkey).alias(ckey)), ckey, "left_anti"
        ).agg(F.count(F.lit(1)).alias("n_orphans"))
        total = child.agg(F.count(F.lit(1)).alias("n_child_rows"))
        return (
            orphans.crossJoin(total)
            .select(
                F.lit(label).alias("relation"), "n_orphans", "n_child_rows"
            )
        )

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    checks = [
        audit(li, "l_orderkey", orders, "o_orderkey", "lineitem.l_orderkey -> orders"),
        audit(li, "l_partkey", part, "p_partkey", "lineitem.l_partkey -> part"),
        audit(orders, "o_custkey", customer, "c_custkey", "orders.o_custkey -> customer"),
        audit(customer, "c_nationkey", nation, "n_nationkey", "customer.c_nationkey -> nation"),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


_DOC_COLS = ["doc_id", "lang", "source", "n_chars"]


def _doc_col_sql(c: str) -> str:
    return (
        f"SELECT '{c}' AS col_name, n AS n_rows, null_{c} AS n_null, "
        f"round(CAST(null_{c} AS DOUBLE) / n, 6) AS null_frac, "
        f"dist_{c} AS n_distinct, min_{c} AS min_s, max_{c} AS max_s FROM a"
    )


@register(
    "quality_profile_documents",
    oracle=f"""
        WITH a AS (
          SELECT count(*) AS n,
                 {", ".join(
                     f"CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_{c}, "
                     f"count(DISTINCT {c}) AS dist_{c}, "
                     f"CAST(min({c}) AS VARCHAR) AS min_{c}, "
                     f"CAST(max({c}) AS VARCHAR) AS max_{c}"
                     for c in _DOC_COLS
                 )}
          FROM documents
        )
        {" UNION ALL ".join(_doc_col_sql(c) for c in _DOC_COLS)}
    """,
    description="column profile of the documents table (id/lang/source/n_chars: "
    "null rate, distincts, extremes) — the text-corpus twin of the lineitem profile",
    tags=("quality", "profiling", "llm"),
)
def profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same single-pass exact profile as lineitem's (ops/profile.py); the
    free-text column is excluded from the oracle-checked set (its min/max
    strings are corpus-sized and engine renderings of long strings are not
    worth pinning)."""
    return profile(load_table(spark, sf_dir, "documents"), _DOC_COLS, exact=True)
