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
                     f"sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS null_{c}, "
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
)
def profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profile(load_table(spark, sf_dir, "lineitem"), _COLS, exact=True)
