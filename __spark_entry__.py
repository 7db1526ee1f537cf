"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query as a smoke check; ``queries()`` /
``oracle_sql()`` expose the full catalog from
``counsel_data_pipeline_spark.plans`` (one entry per implemented operator
from SURVEY.md §2 plus the LLM-data-pipeline extensions). The driver
compares each Spark plan against its DuckDB oracle at sf=0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from counsel_data_pipeline_spark.catalog import all_queries
from counsel_data_pipeline_spark.session import tune_for_session


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    tune_for_session(spark)
    q = all_queries()["tpch_q1_pricing_summary"]
    return q.fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator/query from SURVEY.md §2."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, q in all_queries().items():
        def make(fn):
            def run(spark: SparkSession, sf_dir: str) -> DataFrame:
                tune_for_session(spark)
                return fn(spark, sf_dir)
            return run
        out[name] = make(q.fn)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted for non-SQL-expressible ops."""
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
