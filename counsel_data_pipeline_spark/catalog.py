"""Query catalog — the single registry behind ``__spark_entry__``.

Every operator/query the engine claims as implemented registers here with
  - a Spark plan builder  ``fn(spark, sf_dir) -> DataFrame``
  - an equivalent ANSI-SQL oracle string for DuckDB (or None for ops that
    are genuinely not SQL-expressible — the driver then records a weaker
    rows-only check).

Contract notes (driver compares at sf=0.01):
  - Column NAMES must match between Spark result and oracle result; the
    compare sorts columns by name then value-hashes.
  - Row order is irrelevant (order-insensitive hash), but LIMIT/top-k
    queries must select a deterministic SET — always order by a unique
    tiebreaker before LIMIT.
  - Float parity: never hash a raw double aggregate. Aggregate in DECIMAL
    (exact, associative — immune to partition-order reassociation in both
    engines) and cast the final value to DOUBLE, or round through an
    identical integer grid. Helpers in plans/_parity.py.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: SparkQueryFn
    oracle: str | None = None
    description: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


QUERIES: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    description: str = "",
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[SparkQueryFn], SparkQueryFn]:
    """Decorator: register a query plan under ``name``."""

    def deco(fn: SparkQueryFn) -> SparkQueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = Query(name, fn, oracle, description, tuple(tags), bench)
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    # Import for registration side effects.
    from counsel_data_pipeline_spark import plans  # noqa: F401

    return QUERIES
