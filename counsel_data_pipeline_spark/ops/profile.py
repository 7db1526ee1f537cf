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
    total = F.count(F.lit(1))
    aggs = [total.alias("__n")]
    for c in cols:
        col = F.col(c)
        distinct = (
            F.countDistinct(col) if exact else F.approx_count_distinct(col, 0.02)
        )
        aggs += [
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"__null_{c}"),
            distinct.alias(f"__dist_{c}"),
            F.min(col).cast("string").alias(f"__min_{c}"),
            F.max(col).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    per_col = F.array(
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
    return wide.select(F.explode(per_col).alias("p")).select("p.*")
