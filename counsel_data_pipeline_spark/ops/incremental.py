"""Incremental aggregate maintenance on the relational surface — the
TPC-H-side twin of the reference's snapshot-diff model (SURVEY §2.10 T1:
only the delta gets processed; history is never recomputed).

A grouped aggregate is maintained as a STATE table of mergeable partials:
count, decimal sums, min/max per group. Appending a new batch means
aggregating ONLY the batch and merging states group-wise — the 100 TB
property: ingest cost is O(delta), not O(history). Decimal sums make the
merge exactly associative (same rule as plans/_parity.py), so the
maintained state is bit-identical to a full recompute — asserted in
tests/test_incremental.py.

Finalization (avg = sum/count etc.) happens only at read time, because
averages are not mergeable but (sum, count) pairs are.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from counsel_data_pipeline_spark.plans._parity import dec, to_double


def partial_state(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Aggregate one batch into mergeable per-group state."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(dec(value_col)).alias("sum_dec"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
    )


def merge_states(a: DataFrame, b: DataFrame, keys: list[str]) -> DataFrame:
    """Group-wise merge of two state tables: counts and decimal sums add,
    min/max fold. Associative and commutative — batches can arrive in any
    order, partials can themselves be merged."""
    return (
        a.unionByName(b)
        .groupBy(*keys)
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("sum_dec").alias("sum_dec"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        )
    )


def finalize(state: DataFrame, scale: int = 6) -> DataFrame:
    """Read-time view over the state: exact totals plus derived average."""
    return state.select(
        *[c for c in state.columns if c not in ("cnt", "sum_dec", "min_v", "max_v")],
        F.col("cnt").alias("n_rows"),
        to_double(F.col("sum_dec"), scale).alias("sum_value"),
        (to_double(F.col("sum_dec"), scale) / F.col("cnt")).alias("avg_value"),
        F.col("min_v").alias("min_value"),
        F.col("max_v").alias("max_value"),
    )
