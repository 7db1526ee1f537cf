"""As-of (point-in-time) join — an operator Spark lacks natively.

``asof_join(left, right, ...)`` attaches to every left row the single
right row with the greatest ``right_ts`` ≤ ``left_ts`` within the same
key (backward as-of; the time-series "last known value" join).

Spark-first shape — NO range/theta join, NO per-key cross join:
tag both sides, union them, and run ONE window per key ordered by
(ts, side-tag): ``last(right_payload, ignorenulls=True)`` over the
unbounded-preceding frame carries the latest right payload forward onto
each left row. Cost = one shuffle on the key + a per-key sort — the same
complexity as any windowed aggregate, linear in (|L|+|R|), immune to the
candidate blow-up a range-join would risk. At 100 TB both sides shuffle
once on the key; skewed keys fall to AQE or ``ops/skew`` salting like any
other keyed op.

Tie semantics: a right row AT the left timestamp matches (≤, the
standard backward as-of). Duplicate right timestamps within a key are
resolved by ``right_order`` (latest wins) so results are deterministic —
callers that need DuckDB ASOF-JOIN parity should pre-dedupe right rows
per (key, ts), since DuckDB leaves that tie unspecified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    right_order: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of left join. Returns every ``left`` row plus
    ``right_cols`` (renamed with ``suffix``) from the matched right row,
    nulls when no right row precedes it."""
    right_cols = right_cols or [
        c for c in right.columns if c not in on and c != right_ts
    ]
    if right_order is not None and right_order not in right_cols:
        right_cols = [*right_cols, right_order]  # ordering col must ride along
    payload_fields = [F.col(right_ts).alias(f"{right_ts}{suffix}")] + [
        F.col(c).alias(f"{c}{suffix}") for c in right_cols
    ]

    carry = _types(left, [*on, left_ts])
    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*payload_fields).alias("__payload"),
        *[F.lit(None).cast(t).alias(f"__l_{c}") for c, t in carry],
    )
    l = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        *[F.col(c).alias(f"__l_{c}") for c, _ in carry],
    )

    order = [F.col("__ts"), F.col("__side")]
    if right_order is not None:
        # within equal (ts, side) the latest right_order wins via last()
        order.append(F.when(F.col("__side") == 0, F.col(f"__payload.{right_order}{suffix}")))
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l.unionByName(r)
        .withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    out_cols = (
        [F.col(c) for c in on]
        + [F.col("__ts").alias(left_ts)]
        + [F.col(f"__l_{c}").alias(c) for c, _ in carry]
        + [
            F.col(f"__match.{f}").alias(f)
            for f in [f"{right_ts}{suffix}"] + [f"{c}{suffix}" for c in right_cols]
        ]
    )
    return matched.select(*out_cols)


def _types(df: DataFrame, exclude: list[str]) -> list[tuple[str, str]]:
    ts_like = set(exclude)
    return [(c, t) for c, t in df.dtypes if c not in ts_like]
