"""Keyed two-source merge (SURVEY §2.4 A2 + §2.6 O1).

Reference ``mergeYesNo`` (src/index.js:65-86): union yes+no clean rows;
key = `county||org_name||address` via JS template strings (null renders as
the string 'null'!), trimmed. On collision the FIRST row (yes before no,
page order within each) keeps all descriptive fields; the five count
columns take max; teleconsultation ORs; has_quota recomputed from
max(in_4_weeks). Output sorted has_quota desc, stable → first-seen order
as tiebreak (JS stable sort over Map insertion order).

Spark shape: one shuffle on the merge key shared by the window (first-row
pick) and the aggregation; output ordering is explicit (has_quota desc,
first-seen order) because Spark sorts are not stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

COUNT_COLS = ["this_week", "next_week", "next_2_week", "next_3_week", "in_4_weeks"]


def js_template_key(*cols: str) -> Column:
    """`${a}||${b}||…`.trim() — JS templates render null/undefined as 'null'."""
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("null")) for c in cols]
    return F.trim(F.concat_ws("||", *parts))


def keyed_merge(
    primary: DataFrame,
    secondary: DataFrame,
    key: Column,
    max_cols: list[str],
    or_cols: list[str],
    order_col: str,
) -> DataFrame:
    """Generic A2 core: union two sources; per key keep the first row's
    descriptive fields (primary before secondary, ``order_col`` within
    each), take max over ``max_cols`` and logical OR over ``or_cols``.

    One shuffle on the key serves both the first-row window and the
    aggregation (Catalyst reuses the exchange). Returns the merged rows
    plus ``__src`` (source rank of the surviving first row).
    """
    p = primary.withColumn("__src", F.lit(0))
    s = secondary.withColumn("__src", F.lit(1))
    unioned = p.unionByName(s).withColumn("__key", key)
    w = Window.partitionBy("__key").orderBy("__src", order_col)
    base_cols = [c for c in unioned.columns if not c.startswith("__")]
    firsts = (
        unioned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("__key", "__src", *base_cols)
    )
    aggs = unioned.groupBy("__key").agg(
        *[F.max(c).alias(f"__max_{c}") for c in max_cols],
        *[F.max(c).alias(f"__or_{c}") for c in or_cols],  # bool OR == max(boolean)
    )
    merged = firsts.join(aggs, "__key")
    for c in max_cols:
        merged = merged.withColumn(c, F.col(f"__max_{c}"))
    for c in or_cols:
        merged = merged.withColumn(c, F.col(f"__or_{c}"))
    return merged.drop(
        *[f"__max_{c}" for c in max_cols], *[f"__or_{c}" for c in or_cols], "__key"
    )


def merge_yes_no(yes: DataFrame, no: DataFrame, order_col: str = "ingest_order") -> DataFrame:
    """Merge the has-quota and no-quota clean sets (A2 + O1).

    Both inputs must carry ``order_col``. Returns the merged clean rows with
    a ``merge_order`` column encoding the reference's output order
    (has_quota desc, first-seen); callers sort on it when materializing.
    """
    merged = keyed_merge(
        yes,
        no,
        js_template_key("county", "org_name", "address"),
        max_cols=COUNT_COLS,
        or_cols=["teleconsultation"],
        order_col=order_col,
    ).withColumn("has_quota", F.col("in_4_weeks") > 0)
    # Reference output order: has_quota desc (stable) over first-seen order.
    return merged.withColumn(
        "merge_order",
        F.struct(
            (~F.col("has_quota")).cast("int").alias("hq"),
            F.col("__src").alias("src"),
            F.col(order_col).alias("ord"),
        ),
    ).drop("__src")
