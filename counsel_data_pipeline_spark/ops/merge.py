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


def merge_yes_no(yes: DataFrame, no: DataFrame, order_col: str = "ingest_order") -> DataFrame:
    """Merge the has-quota and no-quota clean sets (A2 + O1).

    Both inputs must carry ``order_col``. Returns the merged clean rows with
    a ``merge_order`` column encoding the reference's output order
    (has_quota desc, first-seen); callers sort on it when materializing.
    """
    yes_t = yes.withColumn("__src", F.lit(0))
    no_t = no.withColumn("__src", F.lit(1))
    unioned = yes_t.unionByName(no_t).withColumn(
        "__key", js_template_key("county", "org_name", "address")
    )
    w = Window.partitionBy("__key").orderBy("__src", order_col)

    base_cols = [c for c in unioned.columns if not c.startswith("__")]
    firsts = (
        unioned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("__key", "__src", order_col, *[c for c in base_cols if c != order_col])
    )
    aggs = unioned.groupBy("__key").agg(
        *[F.max(c).alias(f"__max_{c}") for c in COUNT_COLS],
        F.max("teleconsultation").alias("__tele_or"),  # bool OR == max(boolean)
    )
    merged = firsts.join(aggs, "__key")
    for c in COUNT_COLS:
        merged = merged.withColumn(c, F.col(f"__max_{c}"))
    merged = (
        merged.withColumn("teleconsultation", F.col("__tele_or"))
        .withColumn("has_quota", F.col("in_4_weeks") > 0)
        .drop(*[f"__max_{c}" for c in COUNT_COLS], "__tele_or", "__key")
    )
    # Reference output order: has_quota desc (stable) over first-seen order.
    return merged.withColumn(
        "merge_order",
        F.struct(
            (~F.col("has_quota")).cast("int").alias("hq"),
            F.col("__src").alias("src"),
            F.col(order_col).alias("ord"),
        ),
    ).drop("__src")
