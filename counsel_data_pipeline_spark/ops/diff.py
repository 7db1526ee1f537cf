"""Incremental snapshot diff / carry-forward (SURVEY §2.5 J1/J2/J5/J6,
§2.10 T1–T3).

Reference semantics (src/geocode-diff-merge.js:66-95,141-156):

  Split phase (J1 + J5/J6):
    phone_key  = digits-only phone           (:16-18, F21)
    domain_key = host(org_url) || host(map_url), minus 'www.'  (:19-21, F22)
    For each clean row:
      - if phone_key != '' AND prev has ANY row with that phone_key:
          match = first prev row (snapshot order) in that phone bucket
                  with lat AND lng non-null — or NO MATCH if none qualify.
          The domain fallback is NOT consulted in this case ("else if"!).
      - else if domain_key != '' AND prev has ANY row with that domain_key:
          match = first such prev row with non-null coords, else no match.
      - match → carried row {**clean_row, **pickGeo(match)}; else → needGeo.

  Recombine phase (J2/U3, after enrichment of needGeo):
    key3 = phone_key + '|' + domain_key
    per clean row (clean order): first carried row with equal key3, else
    the LAST newly-geocoded row with that key3 (JS Map ctor keeps last
    duplicate), else the row with lat/lng null.

  T6 quirk (kept deliberately): a matched row inherits OLD coordinates
  even if its address changed — carry-forward wins.

Spark shape: two broadcast-or-shuffled left joins against per-key
"first-good-row" aggregates of the snapshot; the anti/semi split falls out
of one join + a null filter instead of two passes over prev. At 100 TB the
snapshot aggregates shrink to one row per key before the join, so the join
build side is bounded by key cardinality, not snapshot size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GEO_COLS = [
    "lat", "lng", "confidence", "formatted", "components", "source", "approx",
    "usedQuery", "note",
]


def normalize_phone(c: Column) -> Column:
    """F21: digits only; null → '' (JS String(s || ''))."""
    return F.regexp_replace(F.coalesce(c, F.lit("")), "[^0-9]", "")


def domain_of(c: Column) -> Column:
    """F22: URL hostname minus leading 'www.'; '' on null/unparseable.

    ``parse_url(..., 'HOST')`` mirrors JS ``new URL(url).hostname`` for
    scheme-ful URLs and yields null (→ '') for garbage, like the JS catch.
    """
    # WHATWG URL (the JS parser) percent-escapes spaces in paths; Spark's
    # parser rejects them outright — pre-escape to match JS leniency, and
    # try_parse_url → NULL reproduces the JS catch{return ''} for the rest.
    escaped = F.regexp_replace(F.coalesce(c, F.lit("")), " ", "%20")
    host = F.try_parse_url(escaped, F.lit("HOST"))
    return F.regexp_replace(F.coalesce(host, F.lit("")), r"^www\.", "")


_GEO_TYPES = {
    "lat": "double", "lng": "double", "confidence": "long", "formatted": "string",
    "components": "map<string,string>", "source": "string", "approx": "string",
    "usedQuery": "string", "note": "string",
}


def ensure_geo_cols(df: DataFrame) -> DataFrame:
    """Normalize the geo enrichment columns: add any that are missing as
    typed nulls and coerce ``components`` (struct when schema-inferred from
    JSON, map in the declared schema) to map<string,string> so frames from
    different sources union/compare cleanly."""
    out = df
    for name, typ in _GEO_TYPES.items():
        if name not in out.columns:
            out = out.withColumn(name, F.lit(None).cast(typ))
        elif name == "components" and not dict(out.dtypes)[name].startswith("map"):
            out = out.withColumn(
                name, F.from_json(F.to_json(F.col(name)), "map<string,string>")
            )
        else:
            out = out.withColumn(name, F.col(name).cast(typ))
    return out


def with_diff_keys(df: DataFrame) -> DataFrame:
    org_url = F.col("org_url") if "org_url" in df.columns else F.lit(None).cast("string")
    map_url = F.col("map_url") if "map_url" in df.columns else F.lit(None).cast("string")
    dom = domain_of(org_url)
    return df.withColumn("__phone_k", normalize_phone(F.col("phone"))).withColumn(
        "__domain_k",
        F.when(dom != "", dom).otherwise(domain_of(map_url)),
    )


def _bucket_stats(prev: DataFrame, key: str, order_col: str) -> DataFrame:
    """Per key: does the bucket exist at all, and the first (snapshot-order)
    row with non-null lat+lng — reference's ``.find(x => x.lat != null &&
    x.lng != null)`` over the bucket."""
    good = F.col("lat").isNotNull() & F.col("lng").isNotNull()
    geo_struct = F.struct(*[F.col(c) for c in GEO_COLS])
    return (
        prev.filter(F.col(key) != "")
        .groupBy(key)
        .agg(
            # min_by skips rows whose ordering expr is null → first
            # coordinate-bearing row in snapshot order, or null if none.
            F.min_by(
                F.when(good, geo_struct), F.when(good, F.col(order_col))
            ).alias("__first_good"),
        )
        .select(key, F.lit(True).alias("__bucket_exists"), F.col("__first_good"))
    )


def snapshot_split(
    clean: DataFrame, prev: DataFrame, prev_order: str = "prev_order"
) -> tuple[DataFrame, DataFrame]:
    """J1/J5/J6 + T1: returns (carried, need_geo).

    ``carried`` = clean columns + inherited GEO_COLS; ``need_geo`` = clean
    columns only. Both retain ``clean``'s ingest_order column if present.
    """
    clean_k = with_diff_keys(clean)
    prev_k = with_diff_keys(ensure_geo_cols(prev))

    phone_stats = _bucket_stats(prev_k, "__phone_k", prev_order)
    dom_stats = _bucket_stats(prev_k, "__domain_k", prev_order)

    j = (
        clean_k.join(
            F.broadcast(phone_stats.withColumnRenamed("__phone_k", "__pk")),
            F.col("__phone_k") == F.col("__pk"),
            "left",
        )
        .withColumnRenamed("__bucket_exists", "__phone_exists")
        .withColumnRenamed("__first_good", "__phone_good")
        .drop("__pk")
        .join(
            F.broadcast(dom_stats.withColumnRenamed("__domain_k", "__dk")),
            F.col("__domain_k") == F.col("__dk"),
            "left",
        )
        .withColumnRenamed("__bucket_exists", "__domain_exists")
        .withColumnRenamed("__first_good", "__domain_good")
        .drop("__dk")
    )
    # Priority: a non-empty phone bucket CLAIMS the row (even when it has no
    # coordinate-bearing entry); only phone-bucket-absent rows may use domain.
    phone_claims = (F.col("__phone_k") != "") & F.col("__phone_exists").isNotNull()
    domain_claims = (
        ~phone_claims
        & (F.col("__domain_k") != "")
        & F.col("__domain_exists").isNotNull()
    )
    match = F.when(phone_claims, F.col("__phone_good")).when(
        domain_claims, F.col("__domain_good")
    )
    j = j.withColumn("__match", match)

    clean_cols = clean.columns
    carried = j.filter(F.col("__match").isNotNull()).select(
        *clean_cols, *[F.col(f"__match.{c}").alias(c) for c in GEO_COLS]
    )
    need_geo = j.filter(F.col("__match").isNull()).select(*clean_cols)
    return carried, need_geo


def recombine(
    clean: DataFrame,
    carried: DataFrame,
    newly: DataFrame,
    clean_order: str = "ingest_order",
    newly_order: str = "ingest_order",
) -> DataFrame:
    """J2/U3: final assembly in clean order.

    carried lookup keeps the FIRST row per key3 (clean-order: carried rows
    preserve it); newly lookup keeps the LAST per key3 (JS Map ctor).

    On a carried hit the reference pushes the ENTIRE carried row —
    including its descriptive fields, not the current clean row's
    (geocode-diff-merge.js:148-149 ``finalRows.push(carried)``), so a
    clean row whose key3 matches a carried row is replaced wholesale. On
    a newly hit only the geo columns come from the lookup
    (``{...r, ...pickGeo(n)}``, :152).
    """
    key3 = lambda df: F.concat(F.col("__phone_k"), F.lit("|"), F.col("__domain_k"))  # noqa: E731

    clean_k = with_diff_keys(clean).withColumn("__k3", key3(None))
    carried_k = with_diff_keys(ensure_geo_cols(carried)).withColumn("__k3", key3(None))
    newly_k = with_diff_keys(ensure_geo_cols(newly)).withColumn("__k3", key3(None))

    clean_cols = clean.columns
    full_struct = F.struct(*[F.col(c) for c in clean_cols + GEO_COLS])
    geo_struct = F.struct(*[F.col(c) for c in GEO_COLS])
    first_carried = (
        carried_k.groupBy("__k3")
        .agg(F.min_by(full_struct, F.col(clean_order)).alias("__g"))
        .select("__k3", F.lit(True).alias("__carried_hit"), "__g")
    )
    last_newly = (
        newly_k.groupBy("__k3")
        .agg(F.max_by(geo_struct, F.col(newly_order)).alias("__g"))
        .select("__k3", F.lit(True).alias("__newly_hit"), "__g")
    )

    out = (
        clean_k.join(
            F.broadcast(first_carried.withColumnRenamed("__g", "__cg")), "__k3", "left"
        )
        .join(F.broadcast(last_newly.withColumnRenamed("__g", "__ng")), "__k3", "left")
    )
    pick_clean = lambda c: (  # noqa: E731
        F.when(F.col("__carried_hit").isNotNull(), F.col(f"__cg.{c}"))
        .otherwise(F.col(c))
    )
    pick_geo = lambda c: (  # noqa: E731
        F.when(F.col("__carried_hit").isNotNull(), F.col(f"__cg.{c}"))
        .when(F.col("__newly_hit").isNotNull(), F.col(f"__ng.{c}"))
        .otherwise(F.lit(None))
    )
    return out.select(
        *[pick_clean(c).alias(c) for c in clean_cols],
        *[pick_geo(c).alias(c) for c in GEO_COLS],
    )
