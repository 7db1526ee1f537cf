"""Sketch query plans — ops/sketches.py surfaced through the driver
contract.

Count-min and Bloom use the cross-engine md5 bucket hash, so the ENTIRE
sketch (counters / bitmap words) is reproduced bit-for-bit by DuckDB and
the estimates are fully oracle-checked — including the approximation
error columns. HLL and quantile sketches are engine-internal
(HyperLogLog++ / percentile_approx) and register rows-only; their error
bounds are asserted in tests/test_sketches.py against exact answers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from counsel_data_pipeline_spark.catalog import register
from counsel_data_pipeline_spark.io.sources import load_table
from counsel_data_pipeline_spark.ops import sketches as sk

_CMS_DEPTH, _CMS_WIDTH = 4, 64
_BLOOM_K, _BLOOM_M = 3, 4096


def _bucket_sql(key_sql: str, width: int) -> str:
    """DuckDB twin of ops/sketches.md5_bucket with a `seed` COLUMN in scope."""
    return (
        f"CAST(concat('0x', substr(md5(concat(CAST(seed AS VARCHAR), ':', "
        f"CAST({key_sql} AS VARCHAR))), 1, 8)) AS UBIGINT) % {width}"
    )


def _bucket_sql_const(seed: int, key_sql: str, width: int) -> str:
    """DuckDB twin of ops/sketches.md5_bucket with a LITERAL seed."""
    return (
        f"CAST(concat('0x', substr(md5(concat('{seed}:', "
        f"CAST({key_sql} AS VARCHAR))), 1, 8)) AS UBIGINT) % {width}"
    )


@register(
    "sketch_cms_user_counts",
    oracle=f"""
        WITH seeds AS (SELECT unnest(range({_CMS_DEPTH})) AS seed),
        cms AS (
          SELECT seed, {_bucket_sql('user_id', _CMS_WIDTH)} AS bucket,
                 count(*) AS cnt
          FROM events CROSS JOIN seeds
          GROUP BY 1, 2
        ),
        probes AS (SELECT DISTINCT user_id AS key FROM events),
        est AS (
          SELECT key, min(cnt) AS est_cnt
          FROM (SELECT key, seed, {_bucket_sql('key', _CMS_WIDTH)} AS bucket
                FROM probes CROSS JOIN seeds) p
          JOIN cms USING (seed, bucket)
          GROUP BY key
        ),
        tru AS (SELECT user_id AS key, count(*) AS true_cnt FROM events GROUP BY 1)
        SELECT key, est_cnt, true_cnt, est_cnt - true_cnt AS overestimate
        FROM est JOIN tru USING (key)
    """,
    description=f"count-min sketch ({_CMS_DEPTH}x{_CMS_WIDTH}) frequency estimates per user vs true counts",
    tags=("sketch", "events"),
    bench=True,
)
def cms_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sketch = sk.cms_build(ev, "user_id", _CMS_DEPTH, _CMS_WIDTH)
    probes = ev.select("user_id").distinct()
    est = sk.cms_estimate(sketch, probes, "user_id", _CMS_DEPTH, _CMS_WIDTH)
    true = ev.groupBy(F.col("user_id").alias("key")).agg(
        F.count(F.lit(1)).alias("true_cnt")
    )
    return est.join(true, "key").select(
        "key", "est_cnt", "true_cnt",
        (F.col("est_cnt") - F.col("true_cnt")).alias("overestimate"),
    )


@register(
    "sketch_bloom_custkey_probe",
    oracle=f"""
        WITH seeds AS (SELECT unnest(range({_BLOOM_K})) AS seed),
        pos AS (
          SELECT DISTINCT {_bucket_sql('o_custkey', _BLOOM_M)} AS pos
          FROM orders CROSS JOIN seeds
        ),
        words AS (
          SELECT pos // 32 AS word,
                 bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS bits
          FROM pos GROUP BY 1
        ),
        probe_pos AS (
          SELECT c_custkey AS key, {_bucket_sql('c_custkey', _BLOOM_M)} AS pos
          FROM customer CROSS JOIN seeds
        ),
        hits AS (
          SELECT key,
                 coalesce((bits >> CAST(pos % 32 AS INT)) & 1, 0) = 1 AS bit_set
          FROM probe_pos LEFT JOIN words ON (pos // 32) = word
        ),
        may AS (SELECT key, bool_and(bit_set) AS may_contain FROM hits GROUP BY key),
        members AS (SELECT DISTINCT o_custkey AS key FROM orders)
        SELECT may.key, may_contain,
               members.key IS NOT NULL AS is_member
        FROM may LEFT JOIN members USING (key)
    """,
    description=f"Bloom filter ({_BLOOM_M} bits, k={_BLOOM_K}) over ordering customers, probed by every customer",
    tags=("sketch", "join-prefilter"),
)
def bloom_custkey_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    bloom = sk.bloom_build(orders, "o_custkey", _BLOOM_K, _BLOOM_M)
    probed = sk.bloom_probe(bloom, customer, "c_custkey", _BLOOM_K, _BLOOM_M)
    members = orders.select(F.col("o_custkey").alias("key")).distinct().withColumn(
        "is_member", F.lit(True)
    )
    return probed.join(members, "key", "left").select(
        "key", "may_contain", F.coalesce("is_member", F.lit(False)).alias("is_member")
    )


_HLL_P = 9


@register(
    "sketch_hll_distinct_users",
    # r6: converted from rows-only (approx_count_distinct's HLL++ bias
    # tables are engine-private) to a fully oracle-checked classic HLL on
    # md5-derived hashes — the same md5-register trick that made CMS and
    # Bloom checkable in r2. DuckDB reproduces registers, harmonic sum,
    # and linear-counting correction exactly; see ops/sketches.py.
    oracle=f"""
        WITH hll AS ({sk.hll_md5_oracle_sql("user_id", "event_type", "events", _HLL_P)}),
        tru AS (
          SELECT event_type AS grp, count(DISTINCT user_id) AS true_distinct
          FROM events GROUP BY 1
        )
        SELECT hll.grp AS event_type, est_distinct, true_distinct
        FROM hll JOIN tru USING (grp)
    """,
    description=f"md5-register HLL (m=2^{_HLL_P}) distinct users per event type vs exact — the no-shuffle COUNT(DISTINCT) at scale, sketch AND estimate oracle-checked",
    tags=("sketch", "events"),
)
def hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    regs = sk.hll_md5_registers(ev, ["event_type"], "user_id", _HLL_P)
    est = sk.hll_md5_estimate(regs, ["event_type"], _HLL_P)
    true = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("true_distinct")
    )
    return est.join(true, "event_type").select(
        "event_type", "est_distinct", "true_distinct"
    )


@register(
    "sketch_value_quantiles",
    oracle=None,  # percentile_approx sketch is engine-specific; error bound pytest-checked
    description="approximate p50/p90/p99 of event value per type (single-pass mergeable quantile sketch)",
    tags=("sketch", "events"),
)
def value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = sk.approx_quantiles(ev, ["event_type"], "value", [0.5, 0.9, 0.99])
    return out.select(
        "event_type",
        F.col("approx_quantiles")[0].alias("p50"),
        F.col("approx_quantiles")[1].alias("p90"),
        F.col("approx_quantiles")[2].alias("p99"),
    ).orderBy("event_type")


_SQ_SEED, _SQ_RATE = 41, 10  # 10% deterministic sample


@register(
    "sketch_sampled_quantiles",
    # r6: an oracle-CHECKABLE quantile sketch beside the rows-only KLL
    # twin (sketch_value_quantiles): a deterministic md5 10% row sample
    # (union-mergeable, replay-idempotent — the same hash-filter shape as
    # curation_hash_split) + exact interpolated percentiles over the
    # sample. percentile ≡ quantile_cont is bit-equal cross-engine
    # (agg_order_value_percentiles), and the sample membership is md5,
    # so the whole estimate hash-matches.
    oracle=f"""
        SELECT event_type,
               quantile_cont(value, 0.50) AS p50_est,
               quantile_cont(value, 0.90) AS p90_est,
               quantile_cont(value, 0.99) AS p99_est,
               CAST(count(*) AS BIGINT) AS sample_n
        FROM events
        WHERE {_bucket_sql_const(_SQ_SEED, 'event_id', 100)} < {_SQ_RATE}
        GROUP BY event_type
    """,
    description=f"sampled-quantile sketch: deterministic md5 {_SQ_RATE}% row "
    "sample (mergeable, idempotent under replay) + exact interpolated "
    "p50/p90/p99 per event type — the oracle-checkable alternative to the "
    "engine-internal KLL; the per-group sort runs over the sample, not the "
    "stream",
    tags=("sketch", "events", "sampling"),
)
def sampled_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sample = ev.filter(
        sk.md5_bucket(F.col("event_id"), _SQ_SEED, 100) < _SQ_RATE
    )
    return sample.groupBy("event_type").agg(
        F.expr("percentile(value, 0.50D)").alias("p50_est"),
        F.expr("percentile(value, 0.90D)").alias("p90_est"),
        F.expr("percentile(value, 0.99D)").alias("p99_est"),
        F.count(F.lit(1)).alias("sample_n"),
    )


# Skew-audit sketch: a wider CMS (overestimate ~ N/width must stay small
# against the skew margin, so the width scales with N, not the key count)
# and a threshold relative to the MEAN key frequency — the shape a salting
# decision needs ("which keys run hot?"), robust to uniform-ish data where
# fraction-of-N heavy hitters are degenerate.
_HH_WIDTH, _HH_FACTOR = 8192, 1.2


@register(
    "sketch_cms_heavy_hitters",
    oracle=f"""
        WITH seeds AS (SELECT unnest(range({_CMS_DEPTH})) AS seed),
        cms AS (
          SELECT seed, {_bucket_sql('user_id', _HH_WIDTH)} AS bucket,
                 count(*) AS cnt
          FROM events CROSS JOIN seeds
          GROUP BY 1, 2
        ),
        probes AS (SELECT DISTINCT user_id AS key FROM events),
        n AS (
          SELECT count(*) AS total, (SELECT count(*) FROM probes) AS nk
          FROM events
        ),
        est AS (
          SELECT key, min(cnt) AS est_cnt
          FROM (SELECT key, seed, {_bucket_sql('key', _HH_WIDTH)} AS bucket
                FROM probes CROSS JOIN seeds) p
          JOIN cms USING (seed, bucket)
          GROUP BY key
        ),
        tru AS (SELECT user_id AS key, count(*) AS true_cnt FROM events GROUP BY 1)
        SELECT key, est_cnt, true_cnt,
               true_cnt >= {_HH_FACTOR} * total / nk AS is_true_hot
        FROM est JOIN tru USING (key) CROSS JOIN n
        WHERE est_cnt >= {_HH_FACTOR} * total / nk
    """,
    description=f"sketch-driven skew audit: keys whose {_CMS_DEPTH}x{_HH_WIDTH} "
    f"CMS estimate exceeds {_HH_FACTOR}x the mean key frequency — the hot-key "
    "candidates a salting strategy would split, found without a full per-key "
    "count shuffle; CM never underestimates, so no hot key is missed "
    "(is_true_hot marks the sketch's false positives)",
    tags=("sketch", "events", "skew"),
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sketch = sk.cms_build(ev, "user_id", _CMS_DEPTH, _HH_WIDTH)
    probes = ev.select("user_id").distinct()
    est = sk.cms_estimate(sketch, probes, "user_id", _CMS_DEPTH, _HH_WIDTH)
    true = ev.groupBy(F.col("user_id").alias("key")).agg(
        F.count(F.lit(1)).alias("true_cnt")
    )
    totals = ev.agg(
        F.count(F.lit(1)).alias("total"),
        F.countDistinct("user_id").alias("nk"),
    )
    thresh = F.lit(_HH_FACTOR) * F.col("total") / F.col("nk")
    return (
        est.join(true, "key")
        .crossJoin(F.broadcast(totals))
        .filter(F.col("est_cnt") >= thresh)
        .select(
            "key",
            "est_cnt",
            "true_cnt",
            (F.col("true_cnt") >= thresh).alias("is_true_hot"),
        )
    )
