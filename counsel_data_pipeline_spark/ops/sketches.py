"""Sketch operators (north-star extension): count-min, Bloom filter,
HLL distinct, approximate quantiles.

Scale design — sketches are the 100 TB answer to "count/filter/summarize
without a full shuffle of the raw keys":
  - Count-min: the sketch is depth×width counters, built in ONE hash
    aggregate whose output size is bounded by the sketch (not the key
    cardinality). Merging partial sketches is elementwise + (associative),
    so map-side combine does most of the work; estimates are point lookups.
  - Bloom: the filter is m bits stored as packed words built by a bit_or
    aggregate (also associative/mergeable). Probing is a broadcast join
    against ≤ m/32 words — used to pre-filter a big fact table before an
    expensive join (definite-miss rows never shuffle).
  - HLL / quantile sketches: Spark's native approx_count_distinct /
    percentile_approx (HyperLogLog++ / KLL-style) — single-pass, mergeable,
    fixed memory; the scalable stand-ins for COUNT(DISTINCT) and exact
    percentiles.

Determinism: count-min and Bloom use an md5-derived bucket hash (not
xxhash64) so DuckDB can reproduce the exact same sketch — both engines
agree bit-for-bit on md5, which makes these two sketches fully
oracle-checkable. HLL/quantiles use engine-internal sketches and are
verified by error-bound tests instead (tests/test_sketches.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Cross-engine deterministic hash: first 8 hex chars of md5("<seed>:<key>")
# parsed as an integer. DuckDB twin:
#   CAST(concat('0x', substr(md5(concat('<seed>:', CAST(k AS VARCHAR))), 1, 8))
#        AS UBIGINT) % width
# ---------------------------------------------------------------------------


def md5_bucket(key: Column, seed: int, width: int) -> Column:
    """Deterministic bucket in [0, width) — identical in Spark and DuckDB."""
    payload = F.concat(F.lit(f"{seed}:"), key.cast("string"))
    h32 = F.conv(F.substring(F.md5(F.encode(payload, "UTF-8")), 1, 8), 16, 10)
    return (h32.cast("bigint") % F.lit(width)).alias("bucket")


def md5_bucket_sql(key_sql: str, seed: int, width: int) -> str:
    """The DuckDB expression computing exactly ``md5_bucket``."""
    return (
        f"CAST(concat('0x', substr(md5(concat('{seed}:', CAST({key_sql} AS VARCHAR))), "
        f"1, 8)) AS UBIGINT) % {width}"
    )


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------


def cms_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 64
) -> DataFrame:
    """Build a count-min sketch over ``key_col`` occurrences.

    Returns (seed, bucket, cnt): depth×width counters. One explode (depth
    rows per input row, computed map-side) + one hash aggregate whose result
    is at most depth·width rows regardless of input size — the shuffle is
    bounded by the sketch, not the data.
    """
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seed"),
                        md5_bucket(F.col(key_col), s, width).alias("bucket"),
                    )
                    for s in range(depth)
                ]
            )
        ).alias("sb")
    )
    return rows.groupBy("sb.seed", "sb.bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(sketch: DataFrame, probes: DataFrame, key_col: str, depth: int, width: int) -> DataFrame:
    """Point-estimate each probe key's frequency: min over the depth rows of
    the counter its hash lands in. Returns (key, est_cnt); est_cnt ≥ true
    count always (count-min never underestimates)."""
    probe_rows = probes.select(
        F.col(key_col).alias("key"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seed"),
                        md5_bucket(F.col(key_col), s, width).alias("bucket"),
                    )
                    for s in range(depth)
                ]
            )
        ).alias("sb"),
    ).select("key", "sb.seed", "sb.bucket")
    return (
        probe_rows.join(F.broadcast(sketch), ["seed", "bucket"])
        .groupBy("key")
        .agg(F.min("cnt").alias("est_cnt"))
    )


# ---------------------------------------------------------------------------
# Bloom filter (32-bit packed words; bits 0..31 only, so every word value is
# a small positive int — no sign-bit divergence between engines)
# ---------------------------------------------------------------------------


def bloom_build(
    df: DataFrame, key_col: str, n_hashes: int = 3, m_bits: int = 4096
) -> DataFrame:
    """Build an m-bit Bloom filter over the distinct values of ``key_col``.

    Returns (word, bits): word = bit_position // 32, bits = bit_or of
    1 << (bit_position % 32). The aggregate output is ≤ m/32 rows — tiny,
    broadcastable — and bit_or is associative, so partial aggregation keeps
    the build a single cheap pass at any scale.
    """
    pos = df.select(
        F.explode(
            F.array(
                *[md5_bucket(F.col(key_col), s, m_bits) for s in range(n_hashes)]
            )
        ).alias("pos")
    )
    return (
        pos.groupBy((F.col("pos") / 32).cast("int").alias("word"))
        .agg(
            # variable-amount shift: the python shiftleft() wrapper only
            # takes a literal count, the SQL function takes an expression
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))")
            ).alias("bits")
        )
    )


def bloom_probe(
    bloom: DataFrame, probes: DataFrame, key_col: str, n_hashes: int = 3, m_bits: int = 4096
) -> DataFrame:
    """Test each probe key against the filter. Returns (key, may_contain).

    may_contain=false is definitive (the pre-filter can safely drop the
    row); true may be a false positive at the filter's designed rate.
    """
    probe_pos = probes.select(
        F.col(key_col).alias("key"),
        F.explode(
            F.array(
                *[md5_bucket(F.col(key_col), s, m_bits) for s in range(n_hashes)]
            )
        ).alias("pos"),
    ).withColumn("word", (F.col("pos") / 32).cast("int"))
    hit = (
        probe_pos.join(F.broadcast(bloom), "word", "left")
        .withColumn(
            "bit_set",
            F.coalesce(
                F.expr("shiftright(bits, CAST(pos % 32 AS INT)) & 1") == 1,
                F.lit(False),
            ),
        )
    )
    return hit.groupBy("key").agg(F.min("bit_set").alias("may_contain"))


# ---------------------------------------------------------------------------
# Engine-native sketches (approximate; verified by error bounds in pytest)
# ---------------------------------------------------------------------------


def hll_distinct(df: DataFrame, group_cols: list[str], value_col: str, rsd: float = 0.02) -> DataFrame:
    """HyperLogLog++ distinct count per group — the single-pass mergeable
    replacement for COUNT(DISTINCT) at scale (no per-key shuffle)."""
    return df.groupBy(*group_cols).agg(
        F.approx_count_distinct(value_col, rsd).alias("approx_distinct")
    )


def approx_quantiles(
    df: DataFrame, group_cols: list[str], value_col: str, probs: list[float], accuracy: int = 10000
) -> DataFrame:
    """Approximate quantiles per group via Spark's percentile_approx
    (Greenwald-Khanna style summary: single pass, bounded memory,
    mergeable partials)."""
    return df.groupBy(*group_cols).agg(
        F.percentile_approx(
            value_col, F.array(*[F.lit(p) for p in probs]), F.lit(accuracy)
        ).alias("approx_quantiles")
    )
