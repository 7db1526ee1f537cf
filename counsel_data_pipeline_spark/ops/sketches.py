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

from pyspark.sql import Column, DataFrame, Window
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
# Cross-engine HLL: classic Flajolet HyperLogLog on md5-derived 32-bit
# hashes. Unlike approx_count_distinct (HLL++ with engine-private bias
# tables), every step here — register index, leading-zero rank, harmonic
# sum, linear-counting small-range correction — is plain integer/IEEE
# arithmetic that DuckDB reproduces exactly, so the estimate itself is
# oracle-checkable (same trick that made CMS and Bloom checkable in r2).
# Registers merge by MAX (associative), so partial sketches combine
# map-side and stream merging ≡ batch build.
# ---------------------------------------------------------------------------


def hll_md5_registers(
    df: DataFrame, group_cols: list[str], value_col: str, p: int = 9
) -> DataFrame:
    """Per-group HLL registers: (group..., idx, reg).

    h = first 32 bits of md5('hll:' || value); idx = low p bits;
    rank = position of the leftmost 1-bit of the remaining (32-p)-bit
    word (computed via length(bin(w)) — identical in Spark and DuckDB),
    with the all-zero word mapping to (32-p)+1. The aggregate output is
    ≤ 2^p rows per group regardless of input size, and max() is the
    merge operator — the standard mergeable-partial shape.
    """
    m = 1 << p
    rbits = 32 - p
    payload = F.concat(F.lit("hll:"), F.col(value_col).cast("string"))
    h = F.conv(F.substring(F.md5(F.encode(payload, "UTF-8")), 1, 8), 16, 10).cast(
        "bigint"
    )
    w = F.shiftright(h, p)
    rho = F.when(w == 0, F.lit(rbits + 1)).otherwise(
        F.lit(rbits + 1) - F.length(F.bin(w))
    )
    return (
        df.select(
            *group_cols, h.bitwiseAND(m - 1).alias("idx"), rho.alias("rho")
        )
        .groupBy(*group_cols, "idx")
        .agg(F.max("rho").alias("reg"))
    )


def hll_md5_estimate(
    registers: DataFrame, group_cols: list[str], p: int = 9
) -> DataFrame:
    """Estimate per-group distinct counts from :func:`hll_md5_registers`.

    Classic HLL: E_raw = alpha_m * m^2 / sum_j 2^(-M[j]), with linear
    counting m*ln(m/V) when E_raw <= 2.5m and V (empty registers) > 0.
    The harmonic sum is computed as an exact BIGINT (sum of
    2^(rmax - reg), absent registers contribute 2^rmax), so the only
    floating-point steps are one division, one ln, and the final round —
    each IEEE-identical (or 1-ulp-safe under round) across engines.
    Returns (group..., est_distinct BIGINT).
    """
    m = 1 << p
    rmax = (32 - p) + 1
    alpha = 0.7213 / (1.0 + 1.079 / m)
    # single-literal numerator: alpha * m^2 * 2^rmax, folded in Python so
    # both engines divide the exact same double by the exact integer sum
    numerator = alpha * float(m * m) * float(1 << rmax)
    per = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_regs"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {rmax} - reg)")
        ).alias("s_present"),
    )
    v = (F.lit(m) - F.col("n_regs")).cast("bigint")
    s_int = F.col("s_present") + v * F.lit(1 << rmax).cast("bigint")
    e_raw = F.lit(numerator) / s_int.cast("double")
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(e_raw)
    return per.select(
        *group_cols, F.round(est, 0).cast("bigint").alias("est_distinct")
    )


def hll_md5_oracle_sql(
    key_sql: str, group_sql: str, table: str, p: int = 9
) -> str:
    """DuckDB twin of hll_md5_registers + hll_md5_estimate (same grid of
    integer/IEEE steps; numerator literal injected via repr so both
    engines divide the identical double)."""
    m = 1 << p
    rbits = 32 - p
    rmax = rbits + 1
    alpha = 0.7213 / (1.0 + 1.079 / m)
    numerator = alpha * float(m * m) * float(1 << rmax)
    return f"""
        WITH h AS (
          SELECT {group_sql} AS grp,
                 CAST(concat('0x', substr(md5(concat('hll:',
                      CAST({key_sql} AS VARCHAR))), 1, 8)) AS BIGINT) AS h
          FROM {table}
        ),
        r AS (
          SELECT grp, h & {m - 1} AS idx,
                 CASE WHEN (h >> {p}) = 0 THEN {rmax}
                      ELSE {rmax} - length(bin(h >> {p})) END AS rho
          FROM h
        ),
        regs AS (SELECT grp, idx, max(rho) AS reg FROM r GROUP BY 1, 2),
        agg AS (
          SELECT grp, count(*) AS n_regs,
                 CAST(sum(CAST(1 AS BIGINT) << CAST({rmax} - reg AS INT))
                      AS BIGINT) AS s_present
          FROM regs GROUP BY 1
        ),
        e AS (
          SELECT grp, ({m} - n_regs) AS v,
                 {numerator!r} / CAST(s_present + ({m} - n_regs)
                     * CAST({1 << rmax} AS BIGINT) AS DOUBLE) AS e_raw
          FROM agg
        )
        SELECT grp, CAST(round(
                 CASE WHEN e_raw <= {2.5 * m!r} AND v > 0
                      THEN {float(m)!r} * ln({float(m)!r} / CAST(v AS DOUBLE))
                      ELSE e_raw END) AS BIGINT) AS est_distinct
        FROM e
    """


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


# ---------------------------------------------------------------------------
# Fixed-width-bin histogram quantile sketch (fully oracle-checkable)
# ---------------------------------------------------------------------------
#
# The deterministic, mergeable alternative to the engine-internal KLL in
# ``approx_quantiles``: registers are (group, bin, cnt) with
# bin = floor(value / w). Like DDSketch, the sketch is a bounded table of
# bin counters merged by elementwise + (associative -> map-side combine
# does most of the work, and per-shard registers re-aggregate exactly);
# unlike DDSketch's log-gamma buckets, the linear bins use only one IEEE
# division + floor, which DuckDB reproduces bit-for-bit, so the whole
# estimate is hash-attestable. Error bound: |est - true| <= w within a
# bin (relative error w / value, vs DDSketch's constant relative error);
# pick w from the value scale.


def histogram_registers(
    df: DataFrame, group_cols: list[str], value_col: str, bin_width: float
) -> DataFrame:
    """Histogram sketch registers (group..., bin, cnt); merge = sum(cnt)."""
    return (
        df.filter(F.col(value_col).isNotNull())
        .withColumn("bin", F.floor(F.col(value_col) / F.lit(bin_width)).cast("bigint"))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_quantile_estimate(
    regs: DataFrame, group_cols: list[str], bin_width: float, probs: list[float]
) -> DataFrame:
    """Interpolated quantile estimates from histogram registers.

    Per group and probability q: target rank = q * n (double); the estimate
    interpolates linearly inside the first bin whose cumulative count
    reaches the target. All arithmetic is plain IEEE double with a fixed
    association, so a SQL twin reproduces it exactly. The windows/joins run
    over the REGISTER table (sketch-sized), never the raw data. Output:
    (group..., q, est, n) — one row per group x prob.
    """
    w = F.lit(float(bin_width))
    gw = Window.partitionBy(*group_cols).orderBy("bin")
    cum = (
        regs.withColumn("cum", F.sum("cnt").over(gw))
        .withColumn("n", F.sum("cnt").over(Window.partitionBy(*group_cols)))
    )
    qs = regs.sparkSession.createDataFrame(
        [(float(p),) for p in probs], "q double"
    )
    hit = (
        cum.crossJoin(F.broadcast(qs))
        .withColumn("target", F.col("q") * F.col("n").cast("double"))
        .filter(F.col("cum").cast("double") >= F.col("target"))
    )
    est = hit.withColumn(
        "est",
        F.col("bin").cast("double") * w
        + (F.col("target") - (F.col("cum") - F.col("cnt")).cast("double"))
        / F.col("cnt").cast("double")
        * w,
    )
    return est.groupBy(*group_cols, "q").agg(
        F.min_by("est", "bin").alias("est"), F.first("n").alias("n")
    )


def histogram_quantile_oracle_sql(
    value_sql: str,
    group_sql: str,
    table: str,
    bin_width: float,
    probs: list[float],
) -> str:
    """DuckDB twin of registers + estimate; yields (grp, q, est, n)."""
    w = repr(float(bin_width))
    qvals = ", ".join(f"({float(p)!r})" for p in probs)
    return f"""
        WITH regs AS (
          SELECT {group_sql} AS grp,
                 CAST(floor({value_sql} / {w}) AS BIGINT) AS bin,
                 count(*) AS cnt
          FROM {table}
          WHERE {value_sql} IS NOT NULL
          GROUP BY 1, 2
        ),
        cum AS (
          SELECT grp, bin, cnt,
                 sum(cnt) OVER (PARTITION BY grp ORDER BY bin) AS cum,
                 sum(cnt) OVER (PARTITION BY grp) AS n
          FROM regs
        ),
        hit AS (
          SELECT cum.*, q.q, q.q * CAST(n AS DOUBLE) AS target
          FROM cum CROSS JOIN (VALUES {qvals}) q(q)
          WHERE CAST(cum AS DOUBLE) >= q.q * CAST(n AS DOUBLE)
        )
        SELECT grp, q,
               CAST(bin AS DOUBLE) * {w}
                 + (target - CAST(cum - cnt AS DOUBLE)) / CAST(cnt AS DOUBLE) * {w}
                 AS est,
               CAST(n AS BIGINT) AS n
        FROM hit
        QUALIFY row_number() OVER (PARTITION BY grp, q ORDER BY bin) = 1
    """
