"""Sketch + curation operators: approximation guarantees and semantic
properties that the DuckDB oracle can't express (error bounds of
engine-internal sketches; determinism/stability of hash splits; PII
redaction on planted fixtures)."""

import pytest
from pyspark.sql import functions as F

from counsel_data_pipeline_spark.ops import curation as cu
from counsel_data_pipeline_spark.ops import sketches as sk

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    from counsel_data_pipeline_spark.io.sources import load_table

    return load_table(spark, SF, "events").cache()


# ---------------------------------------------------------------------------
# count-min
# ---------------------------------------------------------------------------


def test_cms_never_underestimates(events):
    sketch = sk.cms_build(events, "user_id", depth=4, width=64)
    probes = events.select("user_id").distinct()
    est = sk.cms_estimate(sketch, probes, "user_id", depth=4, width=64)
    true = events.groupBy(F.col("user_id").alias("key")).agg(
        F.count(F.lit(1)).alias("true_cnt")
    )
    joined = est.join(true, "key").collect()
    assert len(joined) > 0
    assert all(r.est_cnt >= r.true_cnt for r in joined)


def test_cms_error_bound(events):
    # Standard CM guarantee: err <= e/width * N with prob 1 - e^-depth per
    # key; assert the MEDIAN overestimate stays within 2N/width (loose).
    n = events.count()
    sketch = sk.cms_build(events, "user_id", depth=4, width=64)
    probes = events.select("user_id").distinct()
    est = sk.cms_estimate(sketch, probes, "user_id", depth=4, width=64)
    true = events.groupBy(F.col("user_id").alias("key")).agg(
        F.count(F.lit(1)).alias("true_cnt")
    )
    errs = sorted(
        r.est_cnt - r.true_cnt for r in est.join(true, "key").collect()
    )
    assert errs[len(errs) // 2] <= 2 * n / 64


def test_cms_sketch_size_bounded(events):
    sketch = sk.cms_build(events, "user_id", depth=4, width=64)
    assert sketch.count() <= 4 * 64


# ---------------------------------------------------------------------------
# bloom
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives(spark, events):
    members = events.filter(F.col("event_type") == "purchase")
    bloom = sk.bloom_build(members, "user_id", n_hashes=3, m_bits=4096)
    probes = events.select("user_id").distinct()
    probed = sk.bloom_probe(bloom, probes, "user_id", n_hashes=3, m_bits=4096)
    actual = members.select(F.col("user_id").alias("key")).distinct()
    missed = actual.join(probed.filter(~F.col("may_contain")), "key").count()
    assert missed == 0


def test_bloom_filters_some_nonmembers(spark):
    # Disjoint probe set far from the member keys: most must be rejected.
    members = spark.range(0, 500).select(F.col("id").alias("k"))
    bloom = sk.bloom_build(members, "k", n_hashes=3, m_bits=8192)
    probes = spark.range(1_000_000, 1_001_000).select(F.col("id").alias("k"))
    probed = sk.bloom_probe(bloom, probes, "k", n_hashes=3, m_bits=8192)
    fp = probed.filter(F.col("may_contain")).count()
    # designed fp rate ~ (1-exp(-3*500/8192))^3 ~ 0.5% ; allow 5%
    assert fp <= 50


# ---------------------------------------------------------------------------
# engine-native sketches vs exact
# ---------------------------------------------------------------------------


def test_hll_md5_within_relative_error(events):
    # classic HLL with m=512: rsd ~ 1.04/sqrt(512) ~ 4.6%; allow 3 sigma
    # (+small-count slack) against the exact answer.
    regs = sk.hll_md5_registers(events, ["event_type"], "user_id", p=9)
    approx = {
        r.event_type: r.est_distinct
        for r in sk.hll_md5_estimate(regs, ["event_type"], p=9).collect()
    }
    exact = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for k in exact:
        assert abs(approx[k] - exact[k]) <= max(3, 0.15 * exact[k])


def test_hll_md5_merge_equals_batch(events):
    # Registers merge by MAX: building on two disjoint halves and folding
    # the partials must equal the single-pass build — the property that
    # makes the sketch map-side-combinable and stream-maintainable.
    half_a = events.filter(F.col("user_id") % 2 == 0)
    half_b = events.filter(F.col("user_id") % 2 == 1)
    ra = sk.hll_md5_registers(half_a, ["event_type"], "user_id", p=9)
    rb = sk.hll_md5_registers(half_b, ["event_type"], "user_id", p=9)
    merged = (
        ra.unionByName(rb)
        .groupBy("event_type", "idx")
        .agg(F.max("reg").alias("reg"))
    )
    est_merged = {
        r.event_type: r.est_distinct
        for r in sk.hll_md5_estimate(merged, ["event_type"], p=9).collect()
    }
    full = sk.hll_md5_registers(events, ["event_type"], "user_id", p=9)
    est_full = {
        r.event_type: r.est_distinct
        for r in sk.hll_md5_estimate(full, ["event_type"], p=9).collect()
    }
    assert est_merged == est_full


def test_hll_within_relative_error(events):
    approx = {
        r.event_type: r.approx_distinct
        for r in sk.hll_distinct(events, ["event_type"], "user_id", rsd=0.02).collect()
    }
    exact = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for k in exact:
        assert abs(approx[k] - exact[k]) <= max(2, 0.1 * exact[k])


def test_approx_quantiles_bracket_exact(events):
    out = sk.approx_quantiles(events, ["event_type"], "value", [0.5], accuracy=10000)
    approx = {r.event_type: r.approx_quantiles[0] for r in out.collect()}
    exact = {
        r.event_type: r.m
        for r in events.groupBy("event_type")
        .agg(F.expr("percentile(value, 0.5)").alias("m"))
        .collect()
    }
    for k in exact:
        lo, hi = (
            events.filter(F.col("event_type") == k)
            .agg(F.min("value"), F.max("value"))
            .first()
        )
        assert lo <= approx[k] <= hi
        # high accuracy on a small table: approx median ~ exact median
        assert abs(approx[k] - exact[k]) <= 0.05 * max(1.0, abs(exact[k]))


# ---------------------------------------------------------------------------
# curation
# ---------------------------------------------------------------------------


def test_split_deterministic_and_proportional(spark):
    df = spark.range(20_000).select(F.col("id").alias("doc_id"))
    a = df.select("doc_id", cu.split_assign(F.col("doc_id")).alias("s"))
    counts = {r.s: r.n for r in a.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 20_000 - 0.80) < 0.02
    assert abs(counts["val"] / 20_000 - 0.10) < 0.02
    # stability: same ids → same split on re-evaluation and under reshuffle
    b = df.repartition(13).select("doc_id", cu.split_assign(F.col("doc_id")).alias("s"))
    assert a.exceptAll(b).count() == 0


def test_pii_redaction(spark):
    rows = [
        ("contact me at alice@example.com or +1 (555) 123-4567", 1),
        ("no pii here", 0),
        ("bob.smith+tag@sub.domain.org wrote", 1),
    ]
    df = spark.createDataFrame(rows, ["text", "has_mail"])
    out = df.select(
        "text", "has_mail",
        cu.email_count(F.col("text")).alias("n_mail"),
        cu.redact_pii(F.col("text")).alias("red"),
    ).collect()
    for r in out:
        assert r.n_mail == r.has_mail
        assert "@" not in r.red
        assert "555" not in r.red


def test_repetition_ratio_extremes(spark):
    df = spark.createDataFrame(
        [("a b c a b c a b c a b c",), ("one two three four five six",), ("hi",)],
        ["text"],
    )
    vals = [
        r.rep
        for r in df.select(cu.repetition_ratio(F.col("text"), 3).alias("rep")).collect()
    ]
    looped, unique, short = vals
    assert looped > 0.5          # period-3 loop: almost every trigram repeats
    assert unique == 0.0         # all trigrams distinct
    assert short == 0.0          # shorter than n → defined as 0


def test_decontaminate_finds_planted_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog today")], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [
            (1, "prefix words the quick brown fox jumps over the lazy dog today suffix"),
            (2, "completely different content with no overlap at all whatsoever"),
        ],
        ["doc_id", "text"],
    )
    out = cu.decontaminate(corpus, bench, n=8).collect()
    assert [r.doc_id for r in out] == [1]
    assert out[0].n_benchmark_docs == 1
    assert out[0].n_shared_shingles >= 3


def test_sampled_quantiles_track_exact(events):
    # The md5 10% sample's interpolated percentiles should sit near the
    # exact full-data percentiles (sanity of the sketch's accuracy).
    from counsel_data_pipeline_spark.catalog import all_queries

    out = {
        r.event_type: r
        for r in all_queries()["sketch_sampled_quantiles"]
        .fn(events.sparkSession, SF)
        .collect()
    }
    exact = {
        r.event_type: r.m
        for r in events.groupBy("event_type")
        .agg(F.expr("percentile(value, 0.5)").alias("m"))
        .collect()
    }
    assert out.keys() == exact.keys()
    for k, r in out.items():
        assert r.sample_n > 0
        # quantile-estimate noise shrinks ~1/sqrt(n); at sf0.001 the 10%
        # sample is ~17 rows/group, so the bound must scale with it
        tol = max(1.0, 3.0 * abs(exact[k]) / (r.sample_n ** 0.5))
        assert abs(r.p50_est - exact[k]) <= tol


def test_bloom_decontam_prefilter_no_false_negatives(spark):
    # A Bloom miss must be definitive: every truly-contaminated doc is
    # flagged may_contaminated (the prefilter can never drop a dirty doc).
    from counsel_data_pipeline_spark.catalog import all_queries

    out = all_queries()["curation_decontam_bloom_prefilter"].fn(spark, SF)
    bad = out.filter(F.col("is_contaminated") & ~F.col("may_contaminated"))
    assert bad.count() == 0
    # and the exact-shared count never exceeds the bloom-hit count
    assert out.filter(F.col("n_true_shared") > F.col("n_maybe_shingles")).count() == 0


def test_histogram_quantiles_within_bin_width(events):
    # The histogram sketch (like KLL) guarantees RANK accuracy: the chosen
    # bin contains the order statistic at rank ceil(q*n), and the estimate
    # interpolates inside that w-wide bin — so it is within w of the exact
    # discrete quantile. (No such bound holds vs the INTERPOLATED
    # percentile: in a sparse tail the gap between adjacent order
    # statistics is unbounded.)
    import math

    from counsel_data_pipeline_spark.catalog import all_queries

    w = 4.0
    out = {
        r.event_type: r
        for r in all_queries()["sketch_histogram_quantiles"]
        .fn(events.sparkSession, SF)
        .collect()
    }
    vals: dict[str, list[float]] = {}
    for r in events.select("event_type", "value").collect():
        vals.setdefault(r.event_type, []).append(r.value)
    assert out.keys() == vals.keys()
    for k, r in out.items():
        xs = sorted(vals[k])
        for q, est in ((0.5, r.p50_est), (0.99, r.p99_est)):
            exact_disc = xs[math.ceil(q * len(xs)) - 1]
            assert abs(est - exact_disc) <= w, (k, q, est, exact_disc)


def test_histogram_registers_merge_equals_batch(events):
    # Summing per-shard registers must reproduce the single-level registers
    # exactly — the mergeability claim behind the re-aggregatable form.
    sharded = sk.histogram_registers(
        events.withColumn("shard", sk.md5_bucket(F.col("event_id"), 43, 8)),
        ["shard", "event_type"],
        "value",
        4.0,
    )
    merged = sharded.groupBy("event_type", "bin").agg(F.sum("cnt").alias("cnt"))
    direct = sk.histogram_registers(events, ["event_type"], "value", 4.0)
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0
