"""Salting utilities: semantic equivalence with the plain operators on a
synthetically skewed dataset (one key owning ~50% of rows)."""

from pyspark.sql import functions as F

from counsel_data_pipeline_spark.ops import skew


def _skewed(spark, n=10_000):
    # key 0 owns half the rows; keys 1..99 share the rest
    return spark.range(n).select(
        F.when(F.col("id") % 2 == 0, 0)
        .otherwise(F.pmod(F.col("id"), F.lit(99)) + 1)
        .alias("k"),
        F.col("id").alias("row_id"),
        (F.col("id") % 7).alias("v"),
    )


def test_salted_join_equals_plain_join(spark):
    large = _skewed(spark)
    small = spark.range(100).select(
        F.col("id").cast("int").alias("k"), F.concat(F.lit("dim_"), F.col("id")).alias("label")
    )
    plain = large.join(small, ["k"]).select("row_id", "label")
    salted = skew.salted_join(large, small, ["k"], n_salts=8).select("row_id", "label")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer(spark):
    large = _skewed(spark)
    small = spark.range(5).select(F.col("id").cast("int").alias("k"), F.lit("x").alias("label"))
    plain = large.join(small, ["k"], "left").select("row_id", "label")
    salted = skew.salted_join(large, small, ["k"], n_salts=4, how="left").select(
        "row_id", "label"
    )
    assert sorted(map(tuple, plain.collect(), )) == sorted(map(tuple, salted.collect()))


def test_salt_is_deterministic(spark):
    df = _skewed(spark, 1000)
    a = skew.with_salt(df, 8).select("row_id", "__salt")
    b = skew.with_salt(df, 8).select("row_id", "__salt")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # and spread: the hot key's rows land in every salt shard
    spread = (
        skew.with_salt(df, 8).filter(F.col("k") == 0).select("__salt").distinct().count()
    )
    assert spread == 8


def test_salted_count_distinct(spark):
    df = _skewed(spark)
    plain = df.groupBy("k").agg(F.count_distinct("v").alias("n_distinct_v"))
    salted = skew.salted_count_distinct(df, ["k"], "v", n_salts=8)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
