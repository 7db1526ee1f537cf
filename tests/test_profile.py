"""Column profiler: null accounting, exact vs HLL distincts, and the
drift-detection join shape (profile ⋈ profile on column name)."""

from pyspark.sql import functions as F

from counsel_data_pipeline_spark.ops.profile import profile


def _df(spark):
    rows = [(1, "a", None), (2, "b", 1.5), (3, None, 2.5), (4, "b", None)]
    return spark.createDataFrame(rows, ["id", "s", "v"])


def test_profile_null_and_distinct_accounting(spark):
    out = {r.col_name: r for r in profile(_df(spark), exact=True).collect()}
    assert set(out) == {"id", "s", "v"}
    assert all(r.n_rows == 4 for r in out.values())
    assert out["s"].n_null == 1 and out["s"].null_frac == 0.25
    assert out["s"].n_distinct == 2  # countDistinct ignores nulls
    assert out["v"].n_null == 2 and out["v"].n_distinct == 2
    assert out["id"].min_s == "1" and out["id"].max_s == "4"


def test_profile_approx_close_to_exact(spark):
    df = spark.range(5000).select(
        F.col("id"), (F.col("id") % 100).alias("k")
    )
    got = {r.col_name: r.n_distinct for r in profile(df).collect()}
    assert abs(got["k"] - 100) <= 10
    assert abs(got["id"] - 5000) <= 250  # 2% rsd HLL


def test_profile_drift_join(spark):
    """Two batches' profiles join on col_name — the drift check shape."""
    a = profile(_df(spark), exact=True).select(
        "col_name", F.col("null_frac").alias("null_a")
    )
    b_rows = [(1, None, None), (2, None, 1.0)]
    b_df = spark.createDataFrame(b_rows, "id long, s string, v double")
    b = profile(b_df, exact=True).select(
        "col_name", F.col("null_frac").alias("null_b")
    )
    drift = {r.col_name: (r.null_a, r.null_b) for r in a.join(b, "col_name").collect()}
    assert drift["s"] == (0.25, 1.0)  # the drifted column is visible
