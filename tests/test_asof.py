"""As-of join operator (ops/asof.py): backward-match semantics, tie
handling, no-match nulls, duplicate-timestamp determinism."""

from counsel_data_pipeline_spark.ops.asof import asof_join


def _ts(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_backward_match_and_nulls(spark):
    left = _ts(
        spark,
        [(1, 100, "p1"), (1, 50, "p0"), (2, 10, "p2")],
        "k int, ts long, name string",
    )
    right = _ts(
        spark,
        [(1, 60, "r60"), (1, 90, "r90"), (1, 120, "r120"), (2, 30, "r30")],
        "k int, ts long, tag string",
    )
    out = {
        r.name: r.tag_asof
        for r in asof_join(left, right, ["k"], "ts", "ts").collect()
    }
    assert out == {
        "p1": "r90",   # latest right ts <= 100
        "p0": None,    # nothing at or before 50
        "p2": None,    # right exists only after left ts
    }


def test_tie_at_equal_timestamp_matches(spark):
    left = _ts(spark, [(1, 100, "p")], "k int, ts long, name string")
    right = _ts(spark, [(1, 100, "exact")], "k int, ts long, tag string")
    [r] = asof_join(left, right, ["k"], "ts", "ts").collect()
    assert r.tag_asof == "exact" and r.ts_asof == 100


def test_duplicate_right_ts_latest_order_wins(spark):
    left = _ts(spark, [(1, 100, "p")], "k int, ts long, name string")
    right = _ts(
        spark,
        [(1, 90, 1, "first"), (1, 90, 2, "second")],
        "k int, ts long, seq int, tag string",
    )
    [r] = asof_join(
        left, right, ["k"], "ts", "ts", right_cols=["tag"], right_order="seq"
    ).collect()
    # right_order not in right_cols is invalid for ordering — include it
    # via right_cols in real use; here seq rides in the payload ordering
    assert r.tag_asof == "second"


def test_left_columns_carried(spark):
    left = _ts(spark, [(1, 5, "x", 9.5)], "k int, ts long, name string, v double")
    right = _ts(spark, [(1, 5, "t")], "k int, ts long, tag string")
    [r] = asof_join(left, right, ["k"], "ts", "ts").collect()
    assert (r.name, r.v, r.tag_asof) == ("x", 9.5, "t")
