"""Incremental aggregate maintenance: state maintained over a sequence of
delta batches must equal a full recompute, bit-for-bit (decimal sums),
regardless of batch arrival order."""

from pyspark.sql import functions as F

from counsel_data_pipeline_spark.io.sources import load_table
from counsel_data_pipeline_spark.ops import incremental as inc

SF = "/root/testdata/sf0.001"
KEYS = ["l_returnflag", "l_linestatus"]


def _batches(spark, n=3):
    li = load_table(spark, SF, "lineitem")
    return [li.filter(F.pmod(F.col("l_orderkey"), n) == i) for i in range(n)]


def _canon(df):
    return sorted(map(tuple, df.collect()))


def test_incremental_equals_full_recompute(spark):
    batches = _batches(spark)
    state = inc.partial_state(batches[0], KEYS, "l_extendedprice")
    for b in batches[1:]:
        state = inc.merge_states(state, inc.partial_state(b, KEYS, "l_extendedprice"), KEYS)

    full = inc.partial_state(load_table(spark, SF, "lineitem"), KEYS, "l_extendedprice")
    assert _canon(inc.finalize(state)) == _canon(inc.finalize(full))


def test_merge_is_order_insensitive(spark):
    b = _batches(spark)
    s = [inc.partial_state(x, KEYS, "l_extendedprice") for x in b]
    fwd = inc.merge_states(inc.merge_states(s[0], s[1], KEYS), s[2], KEYS)
    rev = inc.merge_states(inc.merge_states(s[2], s[0], KEYS), s[1], KEYS)
    assert _canon(inc.finalize(fwd)) == _canon(inc.finalize(rev))


def test_delta_cost_is_delta_sized(spark):
    """The maintenance step aggregates ONLY the new batch: its scan reads
    the delta, never the history table."""
    batches = _batches(spark)
    delta_state = inc.partial_state(batches[1], KEYS, "l_extendedprice")
    plan = delta_state._jdf.queryExecution().executedPlan().toString()
    # one scan in the maintenance plan (the delta), no second table
    assert plan.count("Scan parquet") == 1
