"""Driver-contract tests for __spark_entry__: the three exported hooks,
and robustness against the driver session's timezone (the driver builds
its OWN SparkSession — nothing guarantees it is UTC)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry

SF = "/root/testdata/sf0.01"


def test_entry_smoke(spark):
    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) >= {"l_returnflag", "l_linestatus", "count_order"}


def test_every_oracle_key_has_a_query():
    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert set(oracles) <= set(qs)
    # the vast majority of the catalog is oracle-checked; only the
    # hash-function-dependent / approximate ops are rows-only
    rows_only = set(qs) - set(oracles)
    assert len(rows_only) <= 9, sorted(rows_only)
    for sql in oracles.values():
        assert sql.strip()


def test_queries_survive_non_utc_driver_session(spark):
    """Timestamp-rendering queries must produce identical results when the
    driver's session starts in a non-UTC zone (tune_for_session pins UTC
    at call time)."""
    qs = entry.queries()
    name = "events_tumbling_hourly"

    baseline = sorted(map(tuple, qs[name](spark, SF).collect()))

    s2 = spark.newSession()
    s2.conf.set("spark.sql.session.timeZone", "America/New_York")
    shifted = sorted(map(tuple, qs[name](s2, SF).collect()))
    assert shifted == baseline

    # and the session the wrapper ran on is now pinned to UTC
    assert s2.conf.get("spark.sql.session.timeZone") == "UTC"
