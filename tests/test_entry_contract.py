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
    # exactly the engine-internal trio: k-means IVF (iterative float
    # averaging — not bit-reproducible in SQL), HLL and KLL sketch
    # internals. Everything else in the catalog is oracle-checked.
    assert len(rows_only) <= 3, sorted(rows_only)
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


def test_oracle_output_types_are_driver_safe():
    """No oracle may emit HUGEINT/UBIGINT or a fine-scaled DECIMAL.

    The driver's fetch path renders DuckDB HUGEINT (what sum(int) widens
    to) as float ("150.0") while Spark's bigint renders "150" — in round 1
    the set of hash-red queries was EXACTLY the set of oracles with a
    HUGEINT output column. DECIMAL(p, s>1) prints trailing zeros under a
    Decimal fetch ("1234.560000" vs double "1234.56"). Guard the whole
    catalog so a new query can't reintroduce the mismatch.
    """
    import duckdb

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    bad = {}
    for name, sql in entry.oracle_sql().items():
        rel = con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
        for col, typ in zip(rel.columns, [str(t) for t in rel.types]):
            if typ in ("HUGEINT", "UBIGINT") or (
                typ.startswith("DECIMAL") and int(typ.rstrip(")").split(",")[1]) > 1
            ):
                bad.setdefault(name, []).append((col, typ))
    assert not bad, f"driver-unsafe oracle output types: {bad}"
