"""Physical-schema drift canary.

Round 4 burned entirely because the driver regenerated ``events.parquet``
with ``ts: timestamp[us]`` (previously TIMESTAMP(NANOS) read as long) and
nothing noticed until plans started throwing AnalysisException mid-bench.
This test reads every testdata table's parquet FOOTER (cheap — no Spark,
no data scan) and asserts the physical types the engine is written
against, failing with a pointed message when the environment drifts.

A failure here means: the driver regenerated testdata with new physical
types. Fix at the normalization boundaries, not per-plan:
  - batch:  counsel_data_pipeline_spark/io/sources.load_table
  - stream: counsel_data_pipeline_spark/streaming/windows.stream_events
then update EXPECTED below to pin the new reality.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")
# The driver regenerates every scale factor together; pin them all so a
# partial regeneration (or a per-sf encoding difference) is caught too.
ALL_SF_DIRS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

# Known-good physical variants per time-carrying column. The engine's load
# boundary normalizes every variant in this set; anything OUTSIDE the set
# is unhandled drift and must fail loudly.
TS_VARIANTS = {
    "int64",              # TIMESTAMP(NANOS) read via nanosAsLong
    "timestamp[ns]",      # raw nanos footer type
    "timestamp[us]",      # micros, no tz -> Spark TIMESTAMP_NTZ (r4 drift)
    "timestamp[us, tz=UTC]",
}

# Exact expected footer schema per table; values are either an exact arrow
# type string or the sentinel "TS" (any member of TS_VARIANTS).
EXPECTED: dict[str, dict[str, str]] = {
    "region": {"r_regionkey": "int32", "r_name": "string"},
    "nation": {"n_nationkey": "int32", "n_name": "string", "n_regionkey": "int32"},
    "customer": {
        "c_custkey": "int64",
        "c_name": "string",
        "c_nationkey": "int32",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "int64",
        "s_name": "string",
        "s_nationkey": "int32",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "int64",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int32",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "int64",
        "o_custkey": "int64",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "TS",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "int64",
        "l_partkey": "int64",
        "l_suppkey": "int64",
        "l_linenumber": "int32",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "TS",
    },
    "events": {
        "event_id": "int64",
        "ts": "TS",
        "user_id": "int64",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "int64",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "int64",
    },
    "embeddings": {
        "vec_id": "int64",
        "embedding": "list<element: float>",
        "label": "int32",
    },
}


@pytest.mark.parametrize("sf_dir", ALL_SF_DIRS)
@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_testdata_physical_schema(table: str, sf_dir: str) -> None:
    path = os.path.join(sf_dir, f"{table}.parquet")
    if not os.path.exists(path):
        pytest.skip(f"testdata missing: {path}")
    actual = {f.name: str(f.type) for f in pq.read_schema(path)}
    expected = EXPECTED[table]

    assert set(actual) == set(expected), (
        f"TESTDATA DRIFT: {table}.parquet columns changed.\n"
        f"  expected: {sorted(expected)}\n  actual:   {sorted(actual)}\n"
        f"Update io/sources.load_table + this canary."
    )
    for col, want in expected.items():
        got = actual[col]
        ok = got in TS_VARIANTS if want == "TS" else got == want
        assert ok, (
            f"TESTDATA DRIFT: {table}.{col} is physically '{got}', engine "
            f"expects {'one of ' + str(sorted(TS_VARIANTS)) if want == 'TS' else want!r}.\n"
            f"The driver regenerated testdata with a new physical type. Fix "
            f"at the load boundary (io/sources.load_table for batch, "
            f"streaming/windows.stream_events for streams), then pin the new "
            f"type here."
        )


def test_stream_events_sniffer_recognizes_current_footer() -> None:
    """The streaming source declares its schema from the footer sniffer;
    this asserts the sniffer classifies TODAY's events.parquet (a new
    unclassifiable variant should fail here, not mid-stream)."""
    from counsel_data_pipeline_spark.streaming.windows import _events_ts_physical

    path = os.path.join(SF_DIR, "events.parquet")
    if not os.path.exists(path):
        pytest.skip(f"testdata missing: {path}")
    assert _events_ts_physical(path) in {"nanos_as_long", "timestamp", "timestamp_ntz"}
