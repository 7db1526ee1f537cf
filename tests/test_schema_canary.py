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

from counsel_data_pipeline_spark.io.schema_canary import EXPECTED, TS_VARIANTS, check_dir

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")
# The driver regenerates every scale factor together; pin them all so a
# partial regeneration (or a per-sf encoding difference) is caught too.
ALL_SF_DIRS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

@pytest.mark.parametrize("sf_dir", ALL_SF_DIRS)
@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_testdata_physical_schema(table: str, sf_dir: str) -> None:
    """Per-table view over the SHARED canary logic (io/schema_canary.py is
    the single source of truth — bench startup runs the same check_dir),
    parametrized for per-table failure granularity."""
    path = os.path.join(sf_dir, f"{table}.parquet")
    if not os.path.exists(path):
        pytest.skip(f"testdata missing: {path}")
    mine = [p for p in check_dir(sf_dir) if p.startswith(f"{table}.")]
    assert mine == [], "TESTDATA DRIFT:\n" + "\n".join(mine)


def test_stream_events_sniffer_recognizes_current_footer() -> None:
    """The streaming source declares its schema from the footer sniffer;
    this asserts the sniffer classifies TODAY's events.parquet (a new
    unclassifiable variant should fail here, not mid-stream)."""
    from counsel_data_pipeline_spark.streaming.windows import _events_ts_physical

    path = os.path.join(SF_DIR, "events.parquet")
    if not os.path.exists(path):
        pytest.skip(f"testdata missing: {path}")
    assert _events_ts_physical(path) in {"nanos_as_long", "timestamp", "timestamp_ntz"}


@pytest.mark.parametrize("sf_dir", ALL_SF_DIRS)
def test_check_dir_clean(sf_dir: str) -> None:
    """The shared bench-startup canary agrees with the pytest one."""
    if not os.path.isdir(sf_dir):
        pytest.skip(f"testdata missing: {sf_dir}")
    assert check_dir(sf_dir) == []
