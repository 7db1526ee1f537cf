"""bench.py must survive individual query failures: round 4's bench
produced NOTHING because one plan threw at build time. A broken query
must cost one error entry, never the run."""

import io
import json
from contextlib import redirect_stdout

from counsel_data_pipeline_spark.catalog import Query


def test_bench_records_error_and_keeps_going(spark, monkeypatch):
    import bench

    def good(sp, sf_dir):
        return sp.range(5).selectExpr("id", "id * 2 AS v")

    def broken(sp, sf_dir):
        raise RuntimeError("forced failure for the harness test")

    fake = {
        "a_good_query": Query("a_good_query", good, None, "", (), True),
        "b_broken_query": Query("b_broken_query", broken, None, "", (), True),
        "c_good_query": Query("c_good_query", good, None, "", (), True),
    }
    monkeypatch.setattr(bench, "all_queries", lambda: dict(fake))
    monkeypatch.setattr(bench, "get_spark", lambda name: spark)
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

    out = io.StringIO()
    with redirect_stdout(out):
        bench.main()

    lines = [l for l in out.getvalue().strip().splitlines() if l.strip()]
    assert len(lines) == 1, "bench must print exactly one JSON line on stdout"
    d = json.loads(lines[0])
    assert set(d["queries"]) == {"a_good_query", "c_good_query"}
    assert all(v >= 0 for v in d["queries"].values())
    assert "b_broken_query" in d["errors"]
    assert "forced failure" in d["errors"]["b_broken_query"]


def test_headline_stdout_line_fits_driver_capture_tail():
    """The driver keeps only the last 2000 chars of stdout; the compact
    headline line for the CURRENT bench-flagged set (worst-case 2dp
    values) must fit whole, or the official BENCH artifact goes back to
    parsed:null (observed in r9)."""
    import json

    from counsel_data_pipeline_spark.catalog import all_queries

    names = [n for n, q in all_queries().items() if q.bench]
    headline = {
        "metric": "bench_total_headline_queries",
        "value": 9999.99,
        "unit": "sec",
        "queries": {n: 99.99 for n in names},
        "sf": 0.1,
    }
    line = json.dumps(headline, separators=(",", ":"))
    assert len(line) <= 1950, (
        f"{len(line)} chars for {len(names)} benched queries — trim the "
        "headline set or shorten values before the driver runs bench"
    )


def test_overlong_headline_degrades_to_parseable_compact_line(
    spark, monkeypatch
):
    """If the headline set ever grows past the 2000-char capture tail,
    bench must degrade deterministically (drop the per-query map, keep
    metric/value/sf) rather than print an overlong line the driver would
    truncate mid-JSON back to parsed:null."""
    import bench

    def good(sp, sf_dir):
        return sp.range(2).selectExpr("id")

    fake = {
        f"padded_query_name_{'x' * 60}_{i:03d}": Query(
            f"padded_query_name_{'x' * 60}_{i:03d}", good, None, "", (), True
        )
        for i in range(30)
    }
    monkeypatch.setattr(bench, "all_queries", lambda: dict(fake))
    monkeypatch.setattr(bench, "get_spark", lambda name: spark)
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

    out = io.StringIO()
    with redirect_stdout(out):
        bench.main()

    lines = [l for l in out.getvalue().strip().splitlines() if l.strip()]
    assert len(lines) == 1
    assert len(lines[0]) <= 1950, "degraded line must fit the capture tail"
    d = json.loads(lines[0])
    assert d["metric"] == "bench_total_headline_queries"
    assert d["queries"] == {}
    assert d["n_queries"] == 30
    assert d["value"] >= 0
