"""The evidence-ledger tool must read the driver's CORRECTNESS rows the
way the driver writes them — in particular err='no_oracle' with an
executed row count is the by-design rows-only attestation, not a
failure — and its freshness math must agree with the committed
artifacts."""

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "evidence_ledger",
    os.path.join(os.path.dirname(__file__), "..", "tools",
                 "evidence_ledger.py"),
)
el = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(el)


def test_classify_matrix():
    green = {"rows_match": True, "schema_match": True, "hash_match": True,
             "spark_rows": 5, "oracle_rows": 5, "err": None}
    rows_only = {"rows_match": True, "schema_match": True,
                 "hash_match": False, "spark_rows": 5, "oracle_rows": 5,
                 "err": None}
    no_oracle = {"rows_match": None, "schema_match": None,
                 "hash_match": None, "spark_rows": 5, "oracle_rows": None,
                 "err": "no_oracle"}
    crashed = {"rows_match": None, "schema_match": None, "hash_match": None,
               "spark_rows": None, "oracle_rows": None,
               "err": "AnalysisException: ..."}
    mismatch = {"rows_match": False, "schema_match": True,
                "hash_match": False, "spark_rows": 4, "oracle_rows": 5,
                "err": None}
    assert el.classify(green) == "green"
    assert el.classify(rows_only) == "rows-only"
    assert el.classify(no_oracle) == "rows-only"  # the KLL's r8 shape
    assert el.classify(crashed) == "error"
    assert el.classify(mismatch) == "mismatch"


def test_ledger_agrees_with_committed_artifacts():
    latest_green, nongreen, names = el.ledger()
    # Every catalog query either has a green driver row or is a
    # never-attested entry (new-in-round queries awaiting their first
    # driver run). Since r11 re-pointed sketch_value_quantiles from the
    # rows-only KLL to the exact inverse-CDF (hash-green in
    # CORRECTNESS_r11.json), there is no by-design rows-only exception:
    # anything never-attested must be windowed for the next driver run —
    # otherwise it's silent evidence debt.
    never = [n for n in names if n not in latest_green]
    for n in never:
        from counsel_data_pipeline_spark.catalog import DRIVER_WINDOW

        assert n in DRIVER_WINDOW, f"never-attested {n} not windowed"
    # The quantiles query graduated in r11: its latest driver row must be
    # green (it must not have slipped back into the non-green map).
    assert "sketch_value_quantiles" in latest_green
    assert "sketch_value_quantiles" not in nongreen
