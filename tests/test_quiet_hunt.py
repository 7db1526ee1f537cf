"""tools/quiet_hunt.py decision logic — the acceptance bar that gates a
BENCH_LOCAL artifact must be testable without running a single bench."""

import sys

sys.path.insert(0, "/root/repo/tools")

from quiet_hunt import _better, assess  # noqa: E402


def _detail(med=130.0, steal=0.2, ratios=None, n_errors=0, total=75.0):
    return {
        "value": total,
        "queries": {"q1": 1.0, "q2": 2.0},
        "floor_ratio": ratios if ratios is not None else {"q1": 1.3, "q2": 1.5},
        "chosen_attempt": 2,
        "attempts": [
            {"attempt": 1, "median_floor_pct": 190.0, "steal_pct": 4.0,
             "n_queries": 2, "n_errors": 0},
            {"attempt": 2, "median_floor_pct": med, "steal_pct": steal,
             "n_queries": 2, "n_errors": n_errors},
        ],
    }


def test_quiet_run_accepted():
    v = assess(_detail())
    assert v["ok"] and v["reasons"] == []
    assert v["median"] == 130.0 and v["steal"] == 0.2


def test_assess_reads_the_chosen_attempt_not_the_first():
    # attempt 1 is loud (190 / 4.0%); chosen_attempt=2 is quiet — the
    # verdict must come from the chosen one.
    assert assess(_detail())["ok"]


def test_loud_median_rejected():
    v = assess(_detail(med=171.4))
    assert not v["ok"] and any("median" in r for r in v["reasons"])


def test_steal_rejected():
    v = assess(_detail(steal=3.4))
    assert not v["ok"] and any("steal" in r for r in v["reasons"])


def test_missing_steal_marker_degrades_to_median_only():
    d = _detail()
    del d["attempts"][1]["steal_pct"]
    assert assess(d)["ok"]  # off-Linux: no marker, median bar still holds


def test_single_query_over_2x_rejected_and_named():
    v = assess(_detail(ratios={"q1": 1.3, "q2": 2.6}))
    assert not v["ok"]
    assert any("q2" in r and "2.6" in r for r in v["reasons"])


def test_errors_rejected():
    v = assess(_detail(n_errors=1))
    assert not v["ok"] and any("errored" in r for r in v["reasons"])


def test_better_prefers_coverage_then_errors_then_median():
    a = {"n_queries": 52, "n_errors": 0, "median": 171.0, "total": 92.0}
    assert not _better(a, dict(a, n_queries=51, median=120.0))  # coverage wins
    assert not _better(a, dict(a, n_errors=1, median=120.0))    # errors next
    assert _better(a, dict(a, median=150.0))                    # then median
    assert _better(None, a)
