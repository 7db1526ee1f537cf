"""Quiet-window bench campaign — repeat ``bench.py --until-quiet`` runs,
spaced by a sleep, until one lands on a genuinely quiet host, then save
that run's full detail as the round's local artifact.

Why this exists: host load on this box arrives in multi-minute waves
(hypervisor steal 2-7% when loud, ~0.2% when quiet), and a single
``--until-quiet`` invocation only samples ~5 attempts inside one
~15-minute window — r12 through r15 each burned part of a session
hand-rerunning the hunt until the wave passed. This tool is that outer
loop, committed: each iteration is one fresh-JVM bench hunt, the
iteration's ``bench_last_detail.json`` is archived, and the campaign
stops the moment a run satisfies the ACCEPTANCE bar (below) or the
iteration budget runs out — in which case the best run seen is still
saved, explicitly marked not-quiet.

Acceptance bar (``assess``): full query coverage, zero errors, the
chosen attempt's median floor_pct <= --accept-median (default 145 — the
committed floors are all-time quiet-machine minima, so even a perfectly
quiet run medians ~1.3-1.5x; r15's accepted artifact was 142.1), no
single query over --max-ratio x its floor (default 2.0 — the "zero over
2x floor" bar every accepted BENCH_LOCAL has met), and, when the
/proc/stat markers are present, chosen-attempt steal_pct <=
--accept-steal (default 0.75 — loud waves measure 2-7%, quiet windows
0.0-0.6).

Usage (from the repo root, typically backgrounded for a few hours):

    python tools/quiet_hunt.py --iterations 12 --sleep-sec 900 \
        --out BENCH_LOCAL_r16.json

The decision logic is pure (``assess`` on a parsed detail dict) so the
bar itself is unit-testable without running Spark.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DETAIL = os.path.join(REPO, "bench_last_detail.json")


def assess(
    detail: dict,
    *,
    accept_median: float = 145.0,
    accept_steal: float = 0.75,
    max_ratio: float = 2.0,
) -> dict:
    """Judge one bench run's detail dict against the quiet bar.

    Returns {"ok": bool, "reasons": [str, ...], "median": float|None,
    "steal": float|None, "worst_ratio": float|None, "total": float} —
    ``reasons`` lists every failed criterion (empty when ok), so a
    campaign log shows WHY a loud run was rejected, not just that it
    was."""
    reasons: list[str] = []
    attempts = detail.get("attempts") or []
    chosen_i = detail.get("chosen_attempt")
    chosen = (
        attempts[chosen_i - 1]
        if chosen_i and 0 < chosen_i <= len(attempts)
        else {}
    )
    n_queries = chosen.get("n_queries", len(detail.get("queries", {})))
    n_errors = chosen.get("n_errors", 0)
    if n_errors:
        reasons.append(f"{n_errors} errored queries")
    # Coverage: every floored query the bench knows about must have a
    # timing. The detail's floor_ratio map is keyed on exactly the
    # benched queries that have committed floors, so a missing timing
    # shows up as queries < floor_ratio cardinality only when a query
    # errored — n_errors already catches that; additionally guard
    # against an empty run.
    if not detail.get("queries"):
        reasons.append("no per-query timings")
    med = chosen.get("median_floor_pct")
    if med is None:
        reasons.append("no median_floor_pct (no committed floors?)")
    elif med > accept_median:
        reasons.append(f"median {med} > {accept_median}")
    steal = chosen.get("steal_pct")
    if steal is not None and steal > accept_steal:
        reasons.append(f"steal {steal}% > {accept_steal}%")
    ratios = detail.get("floor_ratio") or {}
    worst = max(ratios.values()) if ratios else None
    if worst is not None and worst > max_ratio:
        over = sorted(
            (n for n, r in ratios.items() if r > max_ratio),
            key=lambda n: -ratios[n],
        )
        reasons.append(
            f"{len(over)} queries over {max_ratio}x floor "
            f"(worst {over[0]} at {worst:.2f}x)"
        )
    return {
        "ok": not reasons,
        "reasons": reasons,
        "median": med,
        "steal": steal,
        "worst_ratio": worst,
        "total": detail.get("value"),
        "n_queries": n_queries,
        "n_errors": n_errors,
    }


def _better(a: dict | None, b: dict) -> bool:
    """Is assessment ``b`` better than ``a``? Same ordering as bench.py's
    attempt selection: coverage first, then fewest errors, then quietest
    median, then total."""
    if a is None:
        return True
    ka = (-a["n_queries"], a["n_errors"],
          a["median"] if a["median"] is not None else float("inf"),
          a["total"] if a["total"] is not None else float("inf"))
    kb = (-b["n_queries"], b["n_errors"],
          b["median"] if b["median"] is not None else float("inf"),
          b["total"] if b["total"] is not None else float("inf"))
    return kb < ka


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--iterations", type=int, default=12)
    ap.add_argument("--sleep-sec", type=float, default=900.0,
                    help="pause between iterations — load waves last "
                         "minutes, so back-to-back retries resample the "
                         "same wave (default 900)")
    ap.add_argument("--accept-median", type=float, default=145.0)
    ap.add_argument("--accept-steal", type=float, default=0.75)
    ap.add_argument("--max-ratio", type=float, default=2.0)
    ap.add_argument("--max-attempts", type=int, default=5,
                    help="per-iteration bench.py --max-attempts")
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    ap.add_argument("--cpus",
                    default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--out", default=None,
                    help="where to copy the accepted (or best) run's "
                         "full detail, e.g. BENCH_LOCAL_r16.json")
    ap.add_argument("--work-dir", default="/tmp/quiet_hunt",
                    help="per-iteration stdout/stderr/detail archive")
    args = ap.parse_args(argv)

    os.makedirs(args.work_dir, exist_ok=True)
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=args.sf_dir,
               SPARK_GRAFT_CPUS=str(args.cpus))
    best: dict | None = None
    best_detail_path: str | None = None
    for i in range(1, args.iterations + 1):
        tag = f"iter{i:02d}_{time.strftime('%H%M%S')}"
        out_p = os.path.join(args.work_dir, f"{tag}.out")
        err_p = os.path.join(args.work_dir, f"{tag}.err")
        with open(out_p, "w") as out_f, open(err_p, "w") as err_f:
            subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py"),
                 "--until-quiet",
                 "--max-attempts", str(args.max_attempts),
                 # early-stop bar inside one bench run = the campaign's
                 # acceptance median, so a quiet window ends the attempt
                 # loop immediately instead of burning more passes on it
                 "--quiet-median", str(args.accept_median)],
                cwd=REPO, env=env, stdout=out_f, stderr=err_f,
                check=False,
            )
        try:
            with open(DETAIL) as fh:
                detail = json.load(fh)
        except Exception as exc:  # noqa: BLE001 — a crashed bench is a log line
            print(f"# {tag}: no detail ({type(exc).__name__}: {exc})",
                  flush=True)
            if args.sleep_sec and i < args.iterations:
                time.sleep(args.sleep_sec)
            continue
        detail_p = os.path.join(args.work_dir, f"{tag}.detail.json")
        shutil.copy(DETAIL, detail_p)
        verdict = assess(detail,
                         accept_median=args.accept_median,
                         accept_steal=args.accept_steal,
                         max_ratio=args.max_ratio)
        print(f"# {tag}: total {verdict['total']}s median "
              f"{verdict['median']} steal {verdict['steal']}% worst "
              f"{verdict['worst_ratio']} -> "
              f"{'ACCEPT' if verdict['ok'] else 'reject: ' + '; '.join(verdict['reasons'])}",
              flush=True)
        if _better(best, verdict):
            best, best_detail_path = verdict, detail_p
        if verdict["ok"]:
            if args.out:
                shutil.copy(detail_p, args.out)
                print(f"# accepted artifact -> {args.out}", flush=True)
            return 0
        if args.sleep_sec and i < args.iterations:
            time.sleep(args.sleep_sec)
    # Budget exhausted: keep the best loud run, explicitly marked.
    if args.out and best_detail_path:
        shutil.copy(best_detail_path, args.out)
        print(f"# NO QUIET WINDOW in {args.iterations} iterations — "
              f"best run (median {best['median']}, steal {best['steal']}%) "
              f"-> {args.out}; treat as loud", flush=True)
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
