"""Evidence-freshness ledger: recompute per-query driver attestation
from the committed CORRECTNESS_r*.json artifacts and propose the next
round's DRIVER_WINDOW rotation.

The external driver hash-checks only the FIRST 50 entries of
``queries()`` per round, so window rotation is the mechanism that keeps
every catalog query's evidence fresh. Historically the rotation list
was maintained by hand (and was the judge's top process complaint when
it slipped in r7); this tool makes it mechanical:

    python tools/evidence_ledger.py            # ledger summary
    python tools/evidence_ledger.py --suggest  # next-window fill queue

Output (stdout, human-oriented):
  - per-round counts of latest-green evidence,
  - queries never attested by any driver round,
  - queries whose latest row is NOT hash-green (errors / rows-only),
  - with --suggest: the fill queue for the next rotation — never-attested
    first, then rows ordered by oldest latest-green round, capped at the
    window size minus a reserve for the round's new registrations.

No Spark session is started: this reads JSON + imports the catalog
registry only (plans import registers query names without running them).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WINDOW_SIZE = 50


def load_rounds() -> dict[int, dict]:
    rounds = {}
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            with open(path) as fh:
                rounds[int(m.group(1))] = json.load(fh)
        except (OSError, json.JSONDecodeError) as exc:
            print(f"# skipping {path}: {exc}", file=sys.stderr)
    return rounds


def classify(row: dict) -> str:
    """Map one driver CORRECTNESS row to its attestation kind.

    The driver records a by-design no-oracle query as err='no_oracle'
    WITH the executed Spark row count — that is the weaker rows-only
    attestation, not a failure (observed: sketch_value_quantiles r8).
    """
    if row.get("err") == "no_oracle" and row.get("spark_rows") is not None:
        return "rows-only"
    if row.get("err"):
        return "error"
    if row.get("hash_match"):
        return "green"
    if row.get("rows_match"):
        return "rows-only"
    return "mismatch"


def ledger() -> tuple[dict[str, int], dict[str, tuple[int, str]], list[str]]:
    """Returns (latest_green, latest_nongreen, catalog_names).

    latest_green: query -> newest round where the driver row was fully
    green (rows + schema + value-hash). latest_nongreen: query ->
    (round, kind) for queries whose NEWEST row of any kind is not
    hash-green (kind in {'error', 'rows-only'}) — these need attention,
    not just rotation.
    """
    from counsel_data_pipeline_spark.catalog import all_queries

    names = list(all_queries())
    latest_green: dict[str, int] = {}
    latest_any: dict[str, tuple[int, str]] = {}
    rounds = load_rounds()
    for rnd in sorted(rounds):
        for name, row in rounds[rnd].items():
            kind = classify(row)
            latest_any[name] = (rnd, kind)
            if kind == "green":
                latest_green[name] = rnd
    nongreen = {
        n: ra for n, ra in latest_any.items()
        if ra[1] != "green" and (n not in latest_green
                                 or latest_green[n] < ra[0])
    }
    return latest_green, nongreen, names


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--suggest", action="store_true",
                    help="print the next rotation's fill queue")
    ap.add_argument("--reserve", type=int, default=10,
                    help="window slots to hold back for new-in-round "
                         "registrations (default 10)")
    args = ap.parse_args()

    latest_green, nongreen, names = ledger()

    by_round: dict[int, int] = {}
    never: list[str] = []
    for n in names:
        if n in latest_green:
            by_round[latest_green[n]] = by_round.get(latest_green[n], 0) + 1
        else:
            never.append(n)

    print(f"catalog: {len(names)} queries")
    for rnd in sorted(by_round, reverse=True):
        print(f"  latest green = r{rnd}: {by_round[rnd]}")
    print(f"  never attested: {len(never)}")
    for n in never:
        print(f"    {n}")
    if nongreen:
        print("latest row NOT hash-green (investigate, don't just rotate):")
        for n, (rnd, kind) in sorted(nongreen.items()):
            print(f"    {n}: r{rnd} {kind}")

    if args.suggest:
        fills = sorted(
            (n for n in names if n in latest_green),
            key=lambda n: (latest_green[n], names.index(n)),
        )
        budget = WINDOW_SIZE - args.reserve - len(never)
        queue = never + fills[:max(budget, 0)]
        print(f"\nsuggested fill queue (window {WINDOW_SIZE}, "
              f"{args.reserve} slots reserved for new registrations):")
        for n in queue:
            tag = "NEVER" if n in never else f"r{latest_green[n]}"
            print(f"  {n}  [{tag}]")


if __name__ == "__main__":
    main()
