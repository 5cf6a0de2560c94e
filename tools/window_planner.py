"""Compute the next round's 50-slot correctness window from the history.

The driver verifies only the FIRST 50 registry entries per round
(``plans/registry.py:WINDOW_HEAD``), under the house rotation policy:

1. never-driver-verified queries (``DEBUT_QUEUE`` + any window debut that
   failed to land) take slots first — a debut is never deferred;
2. queries whose last green row would be > 3 rounds old by the round
   AFTER next cannot defer again ("exhausted deferrals") and go second;
3. remaining slots go to the queries with the OLDEST last-green round
   (deepest-staleness-first), name as the deterministic tiebreak.

This has been hand-computed in registry comments each round; the r7
advisor caught an off-by-one in that hand math, which is exactly the
error class a 20-line program doesn't make. Run after a round's
``CORRECTNESS_r{N}.json`` lands:

    python tools/window_planner.py            # plan round N+1
    python tools/window_planner.py --changed asof_last_error ...

``--changed`` marks queries whose implementation changed this round —
they re-verify regardless of green history (the planner cannot see the
diff; the builder supplies them, and CI's MUST_VERIFY gate enforces the
outcome either way).

Output: the proposed WINDOW_HEAD tuple (paste-ready), the deferral list,
and the policy math. Exit code 1 if the non-negotiable set alone
overflows 50 slots (policy breach — shrink the registry or split debuts
across rounds).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineering_datawarehousingandetlpipeline_spark.plans import all_queries

WINDOW = 50
STALENESS_LIMIT = 3  # a query re-verifies at most this many rounds apart


def load_history(repo_root: str) -> tuple[int, dict[str, int]]:
    """(latest round seen, name -> last round with a fully-green row)."""
    last_green: dict[str, int] = {}
    latest = 0
    for path in glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json")):
        match = re.search(r"_r0*(\d+)\.json$", path)
        if not match:
            continue
        rnd = int(match.group(1))
        latest = max(latest, rnd)
        with open(path) as fh:
            rows = json.load(fh)
        for name, row in rows.items():
            if (
                row.get("err") is None
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match", True)
            ):
                last_green[name] = max(last_green.get(name, 0), rnd)
    return latest, last_green


def plan(
    registered: list[str],
    latest: int,
    last_green: dict[str, int],
    changed: set[str],
) -> dict:
    next_round = latest + 1
    debuts = sorted(n for n in registered if n not in last_green)
    # deferring past next_round would put the gap beyond the limit
    exhausted = sorted(
        n
        for n in registered
        if n in last_green
        and n not in changed
        and next_round - last_green[n] >= STALENESS_LIMIT
    )
    non_negotiable = debuts + sorted(changed - set(debuts)) + [
        n for n in exhausted if n not in changed
    ]
    rest = sorted(
        (n for n in registered if n not in set(non_negotiable)),
        key=lambda n: (last_green.get(n, 0), n),
    )
    head = (non_negotiable + rest)[:WINDOW]
    deferred = [n for n in registered if n not in set(head)]
    return {
        "next_round": next_round,
        "debuts": debuts,
        "changed": sorted(changed),
        "exhausted": [n for n in exhausted if n not in changed],
        "head": head,
        "deferred": deferred,
        "overflow": len(non_negotiable) > WINDOW,
    }


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--changed", nargs="*", default=[])
    args = parser.parse_args()

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    registered = list(all_queries())
    unknown = set(args.changed) - set(registered)
    if unknown:
        raise SystemExit(f"--changed names not registered: {sorted(unknown)}")
    latest, last_green = load_history(repo_root)
    result = plan(registered, latest, last_green, set(args.changed))

    print(f"# window plan for round {result['next_round']}")
    print(
        f"# debuts={len(result['debuts'])} changed={len(result['changed'])} "
        f"exhausted={len(result['exhausted'])} "
        f"rotations={WINDOW - len(result['debuts']) - len(result['changed']) - len(result['exhausted'])} "
        f"deferred={len(result['deferred'])} (registry={len(registered)})"
    )
    print("WINDOW_HEAD: tuple[str, ...] = (")
    for name in result["head"]:
        print(f'    "{name}",')
    print(")")
    print("# deferred (oldest green shown first):")
    for name in sorted(
        result["deferred"], key=lambda n: (last_green.get(n, 0), n)
    ):
        print(f"#   {name} (green r{last_green.get(name, 0)})")
    if result["overflow"]:
        print(
            "POLICY BREACH: non-negotiable set exceeds the window — "
            "split debuts across rounds or shrink the registry.",
            file=sys.stderr,
        )
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
