"""Compute the next round's 50-slot correctness window from the history.

The driver verifies only the FIRST 50 registry entries per round
(``plans/registry.py:WINDOW_HEAD``), under the house rotation policy:

1. never-driver-verified queries (``DEBUT_QUEUE`` + any window debut that
   failed to land) take slots first — a debut is never deferred;
2. queries whose last green row would be > STALENESS_LIMIT rounds old by
   the round AFTER next cannot defer again ("exhausted deferrals") and go
   second;
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
and the policy math.

STAGED CATCH-UP AMENDMENT (r11, after the r10 lost round): when a round
produces NO green rows (r10's CORRECTNESS file is empty — the registry
was import-dead when the driver ran), the exhausted set can exceed the
window all by itself: at r11 it is 1 debut + 95 exhausted for 50 slots,
which no single-round plan can satisfy. The amended policy:

1. the non-negotiable set is ordered debut -> changed -> exhausted,
   exhausted sorted OLDEST-LAST-GREEN-FIRST (name tiebreak) — the most
   stale verify first, not alphabetically;
2. when that set overflows the window, the head takes the first 50 in
   priority order and the remainder becomes the CARRY: pre-committed
   non-negotiable slots for the NEXT round (recorded in the registry's
   owed-set comment, enforced by tests/test_window_planning.py);
3. an overflow round is only legal with COMPENSATING EVIDENCE: a
   committed full-registry sweep artifact — ``SWEEP_SF001_r{next}.json``
   (sf0.01, the driver's own compare tier) and/or
   ``SWEEP_SF01_r{next}.json`` (sf0.1, the closing-protocol tier), both
   via tools/driver_sweep.py --json — with a green row for every
   carried query: the builder's own oracle check stands in for the
   driver row the carried query didn't get;
4. debuts + changed overflowing the window ALONE is still a hard breach
   (exit 1) — catch-up staging only applies to exhausted rotations.

With the r10 loss this projected: r11 window = 2 debuts + 1 changed + 47
oldest-stale (all 46 green-r7 + 1 green-r8), carrying ~48 green-r8; r12
window = that carry + 2 green-r9, carrying ~48 green-r9; r13 absorbed the
remaining 48 within capacity. That is exactly how r11-r13 ran — the
catch-up closed at r13 and steady state resumed under the permanent
4-round rotation (registry.py: REGISTRY_CEILING policy).
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
#: A query re-verifies against the driver at most this many rounds apart.
#: Raised 3 → 4 at r13 under the registry-growth policy (registry.py:
#: REGISTRY_CEILING): the per-round dual-tier full-registry sweep
#: artifacts are the compensating control for the extra round of driver
#: staleness, and the registry ceiling is STALENESS_LIMIT × WINDOW − 2.
STALENESS_LIMIT = 4


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
    # deferring past next_round would put the gap beyond the limit;
    # oldest-last-green-first (staged catch-up amendment, rule 1)
    exhausted = sorted(
        (
            n
            for n in registered
            if n in last_green
            and n not in changed
            and next_round - last_green[n] >= STALENESS_LIMIT
        ),
        key=lambda n: (last_green[n], n),
    )
    non_negotiable = debuts + sorted(changed - set(debuts)) + [
        n for n in exhausted if n not in changed
    ]
    rest = sorted(
        (n for n in registered if n not in set(non_negotiable)),
        key=lambda n: (last_green.get(n, 0), n),
    )
    head = (non_negotiable + rest)[:WINDOW]
    # staged catch-up (amendment, rule 2): the overflow of the
    # non-negotiable set carries to the next round as pre-committed
    # slots, legal only with the compensating full-sweep artifact
    carry = non_negotiable[WINDOW:]
    deferred = [n for n in registered if n not in set(head)]
    return {
        "next_round": next_round,
        "debuts": debuts,
        "changed": sorted(changed),
        "exhausted": [n for n in exhausted if n not in changed],
        "head": head,
        "carry": carry,
        "deferred": deferred,
        # hard breach only when debuts+changed alone exceed the window
        # (amendment, rule 4); exhausted overflow stages via `carry`
        "overflow": len(debuts) + len(changed - set(debuts)) > WINDOW,
    }


def _sweep_row_green(row: dict) -> bool:
    return (
        row.get("err") is None
        and bool(row.get("rows_match"))
        and bool(row.get("schema_match"))
        and bool(row.get("hash_match", True))
    )


def sweep_evidence(repo_root: str, next_round: int, carry: list[str]) -> tuple[bool, list[str]]:
    """Compensating-evidence check (amendment, rule 3): every carried
    query must hold a green row in a committed full-registry sweep
    artifact covering the carry period — SWEEP_SF001_r{N}.json (sf0.01,
    the tier the driver's own compare runs at) and/or
    SWEEP_SF01_r{N}.json (sf0.1, the closing-protocol tier), for either
    the catch-up round itself (``next_round``) or the round that
    incurred the carry (``next_round - 1``, whose sweep proved every
    carried query green at the moment the carry was declared). The
    fallback closes the r11-verdict "What's wrong #1" gap: without it,
    the suite went red the moment a round's CORRECTNESS file landed,
    demanding a sweep artifact that can only exist after the NEXT
    round's sweep runs.

    NEWEST VERDICT WINS (r12 advice #3): when the ``next_round``
    artifacts exist and cover a query, THEIR verdict governs — a query
    red in the newer sweep is not evidenced, no matter how green an
    older artifact says it was. The ``next_round - 1`` artifacts are a
    fallback only for queries the newer sweep doesn't cover. Within one
    round, a query present in both tiers must be green in both."""
    rounds_rows: list[dict[str, list[dict]]] = []
    for rnd in (next_round, next_round - 1):
        rows: dict[str, list[dict]] = {}
        for tier in ("SWEEP_SF001", "SWEEP_SF01"):
            path = os.path.join(repo_root, f"{tier}_r{rnd:02d}.json")
            if not os.path.exists(path):
                continue
            with open(path) as fh:
                for name, row in json.load(fh).items():
                    rows.setdefault(name, []).append(row)
        rounds_rows.append(rows)
    if not any(rounds_rows):
        return False, list(carry)
    missing = []
    for name in carry:
        rows = next((r[name] for r in rounds_rows if name in r), None)
        if rows is None or not all(_sweep_row_green(row) for row in rows):
            missing.append(name)
    return True, missing


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
    if result["carry"]:
        print(f"# STAGED CATCH-UP: {len(result['carry'])} non-negotiable "
              f"slots carry to round {result['next_round'] + 1}:")
        for name in result["carry"]:
            print(f"#   carry {name} (green r{last_green.get(name, 0)})")
        have_file, missing = sweep_evidence(
            repo_root, result["next_round"], result["carry"]
        )
        if not have_file:
            # exit 1, matching the pytest gate (r11 advice: the CLI used
            # to warn-and-exit-0 here, so running the planner standalone
            # could not enforce amendment rule 3)
            print(
                f"POLICY BREACH: no compensating-evidence artifact "
                f"committed — need SWEEP_SF001/SWEEP_SF01_r"
                f"{result['next_round'] - 1:02d} or _r{result['next_round']:02d}.json "
                "with green rows for every carried query.",
                file=sys.stderr,
            )
            return 1
        elif missing:
            print(
                f"POLICY BREACH: carried queries without green sweep "
                f"evidence: {missing}",
                file=sys.stderr,
            )
            return 1
        else:
            print("# compensating evidence OK: all carried queries green "
                  "in the committed sweep artifact.")
    if result["overflow"]:
        print(
            "POLICY BREACH: debuts + changed alone exceed the window — "
            "split debuts across rounds or shrink the registry.",
            file=sys.stderr,
        )
        return 1
    ceiling = STALENESS_LIMIT * WINDOW - 2
    if len(registered) > ceiling:
        print(
            f"POLICY BREACH: {len(registered)} registered queries exceed "
            f"the {STALENESS_LIMIT}-round-rotation ceiling of {ceiling} "
            "(registry.py: REGISTRY_CEILING) — do not debut past capacity.",
            file=sys.stderr,
        )
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
