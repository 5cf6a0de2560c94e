"""Window-rotation bookkeeping, cross-checked against the driver history.

The 50-slot correctness window's rotation math was maintained by hand in
registry comments until r8 (and the r7 advisor caught an off-by-one in
it). These tests pin the machine-readable bookkeeping instead:

- ``DEBUT_QUEUE`` must contain EXACTLY the registered queries that have
  never had a green driver row and are not in the current window — a
  query implemented after the window filled can't silently skip its debut
  (the generalization of the MUST_VERIFY gate to future rounds);
- the planner's proposed next window must satisfy the policy: every
  debut and every exhausted deferral inside, within capacity.

No Spark session needed — this is pure bookkeeping over the JSON history.
"""

from __future__ import annotations

import os
import sys

from data_engineering_datawarehousingandetlpipeline_spark.plans import all_queries
from data_engineering_datawarehousingandetlpipeline_spark.plans.registry import (
    DEBUT_QUEUE,
    R12_CARRY,
    R13_CARRY,
    WINDOW_HEAD,
)

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)
from window_planner import WINDOW, load_history, plan, sweep_evidence  # noqa: E402

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_debut_queue_is_exactly_the_never_verified_overflow():
    registered = set(all_queries())
    latest, last_green = load_history(REPO_ROOT)
    assert latest >= 7  # sanity: the history files are present
    never = registered - set(last_green)
    assert set(DEBUT_QUEUE) == never - set(WINDOW_HEAD), (
        "DEBUT_QUEUE out of sync with the driver history: a new query "
        "must be queued (or windowed) the moment it registers"
    )
    assert not set(DEBUT_QUEUE) & set(WINDOW_HEAD)
    assert set(DEBUT_QUEUE) <= registered


def test_planner_window_satisfies_the_rotation_policy():
    """The staged-catch-up amendment (r10 lost round; window_planner.py
    docstring): an exhausted set larger than the window is no longer a
    breach by itself — the head takes the first 50 in priority order
    (debut -> changed -> oldest-last-green-first) and the remainder
    CARRIES, legal only with committed full-sweep compensating evidence
    for every carried query. Debuts+changed alone overflowing stays a
    hard breach."""
    registered = list(all_queries())
    latest, last_green = load_history(REPO_ROOT)
    result = plan(registered, latest, last_green, changed=set())
    head = result["head"]
    assert len(head) == WINDOW
    assert len(set(head)) == WINDOW
    assert not result["overflow"], (
        f"debuts + changed alone exceed the {WINDOW}-slot window: "
        f"{len(result['debuts'])} debuts — a hard policy breach"
    )
    # every debut is in; no debut is ever deferred or carried
    missing_debuts = set(result["debuts"]) - set(head)
    assert not missing_debuts, missing_debuts
    # the carry (if any) is exactly the exhausted overflow, and it must
    # hold the NEWEST-green exhausted queries (the head keeps the oldest)
    if result["carry"]:
        assert set(result["carry"]) <= set(result["exhausted"])
        newest_in_head = max(
            last_green[n] for n in head if n in result["exhausted"]
        )
        oldest_carried = min(last_green[n] for n in result["carry"])
        assert oldest_carried >= newest_in_head, (
            "carry must defer the LEAST-stale exhausted queries"
        )
        # compensating evidence: the committed sweep artifact must hold a
        # green row for every carried query
        have_file, missing = sweep_evidence(
            REPO_ROOT, result["next_round"], result["carry"]
        )
        assert have_file, (
            f"staged catch-up requires SWEEP_SF01_r{result['next_round']:02d}.json "
            "committed as compensating evidence for the carried queries"
        )
        assert not missing, (
            f"carried queries without green sweep evidence: {missing}"
        )
    else:
        # steady state: every exhausted deferral fits the window
        missing_exhausted = set(result["exhausted"]) - set(head)
        assert not missing_exhausted, missing_exhausted
    # rotation slots go deepest-staleness-first: nothing deferred (or
    # carried) may be STALER than a non-debut rotation that made the window
    rotations = [n for n in head if n in last_green]
    if rotations and result["deferred"]:
        deferred_older = [
            n
            for n in result["deferred"]
            if last_green.get(n, 0) < min(last_green[n] for n in rotations)
        ]
        assert not deferred_older, deferred_older


def test_registry_r12_carry_matches_the_planner():
    """R12_CARRY (the pre-committed staged-catch-up slots in the registry)
    must be exactly the planner's computed carry for the round the history
    currently points at, so the hand-maintained tuple can never drift from
    the machine math. Skips once the r11 history lands (the carry then
    belongs to the NEXT round's plan and rotates into WINDOW_HEAD)."""
    registered = list(all_queries())
    latest, last_green = load_history(REPO_ROOT)
    if latest != 10:
        import pytest

        pytest.skip("R12_CARRY is pinned to the r11 plan (history at r10)")
    result = plan(registered, latest, last_green, changed={"incremental_distinct"})
    assert tuple(sorted(result["carry"])) == tuple(sorted(R12_CARRY))
    assert list(result["head"]) == list(WINDOW_HEAD)


def test_registry_r13_carry_matches_the_planner():
    """R13_CARRY (the final staging of the r10 catch-up) must be exactly
    the planner's computed carry for the r12 plan, and the r12 window
    must match WINDOW_HEAD. Skips once the r12 history lands."""
    registered = list(all_queries())
    latest, last_green = load_history(REPO_ROOT)
    if latest != 11:
        import pytest

        pytest.skip("R13_CARRY is pinned to the r12 plan (history at r11)")
    result = plan(registered, latest, last_green, changed=set())
    assert tuple(sorted(result["carry"])) == tuple(sorted(R13_CARRY))
    assert list(result["head"]) == list(WINDOW_HEAD)


def test_sweep_evidence_accepts_the_carry_incurring_rounds_sweep(tmp_path):
    """r11 verdict "What's wrong #1": the evidence check used to demand
    SWEEP_*_r{N+1}.json the moment CORRECTNESS_r{N}.json landed — an
    artifact that can only exist after round N+1's sweep runs — so
    `pytest tests/` opened every carry round red. The fix: the sweep
    committed for the carry-incurring round (N, whose full-registry run
    proved every carried query green when the carry was declared) is
    valid compensating evidence until the round-N+1 sweep exists."""
    import json

    green_row = {"err": None, "rows_match": True, "schema_match": True, "hash_match": True}
    red_row = {"err": None, "rows_match": False, "schema_match": True, "hash_match": False}

    # Only the round-12 (carry-incurring) sweep exists; round-13 doesn't.
    (tmp_path / "SWEEP_SF01_r12.json").write_text(
        json.dumps({"q_a": green_row, "q_b": green_row})
    )
    have_file, missing = sweep_evidence(str(tmp_path), 13, ["q_a", "q_b"])
    assert have_file and not missing

    # A carried query that is NOT green in any accepted artifact still fails.
    (tmp_path / "SWEEP_SF01_r12.json").write_text(
        json.dumps({"q_a": green_row, "q_b": red_row})
    )
    have_file, missing = sweep_evidence(str(tmp_path), 13, ["q_a", "q_b"])
    assert have_file and missing == ["q_b"]

    # No artifact for either round at all -> not evidenced.
    have_file, missing = sweep_evidence(str(tmp_path), 15, ["q_a"])
    assert not have_file and missing == ["q_a"]


def test_planner_respects_changed_queries():
    registered = list(all_queries())
    latest, last_green = load_history(REPO_ROOT)
    some_green = next(n for n in registered if n in last_green)
    result = plan(registered, latest, last_green, changed={some_green})
    assert some_green in result["head"]
    assert some_green in result["changed"]
