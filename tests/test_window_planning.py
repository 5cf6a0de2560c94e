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
    CHANGED_QUERIES,
    DEBUT_QUEUE,
    PLANNED_FOR_HISTORY,
    REGISTRY_CEILING,
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


def test_window_head_matches_the_planner():
    """The registry's WINDOW_HEAD must be EXACTLY the planner's output for
    the history round it was planned against (registry.PLANNED_FOR_HISTORY,
    with registry.CHANGED_QUERIES as the --changed set), so the committed
    tuple can never drift from the machine math. This generalizes the
    retired per-round carry-pinned tests (r12/r13 staged catch-up — see
    the registry's HISTORICAL note and git history at the r12 tree): when
    a NEWER CORRECTNESS file lands mid-round, the test skips until the
    builder re-plans and bumps PLANNED_FOR_HISTORY."""
    # DEBUT_QUEUE holds queries implemented AFTER the window was
    # committed — the planner could not have seen them, so the
    # recomputation excludes them (their own gate is
    # test_debut_queue_is_exactly_the_never_verified_overflow + the
    # next round's debut-first rule).
    registered = [n for n in all_queries() if n not in set(DEBUT_QUEUE)]
    latest, last_green = load_history(REPO_ROOT)
    if latest != PLANNED_FOR_HISTORY:
        import pytest

        pytest.skip(
            f"WINDOW_HEAD was planned against r{PLANNED_FOR_HISTORY} history "
            f"(history now at r{latest}) — re-plan pending"
        )
    result = plan(registered, latest, last_green, changed=set(CHANGED_QUERIES))
    assert list(result["head"]) == list(WINDOW_HEAD)
    # any carry must already hold compensating sweep evidence (amendment
    # rule 3) — steady state expects no carry at all
    if result["carry"]:
        have_file, missing = sweep_evidence(
            REPO_ROOT, result["next_round"], result["carry"]
        )
        assert have_file and not missing, (result["carry"], missing)


def test_registry_growth_policy_is_pinned():
    """The registry-growth policy decided at r13 (registry.py:
    REGISTRY_CEILING): a permanent 4-round rotation whose ceiling is
    STALENESS_LIMIT × WINDOW − 2, with the per-round dual-tier
    full-registry sweep as the compensating control. Pins (a) the policy
    constants to each other, (b) the registry size under the ceiling, and
    (c) the compensating control itself: while the registry is past the
    3-round ceiling, the committed sweep artifacts for the planned-against
    round must exist and hold a green row for EVERY registered query."""
    from window_planner import STALENESS_LIMIT

    assert STALENESS_LIMIT == 4
    assert REGISTRY_CEILING == STALENESS_LIMIT * WINDOW - 2
    registered = list(all_queries())
    assert len(registered) <= REGISTRY_CEILING, (
        f"{len(registered)} queries exceed the {STALENESS_LIMIT}-round "
        f"rotation ceiling {REGISTRY_CEILING} — shrink or re-decide the policy"
    )
    three_round_ceiling = 3 * WINDOW - 2
    if len(registered) > three_round_ceiling:
        # DEBUT_QUEUE names have no stale driver row to compensate for —
        # they are gated by the debut-first rule (next round's window)
        # instead; everything else must hold a current sweep verdict.
        covered = [n for n in registered if n not in set(DEBUT_QUEUE)]
        have_file, missing = sweep_evidence(
            REPO_ROOT, PLANNED_FOR_HISTORY + 1, covered
        )
        assert have_file, (
            "registry past the 3-round ceiling requires the per-round "
            f"dual-tier sweep artifacts for r{PLANNED_FOR_HISTORY} or "
            f"r{PLANNED_FOR_HISTORY + 1} committed as compensating control"
        )
        assert not missing, (
            f"registered queries without green sweep evidence: {missing}"
        )


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


def test_sweep_evidence_newest_verdict_wins(tmp_path):
    """r12 advice #3: a query red in the CURRENT round's committed sweep
    must not be masked by a green row in the previous round's artifact —
    the newer artifact's verdict governs for every query it covers; the
    older round is a fallback only for queries the newer one omits."""
    import json

    green = {"err": None, "rows_match": True, "schema_match": True, "hash_match": True}
    red = {"err": None, "rows_match": False, "schema_match": True, "hash_match": False}

    # q_a regressed in r13; q_b is only covered by the r12 artifact.
    (tmp_path / "SWEEP_SF01_r12.json").write_text(
        json.dumps({"q_a": green, "q_b": green})
    )
    (tmp_path / "SWEEP_SF01_r13.json").write_text(json.dumps({"q_a": red}))
    have_file, missing = sweep_evidence(str(tmp_path), 13, ["q_a", "q_b"])
    assert have_file and missing == ["q_a"]

    # Within one round, a query present in both tiers must be green in
    # BOTH — a red sf0.1 row is not excused by a green sf0.01 row.
    (tmp_path / "SWEEP_SF001_r13.json").write_text(json.dumps({"q_a": green}))
    have_file, missing = sweep_evidence(str(tmp_path), 13, ["q_a"])
    assert have_file and missing == ["q_a"]


def test_planner_respects_changed_queries():
    registered = list(all_queries())
    latest, last_green = load_history(REPO_ROOT)
    some_green = next(n for n in registered if n in last_green)
    result = plan(registered, latest, last_green, changed={some_green})
    assert some_green in result["head"]
    assert some_green in result["changed"]
