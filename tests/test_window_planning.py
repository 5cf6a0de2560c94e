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
    WINDOW_HEAD,
)

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)
from window_planner import WINDOW, load_history, plan  # noqa: E402

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
    registered = list(all_queries())
    latest, last_green = load_history(REPO_ROOT)
    result = plan(registered, latest, last_green, changed=set())
    head = result["head"]
    assert len(head) == WINDOW
    assert len(set(head)) == WINDOW
    assert not result["overflow"], (
        f"non-negotiable set exceeds the {WINDOW}-slot window: "
        f"{len(result['debuts'])} debuts + {len(result['exhausted'])} "
        "exhausted deferrals — the registry has outgrown the policy"
    )
    # every debut is in; no debut is ever deferred
    missing_debuts = set(result["debuts"]) - set(head)
    assert not missing_debuts, missing_debuts
    # every exhausted deferral is in
    missing_exhausted = set(result["exhausted"]) - set(head)
    assert not missing_exhausted, missing_exhausted
    # rotation slots go deepest-staleness-first: no deferred query may be
    # STALER than a non-debut rotation that made the window
    rotations = [n for n in head if n in last_green]
    if rotations and result["deferred"]:
        # nothing deferred may be staler than a rotation that made the
        # window (deepest-staleness-first fill)
        deferred_older = [
            n
            for n in result["deferred"]
            if last_green.get(n, 0) < min(last_green[n] for n in rotations)
        ]
        assert not deferred_older, deferred_older


def test_planner_respects_changed_queries():
    registered = list(all_queries())
    latest, last_green = load_history(REPO_ROOT)
    some_green = next(n for n in registered if n in last_green)
    result = plan(registered, latest, last_green, changed={some_green})
    assert some_green in result["head"]
    assert some_green in result["changed"]
