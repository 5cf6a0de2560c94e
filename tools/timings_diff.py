"""Per-query round-over-round diff of two TIMINGS_r{N}.json baselines.

The r8 verdict's calm-anchor rule: the headline bench total drifts with
host weather, so regression adjudication must be PER QUERY — a real plan
regression inflates specific queries; an environment signature inflates
everything uniformly. This tool prints every query whose ratio
(new / old) exceeds the threshold in either direction, plus the uniform
signature summary (median ratio) that distinguishes the two cases.

Usage: python tools/timings_diff.py TIMINGS_r8.json TIMINGS_r9.json [--threshold 1.5]

Exit code 1 if any query moved more than the threshold AFTER dividing
out the median ratio (i.e. a mover that host weather cannot explain) —
the signal the verdict says to bisect, not re-bank.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("old")
    parser.add_argument("new")
    parser.add_argument("--threshold", type=float, default=1.5)
    parser.add_argument(
        "--floor",
        type=float,
        default=0.25,
        help="ratio comparison requires the OLD measurement at or above "
        "this — a sub-floor denominator is jitter and would fabricate "
        "huge ratios; sub-floor-to-above-floor transitions are reported "
        "separately as absolute deltas instead",
    )
    args = parser.parse_args()

    with open(args.old) as fh:
        old = json.load(fh)["queries"]
    with open(args.new) as fh:
        new = json.load(fh)["queries"]

    shared = sorted(set(old) & set(new))
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    # a ratio is only meaningful when its DENOMINATOR is above the noise
    # floor (0.01s old vs 0.3s new is a 30x "ratio" made of jitter) AND
    # strictly positive — with --floor 0 a zero old timing must be
    # skipped, not divided by
    ratios = {
        n: new[n] / old[n]
        for n in shared
        if old[n] >= args.floor and old[n] > 0
    }
    transitions = sorted(
        (n for n in shared if old[n] < args.floor <= new[n]),
        key=lambda n: old[n] - new[n],
    )
    if not ratios:
        print("no comparable queries")
        return 0

    med = statistics.median(ratios.values())
    print(
        f"# {len(shared)} shared queries ({len(ratios)} above the "
        f"{args.floor}s floor); median ratio {med:.2f}x "
        f"(the host-weather signature — uniform inflation shows up HERE)"
    )
    if only_old:
        print(f"# dropped since old baseline: {', '.join(only_old)}")
    if only_new:
        print(f"# new since old baseline: {', '.join(only_new)}")

    if transitions:
        print(
            "# sub-floor → above-floor transitions (absolute deltas; the "
            "old side is jitter, so no ratio is computed):"
        )
        for name in transitions:
            print(
                f"#   {name}: {old[name]:.3f}s → {new[name]:.3f}s "
                f"(+{new[name] - old[name]:.3f}s)"
            )

    movers = []
    for name, r in sorted(ratios.items(), key=lambda kv: -kv[1]):
        adj = r / med  # divide out the uniform signature
        if adj >= args.threshold or adj <= 1 / args.threshold:
            movers.append((name, r, adj))
    if not movers:
        print(f"no per-query mover beyond {args.threshold}x after the "
              "median adjustment — round-over-round clean")
        return 0
    print(f"{'query':34} {'old':>8} {'new':>8} {'ratio':>7} {'adj':>7}")
    for name, r, adj in movers:
        print(
            f"{name:34} {old[name]:8.3f} {new[name]:8.3f} "
            f"{r:6.2f}x {adj:6.2f}x"
        )
    print(
        f"{len(movers)} mover(s) beyond {args.threshold}x after dividing "
        "out the median — isolate and re-measure each before attributing"
    )
    return 1


if __name__ == "__main__":
    sys.exit(main())
