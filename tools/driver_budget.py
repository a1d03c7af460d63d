#!/usr/bin/env python
"""Simulate the correctness driver's per-round row budget.

The driver records ~50 rows per round, taken in ``plans.ordered_queries()``
order (never-recorded queries first, then stalest round first; oracled
before rows-only within each tier). Run this BEFORE registering new
queries: every new registry entry consumes one slot ahead of every stale
row, so over-adding in one round silently starves the freshness rotation.

Run: ``python tools/driver_budget.py [budget]`` (default 50).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    budget = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    import momyre_spark.plans as plans

    plans.load_all()
    recorded: dict[str, int] = {}
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for f in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        for k in json.load(open(f)):
            recorded[k] = max(recorded.get(k, 0), rnd)
    ordered = list(plans.ordered_queries())
    head = ordered[:budget]
    tiers: dict[int, list[str]] = {}
    for n in head:
        tiers.setdefault(recorded.get(n, 0), []).append(n)
    print(f"registry: {len(ordered)} queries, {len(plans.ORACLES)} oracled")
    print(f"next-round budget ({budget} rows):")
    for t in sorted(tiers):
        label = "never recorded" if t == 0 else f"r{t:02d}-vintage"
        print(f"  {label}: {len(tiers[t])}")
        if t != 0:
            for n in tiers[t]:
                print(f"    {n}")
    stale_out = [
        (n, recorded[n])
        for n in ordered[budget:]
        if n in recorded
    ]
    if stale_out:
        oldest = min(r for _, r in stale_out)
        n_old = sum(1 for _, r in stale_out if r == oldest)
        print(
            f"outside the budget: {len(stale_out)} recorded rows "
            f"(oldest tier r{oldest:02d}: {n_old})"
        )
    spare = budget - len(head)
    if spare:
        print(f"unused budget: {spare}")
    staged = sorted(plans.staged_queries())
    if staged:
        print(
            f"staged (unregistered) queue: {len(staged)} — each consumes "
            "one never-recorded slot the round it registers:"
        )
        for n in staged:
            print(f"    {n}")


if __name__ == "__main__":
    main()
