"""At-risk bench guard (round-9 verdict #6 — the r9 lesson).

A 13 s committed quiet-host median against the driver's 15 s per-entry
budget ships a coin flip: r9's unigram_segment measured 13.2 s on the
builder's run and 23.1 s in the driver's (rc=1). The guard: every entry
whose committed normalized time exceeds 2/3 of the budget (10 s) is AT
RISK and must carry an isolated 3-rep re-measure (BENCH_ATRISK.json,
written by ``scripts/bench_compare.py --at-risk --remeasure``) whose warm
MEDIAN is back under the threshold — medians are the adjudication truth
(single-shot co-tenant bursts spike 1-2 random entries 10-20x; see
BENCH_COMPARE_r8_r9.md), so the gate is on the re-measure, not the
burst-prone sweep value.
"""

from __future__ import annotations

import json
import os

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUDGET_SEC = 15.0
AT_RISK_SEC = BUDGET_SEC * 2 / 3


def _normalized_entries(d: dict) -> dict[str, float]:
    if "all_queries_normalized" in d:
        return dict(d["all_queries_normalized"])
    slow = float(d.get("host_slowdown", 1.0)) or 1.0
    return {n: t / slow for n, t in d.get("all_queries", {}).items()}


def test_no_unadjudicated_at_risk_entries():
    full_path = os.path.join(ROOT, "BENCH_FULL.json")
    if not os.path.exists(full_path):
        pytest.skip("no committed BENCH_FULL.json")
    with open(full_path) as f:
        full = json.load(f)
    risky = {
        n: t for n, t in _normalized_entries(full).items() if t > AT_RISK_SEC
    }
    if not risky:
        return  # nothing near the budget: the guard holds trivially
    atrisk_path = os.path.join(ROOT, "BENCH_ATRISK.json")
    assert os.path.exists(atrisk_path), (
        f"entries over {AT_RISK_SEC:.1f}s in BENCH_FULL.json with no "
        f"committed re-measure (run scripts/bench_compare.py --at-risk "
        f"BENCH_FULL.json --remeasure): {sorted(risky)}"
    )
    with open(atrisk_path) as f:
        adjudicated = json.load(f)["measured"]
    for name, t in sorted(risky.items()):
        assert name in adjudicated, (
            f"{name} at {t:.1f}s has no isolated re-measure in "
            f"BENCH_ATRISK.json"
        )
        median = adjudicated[name]["median"]
        assert median <= AT_RISK_SEC, (
            f"{name}: isolated warm median {median}s exceeds the at-risk "
            f"threshold {AT_RISK_SEC:.1f}s — a real regression, not noise; "
            f"fix the entry (the r9 unigram_segment class)"
        )
