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
    python scripts/bench_compare.py --at-risk NEW.json [--remeasure] [--at-risk-sec 10]

AT-RISK MODE (round-10, the r9 lesson): a 13 s committed median against a
15 s driver gate ships a coin flip — r9's unigram_segment measured 13.2 s
on the builder's quiet host and 23.1 s in the driver's run (rc=1). Any
entry whose committed normalized time exceeds 2/3 of the budget (10 s) is
therefore AT RISK and must be adjudicated before round close:
``--at-risk`` lists them; ``--remeasure`` re-runs each ISOLATED (one warm
discard + 3 timed reps, medians are the truth — the BENCH_COMPARE_r8_r9
burst-adjudication protocol) and writes the committed record
``BENCH_ATRISK.json`` that tests/test_bench_guard.py gates on.

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
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def normalized_entries(path: str) -> dict[str, float]:
    with open(path) as f:
        d = json.load(f)
    if "all_queries_normalized" in d:
        return dict(d["all_queries_normalized"])
    slow = float(d.get("host_slowdown", 1.0)) or 1.0
    return {n: t / slow for n, t in d.get("all_queries", {}).items()}


def raw_entries(path: str) -> dict[str, float]:
    """RAW per-entry seconds — PRIMARY since round 13: the fixed-work CPU
    probe mis-normalizes IO-side contention in both directions (r11 read
    0.81x, r12 1.21x on unchanged code), so normalized values are
    advisory context, never the comparison metric."""
    with open(path) as f:
        d = json.load(f)
    return dict(d.get("all_queries", {}))


def at_risk_entries(path: str, threshold: float) -> dict[str, float]:
    """At-risk = over threshold on EITHER raw (primary) or normalized
    (advisory) — the conservative superset; adjudication is always the
    isolated raw re-measure."""
    raw = raw_entries(path)
    norm = normalized_entries(path)
    return {
        n: max(raw.get(n, 0.0), norm.get(n, 0.0))
        for n in set(raw) | set(norm)
        if max(raw.get(n, 0.0), norm.get(n, 0.0)) > threshold
    }


def remeasure(names: list[str], sf_dir: str, reps: int = 3) -> dict:
    """Isolated warm re-measure: per entry, one discard rep (fresh-session
    mapInPandas worker spawn is ~7 s of session cost, never entry cost)
    then ``reps`` timed reps; the MEDIAN is the committed adjudication
    value. Cache cleared between reps so one rep cannot subsidize the
    next."""
    import statistics
    import time

    from zio_analytics_spark import catalog
    from zio_analytics_spark.session import get_spark

    spark = get_spark("bench_atrisk")
    spark.range(1000).selectExpr("sum(id)").collect()
    out = {}
    qs = catalog.queries()
    for name in names:
        fn = qs[name]
        times = []
        for rep in range(reps + 1):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            spark.catalog.clearCache()
            if rep:  # rep 0 is the warm-up discard
                times.append(dt)
        out[name] = {"median": round(statistics.median(times), 3), "reps": times}
        print(f"# at-risk remeasure {name}: median {out[name]['median']}s "
              f"reps {times}", file=sys.stderr)
    return out


def run_at_risk(args) -> None:
    threshold = args.at_risk_sec
    risky = at_risk_entries(args.new, threshold)
    print(f"# at-risk entries (> {threshold}s normalized) in {args.new}: "
          f"{len(risky)}")
    for n, t in sorted(risky.items(), key=lambda x: -x[1]):
        print(f"  {n}: {t:.3f}s")
    if not args.remeasure:
        return
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    measured = remeasure(sorted(risky), sf_dir)
    record = {
        "source": args.new,
        "threshold_sec": threshold,
        "sf_dir": sf_dir,
        "measured": measured,
    }
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_ATRISK.json",
    )
    with open(out_path, "w") as f:
        json.dump(record, f, indent=1)
    print(f"# wrote {out_path}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old", nargs="?")
    ap.add_argument("new")
    ap.add_argument("--ratio", type=float, default=1.3)
    ap.add_argument("--floor", type=float, default=0.5,
                    help="ignore entries faster than this in both rounds")
    ap.add_argument("--at-risk", action="store_true",
                    help="list entries over --at-risk-sec in NEW (single file)")
    ap.add_argument("--remeasure", action="store_true",
                    help="with --at-risk: isolated 3-rep re-measure, write "
                         "BENCH_ATRISK.json")
    ap.add_argument("--at-risk-sec", type=float, default=10.0,
                    help="at-risk threshold (2/3 of the 15s budget)")
    args = ap.parse_args()
    if args.at_risk:
        run_at_risk(args)
        sys.exit(0)
    if args.old is None:
        ap.error("OLD and NEW are both required outside --at-risk mode")
    # RAW is the primary comparison metric (round-13 verdict #7); the
    # normalized ratio prints alongside as advisory context only.
    old = raw_entries(args.old) or normalized_entries(args.old)
    new = raw_entries(args.new) or normalized_entries(args.new)
    old_n = normalized_entries(args.old)
    new_n = normalized_entries(args.new)
    regressions, improvements = [], []
    for name in sorted(set(old) & set(new)):
        a, b = old[name], new[name]
        if max(a, b) < args.floor:
            continue
        r = b / a if a > 0 else float("inf")
        rn = (new_n.get(name, 0) / old_n[name]) if old_n.get(name) else None
        if r > args.ratio:
            regressions.append((r, name, a, b, rn))
        elif r < 1.0 / args.ratio:
            improvements.append((r, name, a, b, rn))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    print(f"# bench_compare {args.old} -> {args.new} "
          f"(RAW ratio>{args.ratio}, floor {args.floor}s; "
          f"normalized advisory in parens)")
    print(f"# common {len(set(old) & set(new))}, "
          f"added {len(added)}, removed {len(removed)}")
    if regressions:
        print(f"REGRESSIONS ({len(regressions)}):")
        for r, name, a, b, rn in sorted(regressions, reverse=True):
            extra = f", norm {rn:.2f}x" if rn else ""
            print(f"  {name}: {a:.3f}s -> {b:.3f}s  ({r:.2f}x raw{extra})")
    else:
        print("REGRESSIONS: none")
    if improvements:
        print(f"improvements ({len(improvements)}):")
        for r, name, a, b, rn in sorted(improvements):
            extra = f", norm {rn:.2f}x" if rn else ""
            print(f"  {name}: {a:.3f}s -> {b:.3f}s  ({r:.2f}x raw{extra})")
    if added:
        print("added:", " ".join(added))
    if removed:
        print("removed:", " ".join(removed))
    sys.exit(0)


if __name__ == "__main__":
    main()
