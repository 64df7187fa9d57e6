"""Capture .explain("formatted") for catalog queries into plans/<round>/.

Usage: python scripts/capture_plans.py <outdir-suffix> [query ...]
       python scripts/capture_plans.py r16 --headline            # all bench=True
       python scripts/capture_plans.py r16 --headline --tag after

Writes plans/<round>/<query>_<tag>.txt (tag defaults to "before"; pass
--tag after once an optimization landed). The judge reads these files to
check plan claims (Exchange count, join strategy, PushedFilters) against
OPTIMIZATION_<round>.md — capture from the same SF dir the bench uses.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zio_analytics_spark import catalog  # noqa: E402
from zio_analytics_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    rnd = args.pop(0)
    tag = "before"
    if "--tag" in args:
        i = args.index("--tag")
        tag = args[i + 1]
        del args[i : i + 2]
    headline = "--headline" in args
    if headline:
        args.remove("--headline")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", rnd)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("capture_plans")
    names = list(catalog.bench_queries()) if headline else []
    names += args
    fns = catalog.queries()
    for name in names:
        df = fns[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
