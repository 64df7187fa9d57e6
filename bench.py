"""Benchmark harness: runs the headline catalog queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "total_query_sec", "value": N, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": ...}

Each query is executed to completion via the ``noop`` sink — unlike
``count()``, which would let Catalyst prune projected columns and skip the
actual work, noop forces every output column to be computed without paying
driver-transfer costs. Timings exclude session startup but include Catalyst
planning, shuffles, and execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from zio_analytics_spark import catalog  # noqa: E402
from zio_analytics_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    # Warm the JVM/codegen paths once with a trivial action so the first
    # timed query doesn't pay one-time init costs, and warm the parquet
    # datasource path (reader codegen, filesystem metadata) with a small
    # real scan — otherwise the first timed query absorbs ~1 s of one-time
    # scan-pipeline compilation that belongs to session startup, not to it.
    from zio_analytics_spark.sources.parquet import read_table

    spark.range(1000).selectExpr("sum(id)").collect()
    read_table(spark, sf_dir, "region").collect()
    read_table(spark, sf_dir, "lineitem").limit(1000).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    for name, fn in catalog.bench_queries().items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
