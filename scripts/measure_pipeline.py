"""End-to-end ×10 scaling receipt for llm_pipeline_full (round-8 verdict
ask #2): the measure_joins tiling discipline applied to the flagship
pipeline instead of a single blocked join.

Corpora: sf0.01, sf0.1 (natural growth), and a ×10 tile of sf0.1 —
"more days of the same distribution": each copy shifts doc_id by a
multiple of 10 (PRESERVING the doc_id%10 bench/corpus split class) and
appends a per-copy tag token to the text, so

- within-copy exact duplicates persist (constant duplication density),
  while copies never collapse into each other's dedup groups;
- within-copy benchmark contamination persists (the 5-gram overlap
  structure is untouched — the tag only adds tail shingles unique to the
  copy), while cross-copy contamination is impossible;
- per-language token mass grows ~10× (each doc gains exactly one token),
  so the packing stage's output pack count grows ~linearly.

Per corpus this records the per-stage row counts (quality survivors,
bench size, contaminated, clean, keepers, train rows) plus the full
pipeline's result rows, wall seconds, and shuffle-write bytes (Spark UI
REST, same as measure_joins.py). The growth-shape assertions live in
tests/test_scale_joins.py::test_llm_pipeline_stage_counts_linear; this
script produces the measured curve for SCALE.md.

Usage: python scripts/measure_pipeline.py
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from functools import reduce
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from zio_analytics_spark import catalog  # noqa: E402
from zio_analytics_spark.operators import dedup, text  # noqa: E402
from zio_analytics_spark.session import get_spark  # noqa: E402
from zio_analytics_spark.sources.parquet import read_table  # noqa: E402
from zio_analytics_spark.tmpdirs import materialize_table  # noqa: E402

spark = get_spark("measure_pipeline", extra_conf={"spark.ui.enabled": "true"})


def shuffle_write_bytes() -> int:
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url) as resp:
        stages = json.load(resp)
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def tile_10x(docs):
    """Ten disjoint copies at constant duplication/contamination density:
    doc_id += i·10⁷ (multiple of 10 → same %10 split class), text gets a
    per-copy tag token (new content hash → copies don't cross-dedup; one
    extra token per doc)."""
    copies = [
        docs.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            "lang",
            F.concat(F.col("text"), F.lit(f" copytag{i}")).alias("text"),
        )
        for i in range(10)
    ]
    return materialize_table(
        reduce(lambda a, b: a.unionByName(b), copies), prefix="zas_mpipe10_"
    )


def stage_counts(docs) -> dict:
    """Per-stage row counts, computed with the SAME operator calls the
    pipeline composes (catalog.llm_pipeline — keep in sync)."""
    toks = docs.select(
        "doc_id", "lang", "text",
        F.size(text.tokens("text")).cast("long").alias("n_tokens"),
    )
    quality = toks.where(F.col("n_tokens") >= 20)
    bench = docs.where(F.col("doc_id") % 10 == 0)
    corpus = quality.where(F.col("doc_id") % 10 != 0)
    clean = dedup.decontaminate(corpus, bench, n=5).persist()
    keepers = clean.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    out = {
        "n_docs": docs.count(),
        "n_quality": quality.count(),
        "n_bench": bench.count(),
        "n_corpus": corpus.count(),
        "n_clean": clean.count(),
        "n_keepers": keepers.count(),
    }
    out["n_contaminated"] = out["n_corpus"] - out["n_clean"]
    clean.unpersist()
    return out


def measure(name: str, docs) -> dict:
    counts = stage_counts(docs)
    spark.catalog.clearCache()
    b0 = shuffle_write_bytes()
    t0 = time.time()
    n_packs = catalog.llm_pipeline(docs).count()
    rec = {
        "corpus": name,
        **counts,
        "result_rows": n_packs,
        "shuffle_mb": round((shuffle_write_bytes() - b0) / 1e6, 1),
        "sec": round(time.time() - t0, 1),
    }
    print(json.dumps(rec))
    return rec


recs = [
    measure("sf0.01", read_table(spark, "/root/testdata/sf0.01", "documents")),
    measure("sf0.1", read_table(spark, "/root/testdata/sf0.1", "documents")),
    measure("sf0.1 x10", tile_10x(read_table(spark, "/root/testdata/sf0.1", "documents"))),
]

base, big = recs[1], recs[2]
print(json.dumps({
    "x10_ratios": {
        k: round(big[k] / base[k], 2)
        for k in ("n_docs", "n_quality", "n_clean", "n_keepers",
                  "result_rows", "shuffle_mb", "sec")
        if base[k]
    }
}))
spark.stop()
