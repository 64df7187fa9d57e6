"""×10 scaling receipt for llm_pipeline_v3 (the round-10 HTML capstone).

Natural corpus growth (sf0.01 → sf0.1 is ×10 documents of the same
distribution) through every stage of the HTML-first pipeline: synthesized
shells → html_text_expr extraction → length gate → exact dedup on the
EXTRACTED text → 90/10 content-hash split → per-(lang, split) token
totals. Records per-stage row counts and the full entry's wall seconds at
both SFs; the growth ratios are the receipt that no stage accumulates
super-linear work (extraction and gating are map-only; the dedup
aggregate and the split are content-keyed, so their output grows with
distinct content, not quadratically).

Usage: python scripts/measure_html_pipeline.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from zio_analytics_spark import catalog  # noqa: E402
from zio_analytics_spark.operators.html import html_text_expr  # noqa: E402
from zio_analytics_spark.session import get_spark  # noqa: E402
from zio_analytics_spark.sources.parquet import read_table  # noqa: E402


def stage_counts(spark, sf_dir: str) -> dict:
    docs = read_table(spark, sf_dir, "documents")
    synth = docs.select(
        "doc_id",
        "lang",
        F.concat(
            F.lit(
                "<html><head><title>Corpus page</title><style>a > b { x: y; }"
                '</style><script>if (i < 2 && j > 1) { t("'
            ),
            F.col("lang"),
            F.lit('"); }</script></head><body><!-- crawl --><h1>&#91;'),
            F.col("lang"),
            F.lit("&#93;</h1><p>"),
            F.replace(F.col("text"), F.lit("e"), F.lit("&#101;")),
            F.lit("</p><footer>&copy; &alpha; corp &amp;amp; co&nbsp;2026</footer></body></html>"),
        ).alias("html"),
    )
    ext = synth.select("doc_id", "lang", html_text_expr(F.col("html")).alias("text"))
    gate = ext.where(F.length("text") >= 40)
    keepers = gate.groupBy("text").agg(F.min("doc_id").alias("__kid"))
    kept = gate.join(keepers, "text").where(F.col("doc_id") == F.col("__kid"))
    out = {
        "docs": docs.count(),
        "extracted": ext.count(),
        "gated": gate.count(),
        "keepers": kept.count(),
    }
    t0 = time.perf_counter()
    catalog.queries()["llm_pipeline_v3"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    out["entry_wall_sec"] = round(time.perf_counter() - t0, 3)
    return out


def main() -> None:
    spark = get_spark("measure-html-pipeline")
    spark.range(1000).selectExpr("sum(id)").collect()
    rows = {}
    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        rows[sf_dir] = stage_counts(spark, sf_dir)
        print(f"# {sf_dir}: {rows[sf_dir]}", file=sys.stderr)
    a, b = rows["/root/testdata/sf0.01"], rows["/root/testdata/sf0.1"]
    growth = {
        k: round(b[k] / a[k], 3) for k in ("docs", "extracted", "gated", "keepers")
    }
    growth["entry_wall_ratio"] = round(b["entry_wall_sec"] / a["entry_wall_sec"], 3)
    print(json.dumps({"stages": rows, "growth_x": growth}))


if __name__ == "__main__":
    main()
