"""Web-scrape ingest tour (round-10 surface).

Run: python examples/web_scrape_tour.py [sf_dir]

The round-10 lanes, composed in the order a crawl pipeline runs them —
the pipeline now STARTS where a web scrape starts:

1. UTF-8 gate: is_valid_utf8 over raw bytes (text_utf8_validate shape) —
   reject undecodable payloads before any string operator runs.
2. ENCODING repair: cleaning.fix_encoding — CP1252-in-UTF-8 mojibake
   ('cafÃ©' → 'café', 'itâ€™s' → 'it's') inverted by pure Column HOFs.
3. HTML → text: operators/html.py — comments/script/style stripped with
   contents, tags to whitespace, entities decoded, whitespace collapsed;
   one codegen chain, zero UDFs.
4. Dedup on the EXTRACTED text + content-hash split + token totals —
   the llm_pipeline_v3 capstone flow.
5. Image sidecar: EXIF-orientation-normalized aHash (a rotated phone
   photo fingerprints identically to its upright duplicate) and the
   composited view of an optimized (sub-rectangle, transparent,
   disposal-2) animated GIF.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from zio_analytics_spark.operators.cleaning import fix_encoding  # noqa: E402
from zio_analytics_spark.operators.html import html_extract_text  # noqa: E402
from zio_analytics_spark.operators.jpeg import (  # noqa: E402
    encode_exif_app1,
    encode_jpeg,
    insert_app1,
)
from zio_analytics_spark.operators.multimodal import (  # noqa: E402
    decode_gif_composited,
    encode_gif_animation,
    perceptual_ahash,
)
from zio_analytics_spark.operators.splits import hash_split  # noqa: E402
from zio_analytics_spark.session import get_spark  # noqa: E402
from zio_analytics_spark.sources.parquet import read_table  # noqa: E402


def main(sf_dir: str) -> None:
    spark = get_spark(
        "web-scrape-tour", extra_conf={"spark.sql.shuffle.partitions": "8"}
    )
    docs = read_table(spark, sf_dir, "documents").limit(200)

    # -- 1. the UTF-8 gate over raw bytes ---------------------------------
    payload = F.concat(
        F.encode(F.col("text"), "UTF-8"),
        F.when(F.col("doc_id") % 7 == 0, F.lit(bytes([0xC3, 0x28])))  # invalid
        .otherwise(F.lit(b"")),
    )
    gated = docs.select("doc_id", "lang", "text", payload.alias("raw"))
    gated = gated.where(F.is_valid_utf8(F.col("raw")))
    print("utf8 gate kept:", gated.count(), "of 200")

    # -- 2. encoding repair on planted mojibake ---------------------------
    corrupted = gated.select(
        "doc_id",
        "lang",
        F.concat(
            F.replace(F.col("text"), F.lit("a"), F.lit("Ã¡")),
            F.lit(" â€œquotedâ€¦ itâ€™s Â°C"),
        ).alias("text"),
    )
    repaired = fix_encoding(corrupted).join(
        gated.select("doc_id", "lang"), "doc_id"
    )
    repaired.orderBy("doc_id").select("doc_id", "n_repaired", "text").show(
        3, truncate=60
    )

    # -- 3. HTML -> text --------------------------------------------------
    shells = repaired.select(
        "doc_id",
        "lang",
        F.concat(
            F.lit("<html><head><style>a > b { x: y; }</style>"
                  '<script>if (i < 2 && j > 1) { t(); }</script></head>'
                  "<body><!-- crawl --><p>"),
            F.col("text"),
            F.lit("</p></body></html>"),
        ).alias("html"),
    )
    extracted = html_extract_text(shells).join(
        repaired.select("doc_id", "lang"), "doc_id"
    )
    extracted.orderBy("doc_id").select("doc_id", "n_chars", "text").show(
        3, truncate=60
    )

    # -- 4. dedup on extracted text + split + token totals ----------------
    keepers = extracted.groupBy("text").agg(F.min("doc_id").alias("__kid"))
    deduped = extracted.join(keepers, "text").where(
        F.col("doc_id") == F.col("__kid")
    )
    split = hash_split(deduped, {"train": 0.9, "val": 0.1}, on="text", salt="tour")
    split.groupBy("lang", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("n_tokens"),
    ).orderBy("lang", "split").show()

    # -- 5a. EXIF-orientation-normalized aHash ----------------------------
    Q8 = np.full((8, 8), 8)
    img = np.zeros((16, 16), dtype=np.uint8)
    img[:8, :8], img[:8, 8:], img[8:, :8], img[8:, 8:] = 10, 80, 160, 240
    upright = encode_jpeg(img, quant_luma=Q8)
    rotated = insert_app1(
        encode_jpeg(np.ascontiguousarray(np.rot90(img, k=1)), quant_luma=Q8),
        encode_exif_app1(orientation=6, make="tourcam"),
    )
    pair = spark.createDataFrame(
        [(1, bytearray(upright)), (2, bytearray(rotated))],
        "doc_id long, payload binary",
    )
    hashes = perceptual_ahash(pair).orderBy("doc_id").collect()
    print("upright ahash:", hashes[0]["ahash"])
    print("rotated+EXIF :", hashes[1]["ahash"], "(identical — dedup collides)")

    # -- 5b. optimized-GIF compositing ------------------------------------
    pal = [(i, i, i) for i in range(256)]
    gif = encode_gif_animation(
        8, 6,
        [
            {"index_of": lambda x, y: 30, "delay_cs": 5},
            {"index_of": lambda x, y: 200 if x == 0 else 31, "delay_cs": 5,
             "left": 3, "top": 2, "width": 2, "height": 2,
             "disposal": 2, "transparent": 31},
            {"index_of": lambda x, y: 90, "delay_cs": 5},
        ],
        pal,
        bg_index=7,
    )
    frames = decode_gif_composited(gif)
    for k, f in enumerate(frames):
        print(f"frame {k}: canvas {f['width']}x{f['height']} "
              f"mean={float(f['pixels'].mean()):.1f}")

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
