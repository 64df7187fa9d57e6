"""Robust multimodal ingest tour (round-9 surface).

Run: python examples/robust_ingest_tour.py [sf_dir]

The stages a web-scrape ingest actually runs, in order, each ~100x
cheaper than the one after it — filter early, decode late, never die on
a bad byte:

1. HEADER-tier triage: parse_jpeg_meta / parse_mp3_meta — dimensions,
   quality class, duration from marker walks alone (no entropy decode).
2. QUARANTINE decode: decode_quarantine — corrupt payloads become rows
   (id + reason), not task deaths; the clean lane feeds the next stage.
3. FULL decode across the codec matrix — progressive JPEG, both-endian
   TIFF, GIF — through the single decode_image seam.
4. Paragraph-grain dedup with reassembly on the text side
   (dedup_paragraphs), then the serving WordPiece tokenizer
   (wordpiece_apply) over the survivors — the text lane of the same
   ingest.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from zio_analytics_spark.operators.dedup import dedup_paragraphs  # noqa: E402
from zio_analytics_spark.operators.jpeg import (  # noqa: E402
    encode_jpeg,
    parse_jpeg_meta,
)
from zio_analytics_spark.operators.multimodal import (  # noqa: E402
    decode_quarantine,
    encode_gif,
    encode_mp3_frames,
    encode_tiff,
    parse_mp3_meta,
)
from zio_analytics_spark.operators.wordpiece import wordpiece_apply  # noqa: E402
from zio_analytics_spark.session import get_spark  # noqa: E402
from zio_analytics_spark.sources.parquet import read_table  # noqa: E402


def main(sf_dir: str) -> None:
    spark = get_spark("robust-ingest-tour",
                      extra_conf={"spark.sql.shuffle.partitions": "8"})
    docs = read_table(spark, sf_dir, "documents").limit(400).cache()

    # -- 1. header triage: JPEG + MP3 metadata without decode ------------
    def triage(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                img = np.full((16 + i % 9, 16 + i % 7, 3), (i * 5) % 256,
                              dtype=np.uint8)
                jm = parse_jpeg_meta(encode_jpeg(
                    img, quality=40 + (i % 6) * 10, progressive=i % 3 == 0))
                am = parse_mp3_meta(encode_mp3_frames(
                    1 + i % 14, i % 3, 3 + i % 5))
                rows.append((i, jm["width"], jm["height"], jm["dqt00"],
                             jm["progressive"], am["bitrate_kbps"],
                             am["duration_ms"]))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "width", "height", "dqt00", "progressive",
                "bitrate_kbps", "duration_ms"])

    meta = docs.select("doc_id").repartition(8).mapInPandas(
        triage,
        "doc_id long, width int, height int, dqt00 int, progressive boolean,"
        " bitrate_kbps int, duration_ms double",
    )
    kept = meta.where((F.col("dqt00") <= 20) & (F.col("width") >= 18))
    print("1) header triage kept",
          f"{kept.count()}/{meta.count()} payloads "
          "(quality class + min dimensions, zero decode cycles)")

    # -- 2. quarantine decode over a mixed good/corrupt batch ------------
    pal = [(i, i, i) for i in range(256)]

    def build(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                if i % 4 == 0:
                    g = encode_gif(6, 5, lambda x, y, i=i: (x + y + i) % 256, pal)
                    rows.append((i, g[: len(g) // 2]))  # corrupt: truncated
                elif i % 4 == 1:
                    rows.append((i, encode_tiff(
                        5, 4, lambda x, y, i=i: ((i + x) % 256,) * 3,
                        byte_order="MM" if i % 2 else "II")))
                else:
                    img = np.full((12, 10, 3), i % 256, dtype=np.uint8)
                    rows.append((i, encode_jpeg(img, quality=80,
                                                progressive=i % 8 == 2)))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    payloads = docs.select("doc_id").repartition(8).mapInPandas(
        build, "doc_id long, payload binary")
    q = decode_quarantine(payloads).cache()
    lanes = q.groupBy("ok").count().collect()
    print("2) quarantine lanes:",
          {r["ok"]: r["count"] for r in lanes},
          "- corrupt rows carry reasons, tasks never die")
    print("   sample reason:",
          q.where(~F.col("ok")).select("error").first()["error"])

    # -- 3. clean lane stats across the codec matrix ---------------------
    stats = q.where("ok").agg(
        F.count("*").alias("n"),
        F.round(F.avg("mean_byte"), 2).alias("avg_mean_byte"),
        F.countDistinct("width").alias("distinct_widths"),
    ).first()
    print("3) clean-lane decode (progressive JPEG + II/MM TIFF):",
          stats.asDict())

    # -- 4. text lane: paragraph dedup -> serving tokenizer --------------
    d2 = docs.select(
        "doc_id",
        F.array_join(
            F.concat(
                F.array(F.lit("shared boilerplate header")),
                F.expr("transform(sequence(0, 2), i -> "
                       "array_join(slice(split(text, ' '), i * 8 + 1, 8), ' '))"),
            ),
            "\n\n",
        ).alias("text"),
    )
    pdd = dedup_paragraphs(d2).cache()
    struck = pdd.agg(F.sum("n_dropped")).first()[0]
    print(f"4) paragraph dedup struck {struck} duplicate paragraphs "
          "(boilerplate survives exactly once, docs reassembled in order)")
    toks = wordpiece_apply(
        pdd.where(F.col("n_kept") >= 1), n_merges=6
    )
    r = toks.agg(F.sum("n_tokens").alias("tok"),
                 F.count("*").alias("docs")).first()
    print(f"   serving WordPiece (maximal munch): {r['tok']} pieces over "
          f"{r['docs']} reassembled docs")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
