"""Multimodal curation tour (round-7 session-2 surface): the image/audio/
video front half of a training-data pipeline, plus spatial layout and
diversified retrieval.

Run: python examples/multimodal_curation.py [sf_dir]

1. Image thumbnailing: decode → 2× box-filter resize → PNG re-encode →
   perceptual aHash on the SMALLER payloads (operators/multimodal.py)
2. Audio VAD front end: framed energy/zero-crossing/peak over real WAV
   decode, then silence-frame filtering (audio_frame_features)
3. DTMF tone decoding via single-bin DFT band powers (dtmf_detect)
4. Video shot boundaries: luma-SAD scene cuts deciding which frames are
   worth sampling (scene_cuts)
5. Hilbert-clustered layout: write events ordered along the space-filling
   curve, show the range-scan reading fewer files (operators/layout.py)
6. Geo radius join: all customer pairs within 150 km via grid-cell
   blocking — an equi-join, never a cartesian (operators/geo.py)
7. MMR rerank: diversified top-k over embeddings for RAG context
   assembly (operators/similarity.py)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from zio_analytics_spark.operators.geo import geo_radius_join  # noqa: E402
from zio_analytics_spark.operators.layout import hilbert_write  # noqa: E402
from zio_analytics_spark.operators.multimodal import (  # noqa: E402
    audio_frame_features,
    dtmf_detect,
    encode_png,
    encode_wav,
    encode_y4m,
    image_resize_box,
    perceptual_ahash,
    scene_cuts,
)
from zio_analytics_spark.operators.similarity import mmr_select  # noqa: E402
from zio_analytics_spark.session import get_spark  # noqa: E402
from zio_analytics_spark.sources.parquet import read_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("multimodal-curation-example")
    docs = read_table(spark, sf_dir, "documents").select("doc_id").limit(64)

    # 1. thumbnail pipeline: synthetic PNGs → resize → hash the thumbnails
    def encode_images(batches):
        for pdf in batches:
            payloads = []
            for i in pdf["doc_id"]:
                i = int(i)
                w, h = 16 * (1 + i % 2), 16

                def rgb(x, y, i=i):
                    return ((i + 3 * x + 7 * y) % 256, (2 * i + 5 * x) % 256, (i + 11 * y) % 256)

                payloads.append(encode_png(w, h, rgb))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    images = docs.mapInPandas(encode_images, "doc_id long, payload binary")
    thumbs = image_resize_box(images, factor=2)
    perceptual_ahash(thumbs.select("doc_id", "payload")).show(4)

    # 1b. GIF tier (round-8): palette + real spec LZW — decode_image
    #     dispatches on the magic bytes, same seam as PNG/BMP/PPM
    from zio_analytics_spark.operators.multimodal import decode_gif, encode_gif

    pal = [(i, (2 * i + 85) % 256, (5 * i + 171) % 256) for i in range(256)]
    gif = encode_gif(16, 8, lambda x, y: (3 * x + 7 * y) % 256, pal)
    m = decode_gif(gif)
    print(f"GIF round-trip: {m['width']}x{m['height']}, "
          f"{len(gif)} bytes, top-left {tuple(m['pixels'][0, 0])}")

    # 2. audio VAD features: flag low-energy frames
    def encode_clips(batches):
        for pdf in batches:
            payloads = []
            for i in pdf["doc_id"]:
                i = int(i)
                k = np.arange(256, dtype=np.int64)
                amp = (((i * 31 + 7 * k) % 2003) - 1001) * ((k // 64) % 2)  # alternating silence
                payloads.append(encode_wav(amp))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    clips = docs.mapInPandas(encode_clips, "doc_id long, payload binary")
    feats = audio_frame_features(clips, frame_len=64)
    feats.withColumn("is_silence", F.col("energy") < 1000).groupBy("is_silence").count().show()

    # 3. DTMF: decode which key each clip dialed
    def encode_tones(batches):
        rows_hz, cols_hz = (697, 770, 852, 941), (1209, 1336, 1477)
        for pdf in batches:
            payloads = []
            for i in pdf["doc_id"]:
                i = int(i)
                k = np.arange(320, dtype=np.int64)
                f1, f2 = rows_hz[i % 4], cols_hz[i % 3]
                amp = np.floor(3000 * np.sin(2 * np.pi * f1 * k / 8000.0)) + np.floor(
                    3000 * np.sin(2 * np.pi * f2 * k / 8000.0)
                )
                payloads.append(encode_wav(amp.astype(np.int64)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    tones = docs.mapInPandas(encode_tones, "doc_id long, payload binary")
    dtmf_detect(tones).groupBy("digit").count().orderBy("digit").show()

    # 4. video scene cuts
    def encode_videos(batches):
        for pdf in batches:
            payloads = []
            for i in pdf["doc_id"]:
                i = int(i)
                s = 3 + i % 4
                fr = np.zeros((8, 4, 6, 3), dtype=np.uint8)
                yy, xx = np.mgrid[0:4, 0:6]
                for f in range(8):
                    fr[f, :, :, 0] = (i + 3 * xx + 5 * yy + 2 * f) % 100 + (120 if f >= s else 0)
                payloads.append(encode_y4m(fr, 6, 4))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    videos = docs.mapInPandas(encode_videos, "doc_id long, payload binary")
    cuts = scene_cuts(videos, threshold=1000)
    cuts.where("is_cut").groupBy("frame").count().orderBy("frame").show()

    # 5. Hilbert layout: range query over the clustered write
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "value",
        F.col("user_id").cast("long").alias("ub"),
        F.least(F.lit(255), F.floor(F.col("value") / 2)).cast("long").alias("vb"),
    )
    out = tempfile.mkdtemp(prefix="zas_example_hilbert_")
    try:
        hilbert_write(ev, out, "ub", "vb", bits=8, n_files=8)
        back = spark.read.parquet(out).where(
            F.col("user_id").between(2, 6) & F.col("value").between(50, 150)
        )
        back.agg(F.count(F.lit(1)).alias("matching_events")).show()
    finally:
        shutil.rmtree(out, ignore_errors=True)

    # 6. geo radius join (quadratic scramble into a ±15° × ±30° band)
    pts = read_table(spark, sf_dir, "customer").selectExpr(
        "c_custkey AS id",
        "((c_custkey * c_custkey * 131 + c_custkey * 7919) % 1201 - 600) / 40.0 AS lat",
        "((c_custkey * c_custkey * 197 + c_custkey * 104729) % 2401 - 1200) / 40.0 AS lon",
    )
    geo_radius_join(pts, radius_km=150.0, max_abs_lat=16.0).orderBy("dist_km").show(5)

    # 7. MMR diversified retrieval vs plain top-k
    emb = read_table(spark, sf_dir, "embeddings")
    qv = [float(x) for x in emb.where("vec_id = 0").first()["embedding"]]
    mmr_select(emb.where("vec_id <> 0"), qv, k=5, pool=30).show()

    spark.stop()


if __name__ == "__main__":
    main()
