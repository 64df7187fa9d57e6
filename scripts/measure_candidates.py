"""Empirical candidate-count + shuffle-byte scaling curves for the dedup
tiers (round-7 verdict ask #5): SCALE.md claims near-linear candidate
growth for the blocked/bucketed candidate generators — this script measures
it at sf0.01, sf0.1, and a synthetic 10x corpus, and the results table in
SCALE.md §"Measured candidate scaling" is produced from this output.

The 10x corpus models CORPUS GROWTH AT CONSTANT DUPLICATION DENSITY: ten
copies of the sf0.1 documents where copy i prefixes every word with a
two-letter tag ('za', 'zb', ...), so each copy keeps the original's
internal near-duplicate structure while sharing no shingles/fingerprints
across copies — the "ten more days of ingest from the same distribution"
shape, NOT ten literal replicas (which would be an exact-duplicate
explosion and measure the degenerate regime instead of growth).

Candidate counts are computed EXACTLY from the same tables the operators
join (sum of C(bucket_size, 2) over the join key), and shuffle bytes come
from the Spark UI REST API (sum of shuffleWriteBytes across completed
stages) around each operator's full run.

Usage:  python scripts/measure_candidates.py [--skip-10x]
Prints one JSON line per (corpus, tier) and a final summary table.
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

from zio_analytics_spark.operators import dedup  # noqa: E402
from zio_analytics_spark.session import get_spark  # noqa: E402
from zio_analytics_spark.sources.parquet import read_table  # noqa: E402
from zio_analytics_spark.tmpdirs import materialize_table  # noqa: E402

spark = get_spark("measure_candidates", extra_conf={"spark.ui.enabled": "true"})


def shuffle_write_bytes() -> int:
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url) as resp:
        stages = json.load(resp)
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def pairs_in_buckets(grouped_counts):
    """sum C(c, 2) over a (key -> count) DataFrame with column `c`."""
    row = grouped_counts.agg(
        F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("p")
    ).first()
    return int(row["p"] or 0)


def corpus_10x(docs):
    copies = []
    for i in range(10):
        tag = "z" + chr(ord("a") + i)
        copies.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * 100_000_000)).alias("doc_id"),
                F.col("lang"),
                F.regexp_replace(F.lower(F.col("text")), "([a-z]+)", tag + "$1").alias(
                    "text"
                ),
            )
        )
    return materialize_table(
        reduce(lambda a, b: a.unionByName(b), copies), prefix="zas_m10x_"
    )


def measure(corpus_name: str, docs) -> list[dict]:
    out = []
    n_docs = docs.count()

    # --- jaccard: sparse candidate rows + chooser stats -------------------
    sh = dedup.build_shingle_table(docs, block_cols=["lang"], n=3)
    tok = sh.select("lang", F.explode("__sh").alias("t"))
    sparse_cands = pairs_in_buckets(
        tok.groupBy("lang", "t").agg(F.count(F.lit(1)).alias("c"))
    )
    strategy = dedup._choose_strategy(sh, ["lang"], 1 << 15)
    b0 = shuffle_write_bytes()
    t0 = time.time()
    n_pairs = dedup.jaccard_pairs(
        docs, block_cols=["lang"], threshold=0.5, strategy="sparse",
        prebuilt_shingles=sh,
    ).count()
    rec = {
        "corpus": corpus_name, "tier": "jaccard_sparse", "n_docs": n_docs,
        "candidates": sparse_cands, "result_pairs": n_pairs,
        "shuffle_mb": round((shuffle_write_bytes() - b0) / 1e6, 1),
        "sec": round(time.time() - t0, 1), "auto_strategy": strategy,
    }
    print(json.dumps(rec)); out.append(rec)

    # --- minhash LSH candidate rows (calibrated scheme at t=0.5) ----------
    from zio_analytics_spark.operators.dedup import lsh_calibrate

    num_hashes, bands = lsh_calibrate(0.5, 0.9)
    rows_per_band = num_hashes // bands
    shm = sh.select(F.col("doc_id").alias("doc"), "__sh")
    tokm = shm.select("doc", F.explode("__sh").alias("__t"))
    sig = tokm.groupBy("doc").agg(
        *[
            F.min(F.xxhash64(F.lit(seed), F.col("__t"))).alias(f"__h{seed}")
            for seed in range(num_hashes)
        ]
    )
    band_arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.xxhash64(
                    *[F.col(f"__h{i * rows_per_band + r}") for r in range(rows_per_band)]
                ).alias("bh"),
            )
            for i in range(bands)
        ]
    )
    banded = sig.select("doc", F.explode(band_arr).alias("b"))
    mh_cands = pairs_in_buckets(
        banded.groupBy("b").agg(F.count(F.lit(1)).alias("c"))
    )
    b0 = shuffle_write_bytes()
    t0 = time.time()
    n_pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5).count()
    rec = {
        "corpus": corpus_name, "tier": "minhash_lsh", "n_docs": n_docs,
        "candidates": mh_cands, "result_pairs": n_pairs,
        "shuffle_mb": round((shuffle_write_bytes() - b0) / 1e6, 1),
        "sec": round(time.time() - t0, 1),
    }
    print(json.dumps(rec)); out.append(rec)

    # --- simhash combo-key candidate rows (distinct-fp grain) -------------
    fp = materialize_table(
        dedup.simhash(docs).withColumnRenamed("doc_id", "doc"), prefix="zas_mfp_"
    )
    same_pairs = pairs_in_buckets(
        fp.groupBy("simhash").agg(F.count(F.lit(1)).alias("c"))
    )
    fpd = fp.select("simhash").distinct()
    keyed = fpd.select(
        F.explode(dedup._block_combo_keys(F.col("simhash"), 3)).alias("b")
    )
    sim_cands = pairs_in_buckets(keyed.groupBy("b").agg(F.count(F.lit(1)).alias("c")))
    b0 = shuffle_write_bytes()
    t0 = time.time()
    n_pairs = dedup.simhash_pairs(docs, max_hamming=3).count()
    rec = {
        "corpus": corpus_name, "tier": "simhash", "n_docs": n_docs,
        "candidates": sim_cands, "same_fp_pairs": same_pairs,
        "result_pairs": n_pairs,
        "shuffle_mb": round((shuffle_write_bytes() - b0) / 1e6, 1),
        "sec": round(time.time() - t0, 1),
    }
    print(json.dumps(rec)); out.append(rec)
    return out


def main() -> None:
    skip10 = "--skip-10x" in sys.argv
    results = []
    for name, sf_dir in [("sf0.01", "/root/testdata/sf0.01"), ("sf0.1", "/root/testdata/sf0.1")]:
        results += measure(name, read_table(spark, sf_dir, "documents"))
    if not skip10:
        docs10 = corpus_10x(read_table(spark, "/root/testdata/sf0.1", "documents"))
        results += measure("sf0.1 x10", docs10)

    print("\n| corpus | n_docs | tier | candidates | result pairs | shuffle MB | sec |")
    print("|---|---|---|---|---|---|---|")
    for r in results:
        print(
            f"| {r['corpus']} | {r['n_docs']} | {r['tier']} | {r['candidates']:,} "
            f"| {r['result_pairs']:,} | {r['shuffle_mb']} | {r['sec']} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
