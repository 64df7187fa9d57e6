"""Empirical candidate/shuffle scaling curves for the BLOCKED JOIN families
beyond dedup (round-8 verdict ask #3): interval-overlap grid join, geo
radius cell join, SymSpell delete-neighborhood join — plus the IVF
partition-probe cost (bytes scanned vs nprobe/n_cells). The dedup tiers got
this receipt in round 7 (scripts/measure_candidates.py → SCALE.md); this
script gives the other blocked-join families the same measured evidence
that candidate growth is ~linear in corpus size at constant density.

Growth models (constant duplication/collision density, like
measure_candidates.py's tagged copies — "more days of the same
distribution", never literal replicas):

- interval: natural TPC-H growth (sf0.01 → sf0.1: suppliers scale with SF,
  per-supplier interval density constant) AND a synthetic 10× of sf0.1
  with block-shifted copies (new disjoint suppkeys, identical per-block
  structure).
- geo: 6 disjoint-longitude copies of the sf0.1 customer lattice (60°
  spacing exactly tiles the circle with the ±30° band — zero compression,
  so spatial density is constant and copies share no cells).
- symspell: natural growth (names stay near-sequential) AND 10× tagged
  copies ('aa'…'jj' prefixes, pairwise distance 2, so delete neighborhoods
  never collide across copies).

Candidates are computed EXACTLY from the same join keys the operators use
(sum of C(n,2) / n_a·n_b over the key), shuffle bytes from the Spark UI
REST API around each full run. IVF probe bytes are exact directory sizes
of the probed cell partitions (what PartitionFilters admits into the scan).

Usage: python scripts/measure_joins.py [--skip-ivf]
"""

from __future__ import annotations

import glob
import json
import math
import os
import sys
import time
import urllib.request
from functools import reduce
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from zio_analytics_spark.operators.geo import geo_radius_join  # noqa: E402
from zio_analytics_spark.operators.intervals import interval_overlap_pairs  # noqa: E402
from zio_analytics_spark.operators.linkage import fuzzy_pairs_symspell  # noqa: E402
from zio_analytics_spark.session import get_spark  # noqa: E402
from zio_analytics_spark.sources.parquet import read_table  # noqa: E402
from zio_analytics_spark.tmpdirs import materialize_table, scratch_dir  # noqa: E402

spark = get_spark("measure_joins", extra_conf={"spark.ui.enabled": "true"})


def shuffle_write_bytes() -> int:
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url) as resp:
        stages = json.load(resp)
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def pairs_c2(keyed, *key_cols):
    """Σ C(n, 2) over per-key row counts — the self-join candidate count."""
    row = (
        keyed.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("p"))
        .first()
    )
    return int(row["p"] or 0)


def timed_count(df):
    b0 = shuffle_write_bytes()
    t0 = time.time()
    n = df.count()
    return n, round((shuffle_write_bytes() - b0) / 1e6, 1), round(time.time() - t0, 1)


# --- interval overlap -------------------------------------------------------

def iv_table(sf_dir):
    epoch = F.lit("1970-01-01").cast("date")
    return read_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("suppkey"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("iid"),
        F.datediff(F.col("l_shipdate").cast("date"), epoch).cast("long").alias("s"),
        (
            F.datediff(F.col("l_shipdate").cast("date"), epoch).cast("long")
            + F.col("l_linenumber")
        ).alias("e"),
    )


def iv_10x(iv):
    copies = [
        iv.select(
            (F.col("suppkey") + F.lit(i * 10_000_000)).alias("suppkey"),
            (F.col("iid") + F.lit(i * 100_000_000_000)).alias("iid"),
            "s",
            "e",
        )
        for i in range(10)
    ]
    return materialize_table(
        reduce(lambda a, b: a.unionByName(b), copies), prefix="zas_miv10_"
    )


def measure_interval(name, iv, w=8):
    n_rows = iv.count()
    # the exact join key: (suppkey, cell) over the cell-exploded intervals
    keyed = iv.select(
        "suppkey", F.explode(F.sequence(F.floor(F.col("s") / w), F.floor(F.col("e") / w))).alias("cell")
    )
    cands = pairs_c2(keyed, "suppkey", "cell")
    n, mb, sec = timed_count(
        interval_overlap_pairs(iv, "iid", "s", "e", block_cols=["suppkey"], cell_width=w)
    )
    rec = {
        "family": "interval_overlap", "corpus": name, "n_rows": n_rows,
        "candidates": cands, "result_pairs": n, "shuffle_mb": mb, "sec": sec,
    }
    print(json.dumps(rec))
    return rec


# --- geo radius -------------------------------------------------------------

def geo_points(sf_dir):
    return read_table(spark, sf_dir, "customer").selectExpr(
        "c_custkey AS id",
        "((c_custkey * c_custkey * 131 + c_custkey * 7919) % 1201 - 600) / 40.0 AS lat",
        "((c_custkey * c_custkey * 197 + c_custkey * 104729) % 2401 - 1200) / 40.0 AS lon",
    )


def geo_6x(pts):
    # 60° spacing tiles the circle exactly: disjoint, uncompressed copies
    copies = [
        pts.select(
            (F.col("id") + F.lit(i * 10_000_000)).alias("id"),
            "lat",
            (F.col("lon") + F.lit(i * 60.0 - 150.0)).alias("lon"),
        )
        for i in range(6)
    ]
    return materialize_table(
        reduce(lambda a, b: a.unionByName(b), copies), prefix="zas_mgeo6_"
    )


def measure_geo(name, pts, radius_km=150.0, max_abs_lat=16.0):
    n_rows = pts.count()
    # replicate the operator's cell math (operators/geo.py geo_radius_join —
    # keep in sync) to count candidates on the exact join key
    s_lat = radius_km / 111.0
    s_lon = s_lat / math.cos(math.radians(max_abs_lat))
    n_lon = max(1, int(360.0 // s_lon))
    s_lon_eff = 360.0 / n_lon
    base = pts.select(
        F.floor(F.col("lat") / s_lat).cast("int").alias("clat"),
        F.pmod(
            F.floor((F.col("lon") + F.lit(180.0)) / s_lon_eff).cast("int"), F.lit(n_lon)
        ).cast("int").alias("clon"),
    )
    counts = base.groupBy("clat", "clon").agg(F.count(F.lit(1)).alias("c"))
    # left explodes the 9-neighborhood; candidates = Σ_cell n(cell)·n(neighbor)
    nb = counts.select(
        "clat", "clon", F.col("c").alias("ca"),
        F.explode(
            F.expr("array(" + ", ".join(
                f"struct({dy} AS dy, {dx} AS dx)" for dy in (-1, 0, 1) for dx in (-1, 0, 1)
            ) + ")")
        ).alias("o"),
    ).select(
        (F.col("clat") + F.col("o.dy")).alias("clat"),
        F.pmod(F.col("clon") + F.col("o.dx"), F.lit(n_lon)).cast("int").alias("clon"),
        "ca",
    )
    row = (
        nb.join(counts, ["clat", "clon"])
        .agg(F.sum(F.col("ca") * F.col("c")).alias("p"))
        .first()
    )
    cands = int(row["p"] or 0)
    n, mb, sec = timed_count(geo_radius_join(pts, radius_km=radius_km, max_abs_lat=max_abs_lat))
    rec = {
        "family": "geo_radius", "corpus": name, "n_rows": n_rows,
        "candidates": cands, "result_pairs": n, "shuffle_mb": mb, "sec": sec,
    }
    print(json.dumps(rec))
    return rec


# --- symspell ---------------------------------------------------------------

def sym_names(sf_dir):
    return read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("s")
    )


def sym_10x(names):
    # pairwise-distance-2 tags: delete neighborhoods never collide across copies
    copies = [
        names.select(
            (F.col("id") + F.lit(i * 10_000_000)).alias("id"),
            F.concat(F.lit(chr(ord("a") + i) * 2), F.col("s")).alias("s"),
        )
        for i in range(10)
    ]
    return materialize_table(
        reduce(lambda a, b: a.unionByName(b), copies), prefix="zas_msym10_"
    )


def measure_symspell(name, names):
    n_rows = names.count()
    s = F.col("s")
    n = F.length(s)
    d1 = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat(s.substr(F.lit(1), i - 1), s.substr(i + 1, n)),
    )
    v = names.select(
        "id", F.explode(F.array_union(F.array(s), d1)).alias("var")
    ).select("id", F.xxhash64("var").alias("vh"))
    cands = pairs_c2(v, "vh")
    npairs, mb, sec = timed_count(fuzzy_pairs_symspell(names, "s", "id", max_edit=1))
    rec = {
        "family": "fuzzy_symspell", "corpus": name, "n_rows": n_rows,
        "candidates": cands, "result_pairs": npairs, "shuffle_mb": mb, "sec": sec,
    }
    print(json.dumps(rec))
    return rec


# --- IVF probe cost ---------------------------------------------------------

def dir_bytes(path_glob):
    return sum(os.path.getsize(p) for p in glob.glob(path_glob) if os.path.isfile(p))


def measure_ivf(sf_dir):
    from zio_analytics_spark.operators.ann_index import build_ivf_index, query_ivf_index

    emb = read_table(spark, sf_dir, "embeddings")
    qv = emb.orderBy("vec_id").first()["embedding"]
    out = []
    for n_cells in (16, 64):
        path = scratch_dir(prefix=f"zas_mivf{n_cells}_")
        build_ivf_index(emb, path, n_cells=n_cells)
        total = dir_bytes(os.path.join(path, "cell=*", "*"))
        for nprobe in (1, 2, 4, 8):
            t0 = time.time()
            res = query_ivf_index(spark, path, list(qv), k=10, nprobe=nprobe)
            res.collect()
            sec = round(time.time() - t0, 2)
            # bytes PartitionFilters admits: exact on-disk size of probed cells
            import numpy as np

            from zio_analytics_spark.operators.ann_index import _centroids_path
            from zio_analytics_spark.operators.similarity import ivf_probes

            with open(_centroids_path(path), "rb") as f:
                Cn = np.load(f)
            probes = ivf_probes(Cn, list(qv), nprobe)
            scanned = sum(
                dir_bytes(os.path.join(path, f"cell={p}", "*")) for p in probes
            )
            rec = {
                "family": "ivf_probe", "n_cells": n_cells, "nprobe": nprobe,
                "bytes_scanned": scanned, "bytes_total": total,
                "frac_scanned": round(scanned / total, 4), "sec": sec,
            }
            print(json.dumps(rec))
            out.append(rec)
    return out


def measure_semdedup():
    """SemDeDup cell-candidate scaling: Σ C(cell_size, 2) over k-means
    cells at 1× and 10× vectors, with k FIXED (the density regime — cells
    fill up, candidates go ~quadratic) vs k scaled ∝ N (the operating
    contract — per-cell populations stay constant, candidates ~linear)."""
    from zio_analytics_spark.operators.clustering import kmeans_assign

    out = []
    for sf, k_fixed, k_scaled in (("sf0.01", 10, 10), ("sf0.1", 10, 40)):
        emb = read_table(spark, f"/root/testdata/{sf}", "embeddings")
        n = emb.count()
        for label, k in (("k_fixed", k_fixed), ("k_propN", k_scaled)):
            cells = kmeans_assign(emb, "embedding", "vec_id", k=k, n_iter=2, dim=64)
            cands = pairs_c2(cells, "cluster")
            rec = {
                "family": "semdedup_cells", "corpus": sf, "n_rows": n,
                "k": k, "mode": label, "candidates": cands,
            }
            print(json.dumps(rec))
            out.append(rec)
    return out


def main() -> None:
    if "--semdedup-only" in sys.argv:
        rows = measure_semdedup()
        print("\n| corpus | vectors | mode | k | candidates |")
        print("|---|---|---|---|---|")
        for r in rows:
            print(f"| {r['corpus']} | {r['n_rows']:,} | {r['mode']} | {r['k']} "
                  f"| {r['candidates']:,} |")
        spark.stop()
        return
    results = []
    results.append(measure_interval("sf0.01", iv_table("/root/testdata/sf0.01")))
    iv1 = iv_table("/root/testdata/sf0.1")
    results.append(measure_interval("sf0.1", iv1))
    results.append(measure_interval("sf0.1 x10", iv_10x(iv1)))

    results.append(measure_geo("sf0.01", geo_points("/root/testdata/sf0.01")))
    g1 = geo_points("/root/testdata/sf0.1")
    results.append(measure_geo("sf0.1", g1))
    results.append(measure_geo("sf0.1 x6", geo_6x(g1)))

    results.append(measure_symspell("sf0.01", sym_names("/root/testdata/sf0.01")))
    s1 = sym_names("/root/testdata/sf0.1")
    results.append(measure_symspell("sf0.1", s1))
    results.append(measure_symspell("sf0.1 x10", sym_10x(s1)))

    print("\n| family | corpus | rows | candidates | result pairs | shuffle MB | sec |")
    print("|---|---|---|---|---|---|---|")
    for r in results:
        print(
            f"| {r['family']} | {r['corpus']} | {r['n_rows']:,} | {r['candidates']:,} "
            f"| {r['result_pairs']:,} | {r['shuffle_mb']} | {r['sec']} |"
        )

    if "--skip-ivf" not in sys.argv:
        ivf = measure_ivf("/root/testdata/sf0.1")
        print("\n| n_cells | nprobe | bytes scanned | of total | frac | sec |")
        print("|---|---|---|---|---|---|")
        for r in ivf:
            print(
                f"| {r['n_cells']} | {r['nprobe']} | {r['bytes_scanned']:,} "
                f"| {r['bytes_total']:,} | {r['frac_scanned']} | {r['sec']} |"
            )
    spark.stop()


if __name__ == "__main__":
    main()
