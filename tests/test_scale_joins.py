"""Growth-bound assertions for the blocked join families (round-8 ask #3):
at constant density (disjoint-block growth), candidate counts — computed
exactly on each operator's join key — grow LINEARLY in corpus size. The
full measured curves live in SCALE.md (scripts/measure_joins.py); these
tests pin the invariant cheaply so a regression in the blocking key
(e.g. a key that silently merges blocks) fails in-round."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def _pairs_c2(keyed, *key_cols):
    row = (
        keyed.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("p"))
        .first()
    )
    return int(row["p"] or 0)


def _grow(df, copies: int, shift_cols: dict):
    out = df
    parts = [df]
    for i in range(1, copies):
        c = df
        for col, expr in shift_cols.items():
            c = c.withColumn(col, expr(i))
        parts.append(c)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def test_interval_candidates_linear(spark):
    base = spark.createDataFrame(
        [(k % 40, i, (i * 7) % 100, (i * 7) % 100 + 1 + (i % 9)) for i, k in enumerate(range(800))],
        "suppkey int, iid long, s long, e long",
    )
    w = 8

    def cands(df):
        keyed = df.select(
            "suppkey",
            F.explode(F.sequence(F.floor(F.col("s") / w), F.floor(F.col("e") / w))).alias("cell"),
        )
        return _pairs_c2(keyed, "suppkey", "cell")

    c1 = cands(base)
    big = _grow(
        base, 3, {"suppkey": lambda i: F.col("suppkey") + F.lit(1000 * i),
                  "iid": lambda i: F.col("iid") + F.lit(100_000 * i)},
    )
    c3 = cands(big)
    assert c1 > 0
    assert c3 == 3 * c1  # disjoint blocks: exactly linear

    from zio_analytics_spark.operators.intervals import interval_overlap_pairs

    r1 = interval_overlap_pairs(base, "iid", "s", "e", block_cols=["suppkey"], cell_width=w).count()
    r3 = interval_overlap_pairs(big, "iid", "s", "e", block_cols=["suppkey"], cell_width=w).count()
    assert r3 == 3 * r1


def test_geo_candidates_linear_under_disjoint_tiling(spark):
    # ±15° lat × ±30° lon lattice; 3 copies spaced 60° of longitude apart
    # (disjoint, uncompressed) — candidates on the (clat, clon) key with the
    # operator's own wrap arithmetic must be exactly 3×
    pts = spark.createDataFrame(
        [
            (i, ((i * i * 131 + i * 7919) % 1201 - 600) / 40.0,
             ((i * i * 197 + i * 104729) % 2401 - 1200) / 40.0)
            for i in range(600)
        ],
        "id long, lat double, lon double",
    )
    radius_km, max_abs_lat = 150.0, 16.0
    s_lat = radius_km / 111.0
    s_lon = s_lat / math.cos(math.radians(max_abs_lat))
    n_lon = max(1, int(360.0 // s_lon))
    s_lon_eff = 360.0 / n_lon

    def cands(df):
        base = df.select(
            F.floor(F.col("lat") / s_lat).cast("int").alias("clat"),
            F.pmod(
                F.floor((F.col("lon") + F.lit(180.0)) / s_lon_eff).cast("int"),
                F.lit(n_lon),
            ).cast("int").alias("clon"),
        )
        counts = base.groupBy("clat", "clon").agg(F.count(F.lit(1)).alias("c"))
        nb = counts.select(
            "clat", "clon", F.col("c").alias("ca"),
            F.explode(F.expr(
                "array(" + ", ".join(
                    f"struct({dy} AS dy, {dx} AS dx)"
                    for dy in (-1, 0, 1) for dx in (-1, 0, 1)
                ) + ")"
            )).alias("o"),
        ).select(
            (F.col("clat") + F.col("o.dy")).alias("clat"),
            F.pmod(F.col("clon") + F.col("o.dx"), F.lit(n_lon)).cast("int").alias("clon"),
            "ca",
        )
        row = nb.join(counts, ["clat", "clon"]).agg(
            F.sum(F.col("ca") * F.col("c")).alias("p")
        ).first()
        return int(row["p"] or 0)

    c1 = cands(pts)
    # shift by an exact multiple of the cell width (47 cells ≈ 66.1°): the
    # binning translates rigidly, bands end up ≥3 cells apart (beyond the
    # ±1 neighborhood reach), so copies are candidate-disjoint AND
    # candidate-identical — the total is exactly 3×
    shift = 47 * s_lon_eff
    big = _grow(
        pts, 3, {"id": lambda i: F.col("id") + F.lit(10_000 * i),
                 "lon": lambda i: F.col("lon") + F.lit(shift * i)},
    )
    c3 = cands(big)
    assert c1 > 0
    assert c3 == 3 * c1

    from zio_analytics_spark.operators.geo import geo_radius_join

    r1 = geo_radius_join(pts, radius_km=radius_km, max_abs_lat=max_abs_lat).count()
    r3 = geo_radius_join(big, radius_km=radius_km, max_abs_lat=max_abs_lat).count()
    assert r3 == 3 * r1


def test_symspell_candidates_linear(spark):
    names = spark.createDataFrame(
        [(i, f"Customer#{i:09d}") for i in range(0, 1200, 3)], "id long, s string"
    )

    def cands(df):
        s, n = F.col("s"), F.length("s")
        d1 = F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.concat(s.substr(F.lit(1), i - 1), s.substr(i + 1, n)),
        )
        v = df.select(
            "id", F.explode(F.array_union(F.array(s), d1)).alias("var")
        ).select("id", F.xxhash64("var").alias("vh"))
        return _pairs_c2(v, "vh")

    c1 = cands(names)
    # distance-2 tags: neighborhoods can't collide across copies
    big = _grow(
        names, 3, {"id": lambda i: F.col("id") + F.lit(10_000 * i),
                   "s": lambda i: F.concat(F.lit(chr(ord("a") + i) * 2), F.col("s"))},
    )
    c3 = cands(big)
    assert c1 > 0
    assert c3 == 3 * c1

    from zio_analytics_spark.operators.linkage import fuzzy_pairs_symspell

    r1 = fuzzy_pairs_symspell(names, "s", "id", max_edit=1).count()
    r3 = fuzzy_pairs_symspell(big, "s", "id", max_edit=1).count()
    assert r3 == 3 * r1


def test_llm_pipeline_stage_counts_linear(spark, sf_dir):
    """×N tiling receipt for the flagship pipeline (scripts/
    measure_pipeline.py holds the measured sf0.1 curve): every stage's
    row count grows ~linearly under constant-density growth — copies
    shift doc_id by a multiple of 10 (same bench-split class) and append
    a per-copy tag token (no cross-copy dedup collapse, no cross-copy
    contamination). A blocking/keying regression that made any stage
    superlinear (or collapsed the copies) breaks the ratio band."""
    from functools import reduce

    from zio_analytics_spark import catalog
    from zio_analytics_spark.operators import dedup, text
    from zio_analytics_spark.sources.parquet import read_table

    docs = read_table(spark, sf_dir, "documents")
    copies = 4

    def tile(d):
        parts = [
            d.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                "lang",
                F.concat(F.col("text"), F.lit(f" copytag{i}")).alias("text"),
            )
            for i in range(copies)
        ]
        return reduce(lambda a, b: a.unionByName(b), parts)

    def stages(d):
        toks = d.select(
            "doc_id", "lang", "text",
            F.size(text.tokens("text")).cast("long").alias("n_tokens"),
        )
        quality = toks.where(F.col("n_tokens") >= 20)
        bench = d.where(F.col("doc_id") % 10 == 0)
        corpus = quality.where(F.col("doc_id") % 10 != 0)
        clean = dedup.decontaminate(corpus, bench, n=5)
        keepers = clean.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
        return {
            "quality": quality.count(),
            "clean": clean.count(),
            "keepers": keepers.count(),
            "packs": catalog.llm_pipeline(d).count(),
        }

    base = stages(docs)
    big = stages(tile(docs))
    for k in base:
        assert base[k] > 0, k
        ratio = big[k] / base[k]
        # the tag token can push a doc over the >=20-token quality
        # threshold, so per-copy counts sit slightly ABOVE base — the band
        # is [N·0.95, N·1.15]; superlinear blowup or copy collapse
        # (ratio ≈ 1) both land far outside it
        assert copies * 0.95 <= ratio <= copies * 1.15, (k, ratio, base[k], big[k])
