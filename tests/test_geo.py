"""geo_radius_join: blocking completeness vs a brute-force oracle, cell-
boundary pairs, and plan shape (equi-join, no cartesian)."""

import math
import random

import pytest

from zio_analytics_spark.operators.geo import geo_radius_join, haversine_km


def _hav(lat1, lon1, lat2, lon2):
    dphi = math.radians(lat2 - lat1) / 2
    dlmb = math.radians(lon2 - lon1) / 2
    h = math.sin(dphi) ** 2 + math.cos(math.radians(lat1)) * math.cos(
        math.radians(lat2)
    ) * math.sin(dlmb) ** 2
    return 12742.0 * math.asin(math.sqrt(h))


def test_radius_join_matches_bruteforce(spark):
    rng = random.Random(17)
    pts = [
        (i, rng.uniform(-60, 60), rng.uniform(-120, 120)) for i in range(120)
    ] + [
        # a dense cluster so some pairs actually match
        (1000 + i, 45.0 + rng.uniform(-1.5, 1.5), 10.0 + rng.uniform(-2.0, 2.0))
        for i in range(80)
    ]
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    got = {
        (r["a_id"], r["b_id"]): r["dist_km"]
        for r in geo_radius_join(df, radius_km=150.0, max_abs_lat=61.0).collect()
    }
    want = {}
    for i, (ai, alat, alon) in enumerate(pts):
        for bi, blat, blon in pts[i + 1 :]:
            d = round(_hav(alat, alon, blat, blon), 4)
            if d <= 150.0:
                want[(min(ai, bi), max(ai, bi))] = d
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-3), k


def test_radius_join_pairs_straddling_cells():
    # 150 km / 111 ≈ 1.35° cells: 1.3° of latitude apart (≈144.6 km) must
    # match across a cell row boundary; 1.4° (≈155.7 km) must not.
    from zio_analytics_spark.session import get_spark

    spark = get_spark()
    df = spark.createDataFrame(
        [(1, 0.05, 0.0), (2, 1.35, 0.0), (3, 2.65, 0.0)],
        "id long, lat double, lon double",
    )
    rows = geo_radius_join(df, radius_km=150.0).collect()
    pairs = {(r["a_id"], r["b_id"]) for r in rows}
    assert pairs == {(1, 2), (2, 3)}  # (1, 3) is 2.6 deg = 289 km: excluded
    for r in rows:
        assert abs(r["dist_km"] - 1.3 * 111.19492664455873) < 0.01


def test_radius_join_plan_is_equi_join(spark):
    df = spark.createDataFrame([(1, 0.0, 0.0), (2, 1.0, 1.0)], "id long, lat double, lon double")
    plan = geo_radius_join(df, radius_km=100.0)._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_radius_join_validates_band(spark):
    df = spark.createDataFrame([(1, 0.0, 0.0)], "id long, lat double, lon double")
    with pytest.raises(ValueError):
        geo_radius_join(df, radius_km=10.0, max_abs_lat=95.0)


def test_haversine_known_distance(spark):
    # Paris (48.8566, 2.3522) — London (51.5074, -0.1278) ≈ 343.5 km
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(48.8566, 2.3522, 51.5074, -0.1278)], "a double, b double, c double, d double")
    d = df.select(
        haversine_km(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("km")
    ).collect()[0]["km"]
    assert abs(d - 343.5) < 1.5


def test_radius_join_wraps_antimeridian(spark):
    # Points 0.2 deg of longitude apart but straddling +/-180: ~22 km at
    # the equator -- must pair despite living at opposite ends of the raw
    # floor(lon/s) cell axis. A third point far away must not pair.
    df = spark.createDataFrame(
        [(1, 0.0, 179.95), (2, 0.0, -179.85), (3, 0.0, 0.0)],
        "id long, lat double, lon double",
    )
    rows = geo_radius_join(df, radius_km=150.0).collect()
    pairs = {(r["a_id"], r["b_id"]) for r in rows}
    assert pairs == {(1, 2)}
    (r,) = rows
    assert abs(r["dist_km"] - _hav(0.0, 179.95, 0.0, -179.85)) < 0.01


def test_radius_join_huge_radius_degenerate_cells(spark):
    # radius so large the longitude cells span the globe (n_lon < 3):
    # duplicate wrapped cells must not duplicate pairs.
    df = spark.createDataFrame(
        [(1, 10.0, -170.0), (2, 11.0, 170.0), (3, -20.0, 5.0)],
        "id long, lat double, lon double",
    )
    rows = geo_radius_join(df, radius_km=20000.0, max_abs_lat=30.0).collect()
    pairs = sorted((r["a_id"], r["b_id"]) for r in rows)
    assert pairs == [(1, 2), (1, 3), (2, 3)]  # each unordered pair exactly once
