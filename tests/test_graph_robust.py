"""PageRank (operators/graph.py), table_diff, winsorize/MAD — crafted
fixtures for properties the catalog oracles exercise statistically."""

import pytest
from pyspark.sql import functions as F

from zio_analytics_spark.operators.graph import pagerank
from zio_analytics_spark.operators.merge import table_diff
from zio_analytics_spark.operators.robust import mad_outliers, winsorize


def _ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["node"]: r["rank"] for r in pagerank(df, **kw).collect()}


def test_pagerank_symmetric_cycle(spark):
    # 1 <-> 2: symmetry forces equal ranks at every iteration
    r = _ranks(spark, [(1, 2), (2, 1)], n_iter=5)
    assert r[1] == pytest.approx(r[2])
    assert r[1] + r[2] == pytest.approx(1.0)


def test_pagerank_mass_conserved_with_dangling(spark):
    # node 3 has no out-edges: without redistribution total mass decays
    r = _ranks(spark, [(1, 2), (2, 3), (1, 3)], n_iter=4)
    assert sum(r.values()) == pytest.approx(1.0, abs=1e-9)
    # sink node accumulates the most rank
    assert r[3] == max(r.values())


def test_pagerank_star_center_wins(spark):
    # pure star: every spoke points at the (dangling) center — the center
    # must dominate, spokes stay symmetric, and the dangling redistribution
    # keeps the total at 1
    edges = [(i, 0) for i in range(1, 6)]
    r = _ranks(spark, edges, n_iter=6)
    assert r[0] == max(r.values())
    spoke_ranks = {v for k, v in r.items() if k != 0}
    assert len(spoke_ranks) == 1  # symmetry
    assert sum(r.values()) == pytest.approx(1.0, abs=1e-9)


def test_table_diff_classification(spark):
    left = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, None, 40.0)],
        "k long, s string, v double",
    )
    right = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B", 20.0), (4, "null", 40.0), (5, "e", 50.0)],
        "k long, s string, v double",
    )
    d = {r["k"]: r["diff"] for r in table_diff(left, right, ["k"]).collect()}
    assert d == {1: "same", 2: "changed", 3: "only_left", 4: "changed", 5: "only_right"}
    # 4 is 'changed', not 'same': SQL NULL vs the string 'null' must differ
    # (typed struct hashing, not string concatenation)


def test_table_diff_no_compare_cols(spark):
    left = spark.createDataFrame([(1,), (2,)], "k long")
    right = spark.createDataFrame([(2,), (3,)], "k long")
    d = {r["k"]: r["diff"] for r in table_diff(left, right, ["k"]).collect()}
    assert d == {1: "only_left", 2: "same", 3: "only_right"}


def test_winsorize_clips_only_tails(spark):
    df = spark.range(101).select(F.col("id").cast("double").alias("v"))
    out = winsorize(df, "v", 0.05, 0.95, out_col="c").collect()
    vals = sorted(r["c"] for r in out)
    assert vals[0] == pytest.approx(5.0) and vals[-1] == pytest.approx(95.0)
    assert len(vals) == 101  # winsorizing never drops rows
    # interior untouched
    assert 50.0 in vals
    with pytest.raises(ValueError):
        winsorize(df, "v", 0.9, 0.1)


def test_mad_outliers_flags_planted(spark):
    data = [(i, 100.0 + (i % 7) - 3) for i in range(100)] + [(900, 1e6), (901, -1e6)]
    df = spark.createDataFrame(data, "id long, v double")
    out = {r["id"]: r["is_outlier"] for r in mad_outliers(df, "v").collect()}
    assert out[900] and out[901]
    assert sum(out.values()) == 2


def test_mad_outliers_zero_mad(spark):
    # majority-constant column: MAD = 0, non-modal values flagged
    df = spark.createDataFrame([(i, 5.0) for i in range(20)] + [(99, 6.0)], "id long, v double")
    out = {r["id"]: r["is_outlier"] for r in mad_outliers(df, "v").collect()}
    assert out[99] and sum(out.values()) == 1


def test_count_triangles_known_graph(spark):
    """K4 has 4 triangles; adding a pendant edge and a duplicate/reversed/
    self-loop edge changes nothing after canonicalization."""
    from zio_analytics_spark.operators.graph import count_triangles

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    noisy = k4 + [(2, 1), (3, 3), (0, 9), (1, 0)]  # reversed, loop, pendant, dup
    df = spark.createDataFrame(noisy, "src long, dst long")
    assert count_triangles(df).first()["n_triangles"] == 4


def test_count_triangles_skewed_hub(spark):
    """A star (hub + 50 leaves) has zero triangles regardless of hub
    degree; closing one leaf-leaf edge creates exactly one."""
    from zio_analytics_spark.operators.graph import count_triangles

    star = [(0, i) for i in range(1, 51)]
    df = spark.createDataFrame(star, "src long, dst long")
    assert count_triangles(df).first()["n_triangles"] == 0
    closed = spark.createDataFrame(star + [(1, 2)], "src long, dst long")
    assert count_triangles(closed).first()["n_triangles"] == 1
