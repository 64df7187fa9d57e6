"""BFS k-hop distances (operators/graph.py bfs_distances): path graphs,
shortest-wins, reachability bounds, directedness, multi-source."""


# ---------------------------------------------------------------------------
# bfs_distances
# ---------------------------------------------------------------------------


import pytest


def _bfs(spark, edges, sources, k, directed=False, fold=True):
    from zio_analytics_spark.operators.graph import bfs_distances

    e = spark.createDataFrame(edges, "src string, dst string")
    s = spark.createDataFrame([(x,) for x in sources], "node string")
    return {
        r["node"]: r["dist"]
        for r in bfs_distances(
            e, s, max_hops=k, directed=directed, fold_adjacency=fold
        ).collect()
    }


@pytest.mark.parametrize("fold", [True, False])
def test_bfs_path_graph(spark, fold):
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    assert _bfs(spark, edges, ["a"], 3, fold=fold) == {
        "a": 0, "b": 1, "c": 2, "d": 3,
    }


@pytest.mark.parametrize("fold", [True, False])
def test_bfs_unreachable_excluded_and_shortest_wins(spark, fold):
    # diamond: a-b-d and a-c-d plus a long detour d-e; island x-y
    edges = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e"), ("x", "y")]
    got = _bfs(spark, edges, ["a"], 10, fold=fold)
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2, "e": 3}


@pytest.mark.parametrize("fold", [True, False])
def test_bfs_directed_vs_undirected(spark, fold):
    edges = [("a", "b"), ("c", "b")]
    assert _bfs(spark, edges, ["a"], 3, directed=True, fold=fold) == {
        "a": 0, "b": 1,
    }
    assert _bfs(spark, edges, ["a"], 3, directed=False, fold=fold) == {
        "a": 0, "b": 1, "c": 2,
    }


@pytest.mark.parametrize("fold", [True, False])
def test_bfs_multi_source_takes_min(spark, fold):
    edges = [("a", "b"), ("b", "c"), ("c", "d")]
    got = _bfs(spark, edges, ["a", "d"], 5, fold=fold)
    assert got == {"a": 0, "d": 0, "b": 1, "c": 1}


def test_bfs_zero_hops_and_validation(spark):
    import pytest

    from zio_analytics_spark.operators.graph import bfs_distances

    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    s = spark.createDataFrame([("a",)], "node string")
    assert {r["node"] for r in bfs_distances(e, s, 0).collect()} == {"a"}
    with pytest.raises(ValueError):
        bfs_distances(e, s, -1)


def test_personalized_pagerank_mass_and_locality(spark):
    from pyspark.sql import functions as F

    from zio_analytics_spark.operators.graph import pagerank, pagerank_personalized

    # seed component: a small DAG fan-out (1 -> 2, 1 -> 3, 2 -> 3);
    # second component is a disconnected cycle the walk can never reach
    edges = [(1, 2), (1, 3), (2, 3), (10, 11), (11, 12), (12, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    ppr = {r["node"]: r["rank"] for r in pagerank_personalized(df, seeds=[1], n_iter=4).collect()}
    # unreachable component gets exactly zero; seed component holds all mass
    assert ppr[10] == ppr[11] == ppr[12] == 0.0
    assert abs(sum(ppr.values()) - 1.0) < 1e-9
    # every node in the seed's component carries mass; exact ordering is
    # transient-dependent, so assert reachability + a healthy seed share
    assert min(ppr[1], ppr[2], ppr[3]) > 0
    assert ppr[1] > 0.25
    # global pagerank gives the far component nonzero uniform-floor mass
    gpr = {r["node"]: r["rank"] for r in pagerank(df, n_iter=4).collect()}
    assert gpr[10] > 0.05


def test_personalized_pagerank_validates(spark):
    import pytest

    from zio_analytics_spark.operators.graph import pagerank_personalized

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        pagerank_personalized(df, seeds=[])


@pytest.mark.parametrize("fold", ["auto"])
def test_bfs_auto_matches_explicit(spark, fold):
    edges = [("a", "b"), ("b", "c"), ("c", "d")]
    got = _bfs(spark, edges, ["a"], 3, fold=fold)
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3}


def test_degree_probe_auto_selects_flat_on_supernode(spark, monkeypatch):
    """Round-17 (VERDICT r16 #7): the 'auto' adjacency choice must pick the
    flat edge table on a supernode graph and the fold on a benign one."""
    from pyspark.sql import functions as F

    from zio_analytics_spark.operators import graph as G

    monkeypatch.setattr(G, "FOLD_MAX_DEGREE", 1000)
    monkeypatch.setattr(G, "_DEGREE_PROBE_FRACTION", 0.5)
    # star: one hub with 20k neighbors -> flat
    star = spark.range(20_000).select(
        F.lit("hub").alias("src"), F.col("id").cast("string").alias("dst")
    )
    assert G._fold_degree_ok(star) is False
    # path graph: max degree 1 -> fold
    path = spark.range(500).select(
        F.col("id").cast("string").alias("src"),
        (F.col("id") + 1).cast("string").alias("dst"),
    )
    assert G._fold_degree_ok(path) is True
