"""BFS k-hop distances (operators/graph.py bfs_distances): path graphs,
shortest-wins, reachability bounds, directedness, multi-source."""


# ---------------------------------------------------------------------------
# bfs_distances
# ---------------------------------------------------------------------------


def _bfs(spark, edges, sources, k, directed=False):
    from zio_analytics_spark.operators.graph import bfs_distances

    e = spark.createDataFrame(edges, "src string, dst string")
    s = spark.createDataFrame([(x,) for x in sources], "node string")
    return {
        r["node"]: r["dist"]
        for r in bfs_distances(e, s, max_hops=k, directed=directed).collect()
    }


def test_bfs_path_graph(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    assert _bfs(spark, edges, ["a"], 3) == {"a": 0, "b": 1, "c": 2, "d": 3}


def test_bfs_unreachable_excluded_and_shortest_wins(spark):
    # diamond: a-b-d and a-c-d plus a long detour d-e; island x-y
    edges = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e"), ("x", "y")]
    got = _bfs(spark, edges, ["a"], 10)
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2, "e": 3}


def test_bfs_directed_vs_undirected(spark):
    edges = [("a", "b"), ("c", "b")]
    assert _bfs(spark, edges, ["a"], 3, directed=True) == {"a": 0, "b": 1}
    assert _bfs(spark, edges, ["a"], 3, directed=False) == {"a": 0, "b": 1, "c": 2}


def test_bfs_multi_source_takes_min(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "d")]
    got = _bfs(spark, edges, ["a", "d"], 5)
    assert got == {"a": 0, "d": 0, "b": 1, "c": 1}


def test_bfs_zero_hops_and_validation(spark):
    import pytest

    from zio_analytics_spark.operators.graph import bfs_distances

    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    s = spark.createDataFrame([("a",)], "node string")
    assert {r["node"] for r in bfs_distances(e, s, 0).collect()} == {"a"}
    with pytest.raises(ValueError):
        bfs_distances(e, s, -1)
