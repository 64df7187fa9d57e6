"""URL canonicalization contract (operators/url.py — round-10 verdict
ask #6): resolution classes, each canonicalization step, the bounded
dot-dot pass count, and the frontier-dedup composition the operator
exists for.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from zio_analytics_spark.operators.url import (
    DOTDOT_PASSES,
    canonical_url_expr,
    canonicalize_frontier,
)

_BASE = "HTTPS://Ex.ORG/fr/dir/page.html?s=1#top"


def _canon(spark, hrefs, base=_BASE):
    df = spark.createDataFrame([(h,) for h in hrefs], "href string")
    rows = df.select(
        "href", canonical_url_expr(F.col("href"), F.lit(base)).alias("c")
    ).collect()
    return {r["href"]: r["c"] for r in rows}


def test_resolution_classes(spark):
    got = _canon(spark, [
        "next.html", "./here.html", "../up.html", "/rooted?a=1",
        "//CDN.Ex.org/lib.js", "https://abs.org/x", "#frag", "",
    ])
    assert got["next.html"] == "https://ex.org/fr/dir/next.html"
    assert got["./here.html"] == "https://ex.org/fr/dir/here.html"
    assert got["../up.html"] == "https://ex.org/fr/up.html"
    assert got["/rooted?a=1"] == "https://ex.org/rooted?a=1"
    assert got["//CDN.Ex.org/lib.js"] == "https://cdn.ex.org/lib.js"
    assert got["https://abs.org/x"] == "https://abs.org/x"
    assert got["#frag"] is None and got[""] is None


def test_canonicalization_steps(spark):
    got = _canon(spark, [
        "HTTP://Other.COM:80/Path/File?Q=v#f",   # case, default port, fragment
        "https://a.b:443/x", "https://a.b:8080/x",  # default vs real port
        "https://a.b", "https://a.b?utm_x=1",        # empty path -> '/'
        "https://a.b/p?utm_a=1&utm_b=2",             # utm-only query drops
        "https://a.b/p?utm_a=1&q=2&utm_b=3",         # interior survivors
        "https://a.b/p?q=2&utm_a=1",
        "mailto:x@y.z", "javascript:void(0)", "data:text/plain,hi",
    ])
    # path/query case preserved, scheme/host lowered
    assert got["HTTP://Other.COM:80/Path/File?Q=v#f"] == "http://other.com/Path/File?Q=v"
    assert got["https://a.b:443/x"] == "https://a.b/x"
    assert got["https://a.b:8080/x"] == "https://a.b:8080/x"
    assert got["https://a.b"] == "https://a.b/"
    assert got["https://a.b?utm_x=1"] == "https://a.b/"
    assert got["https://a.b/p?utm_a=1&utm_b=2"] == "https://a.b/p"
    assert got["https://a.b/p?utm_a=1&q=2&utm_b=3"] == "https://a.b/p?q=2"
    assert got["https://a.b/p?q=2&utm_a=1"] == "https://a.b/p?q=2"
    for h in ("mailto:x@y.z", "javascript:void(0)", "data:text/plain,hi"):
        assert got[h] is None


def test_dot_segments_bounded(spark):
    got = _canon(spark, [
        "https://a.b/x/y/../../z.html",
        "https://a.b/../up",
        "https://a.b/a/b/c/d/../../../../e",      # exactly DOTDOT_PASSES deep
        "https://a.b/1/2/3/4/5/../../../../../e",  # one deeper: left as-is tail
    ])
    assert got["https://a.b/x/y/../../z.html"] == "https://a.b/z.html"
    assert got["https://a.b/../up"] == "https://a.b/up"
    assert got["https://a.b/a/b/c/d/../../../../e"] == "https://a.b/e"
    # the 5th ../ survives the 4 passes — un-collapsed IDENTICALLY on
    # both engines is the documented bounded-pass contract
    assert DOTDOT_PASSES == 4
    assert got["https://a.b/1/2/3/4/5/../../../../../e"] == "https://a.b/1/../e"


def test_frontier_dedup_composition(spark):
    """Why the operator exists: three spellings of one target collide
    canonically — within a page (array_distinct) and across pages
    (explode → distinct)."""
    df = spark.createDataFrame(
        [
            (1, "https://site.org/a/page.html",
             ["HTTP://Tgt.org:80/x", "/b/../x2"]),
            (2, "http://site.org/c/page.html",
             ["http://tgt.org/x#sec", "http://tgt.org/x?utm_ref=2", "/x2"]),
        ],
        "doc_id long, base_url string, links array<string>",
    )
    out = canonicalize_frontier(df)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["frontier"] == ["http://tgt.org/x", "https://site.org/x2"]
    assert rows[2]["frontier"] == ["http://site.org/x2", "http://tgt.org/x"]
    assert rows[1]["n_out"] == 2 and rows[2]["n_out"] == 2
    global_frontier = (
        out.select(F.explode("frontier").alias("u")).distinct().count()
    )
    assert global_frontier == 3  # tgt/x collides across pages


def test_frontier_is_map_only(spark):
    df = spark.createDataFrame(
        [(1, "https://a.b/", ["x.html"])],
        "doc_id long, base_url string, links array<string>",
    )
    plan = canonicalize_frontier(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
