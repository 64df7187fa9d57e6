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


def test_single_reference_rewrite_cases(spark):
    """Pins the round-16 single-reference rewrite of canonical_url_expr
    (each step references its input once, so the interpreted HOF path
    evaluates the chain once per element): the prefix-grain port strip
    and empty-path insert behave exactly like the old scheme/auth/rest
    CASEs on every well-formed shape, and the degenerate scheme-colon-
    without-authority form now canonicalizes to NULL (spec step 7 — not
    fetchable) instead of the old garbage 'http://http:foo'."""
    got = _canon(spark, [
        "http://user:80@Host.COM:8080/x",   # port-like userinfo kept
        "http://user:80@Host.COM:80/x",     # real default port stripped
        "https://a.b:443:443/x",            # only the trailing :443
        "https://a.b:80/x",                 # https keeps :80
        "http:opaque", "https:opaque", "http:",  # degenerate -> NULL
    ])
    assert got["http://user:80@Host.COM:8080/x"] == "http://user:80@host.com:8080/x"
    assert got["http://user:80@Host.COM:80/x"] == "http://user:80@host.com/x"
    assert got["https://a.b:443:443/x"] == "https://a.b:443/x"
    assert got["https://a.b:80/x"] == "https://a.b:80/x"
    assert got["http:opaque"] is None
    assert got["https:opaque"] is None
    assert got["http:"] is None


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


# ---------------------------------------------------------------------
# SURT urlkey + politeness scheduling (round 12)
# ---------------------------------------------------------------------

def test_surt_key_cases(spark):
    from zio_analytics_spark.operators.url import surt_key_expr

    urls = [
        "https://ex.org/a?b=2&a=1",       # query sorted
        "https://ex.org/p/q.html",        # plain path
        "https://sub.ex.org:8080",        # port kept, empty path -> /
        "http://EX.org/Case?z=1",         # host lowered, path case kept
        "https://ex.org/?x=1",            # root path with query
    ]
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    rows = df.select("u", surt_key_expr(F.col("u")).alias("s")).collect()
    got = {r["u"]: r["s"] for r in rows}
    assert got["https://ex.org/a?b=2&a=1"] == "org,ex)/a?a=1&b=2"
    assert got["https://ex.org/p/q.html"] == "org,ex)/p/q.html"
    assert got["https://sub.ex.org:8080"] == "org,ex,sub:8080)/"
    assert got["http://EX.org/Case?z=1"] == "org,ex)/Case?z=1"
    assert got["https://ex.org/?x=1"] == "org,ex)/?x=1"


def test_surt_clusters_hosts(spark):
    """The property the key exists for: one registrable domain's pages
    sort contiguously across its subdomains."""
    from zio_analytics_spark.operators.url import surt_key_expr

    urls = [
        "https://a.ex.org/1", "https://zoo.com/2", "https://b.ex.org/3",
        "https://ex.org/4",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    keys = [
        r["s"] for r in
        df.select(surt_key_expr(F.col("u")).alias("s")).orderBy("s").collect()
    ]
    ex = [k for k in keys if k.startswith("org,ex")]
    assert keys.index(ex[0]) + len(ex) == keys.index(ex[-1]) + 1  # contiguous


def test_frontier_schedule_cap_waves_buckets(spark):
    from zio_analytics_spark.operators.url import frontier_schedule

    fr = spark.range(600).select(
        F.concat(F.lit("h"), (F.col("id") % 3).cast("string"), F.lit(".org")).alias("host"),
        F.concat(F.lit("https://h/p"), F.col("id")).alias("url"),
        (F.col("id") % 41).cast("long").alias("priority"),
    )
    out = frontier_schedule(fr, per_host_cap=50, host_parallelism=8, n_buckets=4)
    rows = out.collect()
    import collections
    per_host = collections.Counter(r["host"] for r in rows)
    assert set(per_host.values()) == {50}                      # cap applied
    by_host = collections.defaultdict(list)
    for r in rows:
        by_host[r["host"]].append(r)
    for host, hr in by_host.items():
        hr.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in hr] == list(range(1, 51))
        # priorities non-increasing in rank order
        pr = [r["priority"] for r in hr]
        assert all(a >= b for a, b in zip(pr, pr[1:]))
        # at most 8 fetches per wave, waves contiguous from 1
        waves = collections.Counter(r["wave"] for r in hr)
        assert max(waves.values()) <= 8 and min(waves) == 1
        assert sorted(waves) == list(range(1, max(waves) + 1))
        # one bucket per host, in range
        assert len({r["bucket"] for r in hr}) == 1
        assert 0 <= hr[0]["bucket"] < 4


def test_frontier_schedule_deterministic(spark):
    from zio_analytics_spark.operators.url import frontier_schedule

    fr = spark.range(40).select(
        F.lit("one.org").alias("host"),
        F.concat(F.lit("https://one.org/"), F.col("id")).alias("url"),
        F.lit(7).cast("long").alias("priority"),  # all ties -> url breaks them
    )
    a = frontier_schedule(fr, per_host_cap=10).collect()
    b = frontier_schedule(fr, per_host_cap=10).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    urls = [r["url"] for r in sorted(a, key=lambda r: r["rank"])]
    assert urls == sorted(urls)


def test_resolve_redirects_chains_loops_and_relative(spark):
    from zio_analytics_spark.operators.url import resolve_redirects

    rows = [
        # two-hop chain, relative + absolute Locations
        ("https://ex.org/a", 301, "/b"),
        ("https://ex.org/b", 302, "https://ex.org/c"),
        ("https://ex.org/c", 200, None),
        # self-loop: never resolves
        ("https://ex.org/loop", 301, "/loop"),
        # 2-cycle: never resolves
        ("https://ex.org/x", 301, "/y"),
        ("https://ex.org/y", 302, "/x"),
        # redirect to an unfetched target: resolves (target not a source)
        ("https://ex.org/out", 307, "https://other.org/land"),
        # 3xx with no Location: stays put, resolved
        ("https://ex.org/weird", 304, None),
    ]
    df = spark.createDataFrame(rows, "url string, status int, location string")
    got = {r["url"]: r for r in resolve_redirects(df).collect()}
    a = got["https://ex.org/a"]
    assert (a["final_url"], a["hops"], a["resolved"]) == ("https://ex.org/c", 2, True)
    b = got["https://ex.org/b"]
    assert (b["final_url"], b["hops"], b["resolved"]) == ("https://ex.org/c", 1, True)
    c = got["https://ex.org/c"]
    assert (c["final_url"], c["hops"], c["resolved"]) == ("https://ex.org/c", 0, True)
    assert got["https://ex.org/loop"]["resolved"] is False
    assert got["https://ex.org/x"]["resolved"] is False
    assert got["https://ex.org/y"]["resolved"] is False
    o = got["https://ex.org/out"]
    assert (o["final_url"], o["hops"], o["resolved"]) == (
        "https://other.org/land", 1, True,
    )
    w = got["https://ex.org/weird"]
    assert (w["final_url"], w["hops"], w["resolved"]) == (
        "https://ex.org/weird", 0, True,
    )


def test_resolve_redirects_hop_bound(spark):
    from zio_analytics_spark.operators.url import resolve_redirects

    rows = [(f"https://ex.org/{i}", 301, f"/{i+1}") for i in range(5)] + [
        ("https://ex.org/5", 200, None)
    ]
    df = spark.createDataFrame(rows, "url string, status int, location string")
    got = {r["url"]: r for r in resolve_redirects(df, max_hops=3).collect()}
    # 5 hops needed from /0 -> bound at 3, still on a redirect source
    assert got["https://ex.org/0"]["hops"] == 3
    assert got["https://ex.org/0"]["resolved"] is False
    # /3 needs exactly 2 -> fine
    assert got["https://ex.org/3"]["final_url"] == "https://ex.org/5"
    assert got["https://ex.org/3"]["resolved"] is True


def test_resolve_redirects_random_differential(spark):
    """Seeded random redirect graphs (chains, trees, loops, dead ends)
    decided in one Spark job vs an independent Python walk."""
    import random

    rng = random.Random(88)
    rows, ref_edges, statuses = [], {}, {}
    n = 120
    for i in range(n):
        url = f"https://ex.org/p{i}"
        if rng.random() < 0.5:
            dst = f"/p{rng.randrange(n)}"
            rows.append((url, rng.choice([301, 302, 307, 308]), dst))
            ref_edges[url] = f"https://ex.org{dst}"
        else:
            rows.append((url, rng.choice([200, 404, 500]), None))
        statuses[url] = rows[-1][1]

    def walk(u, hops_left=3):
        hops = 0
        while u in ref_edges and hops < 3:
            u = ref_edges[u]
            hops += 1
        return u, hops, u not in ref_edges

    from zio_analytics_spark.operators.url import resolve_redirects

    df = spark.createDataFrame(rows, "url string, status int, location string")
    got = {r["url"]: r for r in resolve_redirects(df).collect()}
    assert len(got) == n
    for u in statuses:
        fin, hops, resolved = walk(u)
        g = got[u]
        assert (g["final_url"], g["hops"], g["resolved"]) == (fin, hops, resolved), (
            u, (g["final_url"], g["hops"], g["resolved"]), (fin, hops, resolved),
        )


def test_surt_random_differential(spark):
    """Random canonical URLs: Column SURT vs an independent
    urllib-based Python construction."""
    import random
    from urllib.parse import urlsplit

    rng = random.Random(4096)
    hosts = ["ex.org", "a.b.ex.org", "x.io", "deep.sub.domain.example.co.uk"]
    urls = []
    for _ in range(80):
        host = rng.choice(hosts)
        port = rng.choice(["", ":8080", ":81"])
        path = "/" + "/".join(
            rng.choice(["a", "B", "c-d", "e.f"]) for _ in range(rng.randrange(3))
        ).rstrip("/")
        params = [f"{rng.choice('zyx')}={rng.randrange(9)}" for _ in range(rng.randrange(3))]
        q = "?" + "&".join(params) if params else ""
        urls.append(f"https://{host}{port}{path}{q}")

    def py_surt(u):
        s = urlsplit(u)
        host = s.hostname
        key = ",".join(reversed(host.split(".")))
        if s.port is not None:
            key += f":{s.port}"
        key += ")" + (s.path or "/")
        if s.query:
            key += "?" + "&".join(sorted(s.query.split("&")))
        return key

    from zio_analytics_spark.operators.url import surt_key_expr

    df = spark.createDataFrame([(u,) for u in urls], "u string")
    got = {r["u"]: r["s"] for r in df.select("u", surt_key_expr(F.col("u")).alias("s")).collect()}
    for u in urls:
        assert got[u] == py_surt(u), (u, got[u], py_surt(u))
