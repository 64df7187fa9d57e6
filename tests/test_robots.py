"""Robots Exclusion Protocol contract (operators/robots.py — RFC 9309):
group assembly, agent selection (specific beats ``*``), longest-match /
allow-tie decisions, wildcard + anchor patterns, regex-special escaping,
and the frontier-composition the gate exists for.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from zio_analytics_spark.operators.robots import (
    apply_robots,
    robots_filter_frontier,
    robots_rules,
)

_TXT = """\
# politeness file
User-Agent: ZAS-Bot
User-agent: otherbot
Disallow: /private/
Allow: /private/ok*
Crawl-delay: 10
Sitemap: https://ex.org/sitemap.xml

User-agent: *
Disallow: /
Allow: /pub

User-agent: anchors
Disallow: /pub$
Disallow: /a*z$
Disallow: /file.php
Disallow:
"""


def _decide(spark, agent, urls, txt=_TXT, host="ex.org"):
    robots = spark.createDataFrame([(host, txt)], "host string, robots_txt string")
    fr = spark.createDataFrame([(host, u) for u in urls], "host string, url string")
    rows = apply_robots(fr, robots_rules(robots, agent)).collect()
    return {r["url"]: r["allowed"] for r in rows}


def test_specific_group_beats_star(spark):
    got = _decide(spark, "zas-bot", [
        "https://ex.org/private/a",     # specific group disallow
        "https://ex.org/private/okay",  # longer allow wildcard wins
        "https://ex.org/pub",           # star group NOT consulted
        "https://ex.org",               # no rule matches '/'
    ])
    assert got["https://ex.org/private/a"] is False
    assert got["https://ex.org/private/okay"] is True
    assert got["https://ex.org/pub"] is True
    assert got["https://ex.org"] is True


def test_star_fallback_longest_match(spark):
    got = _decide(spark, "unknown-bot", [
        "https://ex.org/x",     # Disallow:/ (len 1)
        "https://ex.org/pub",   # Allow:/pub (len 4) outranks
        "https://ex.org/pub2",  # prefix match still allows
        "https://ex.org",       # '/' disallowed
    ])
    assert got["https://ex.org/x"] is False
    assert got["https://ex.org/pub"] is True
    assert got["https://ex.org/pub2"] is True
    assert got["https://ex.org"] is False


def test_anchor_wildcard_and_escaping(spark):
    got = _decide(spark, "anchors", [
        "https://ex.org/pub",        # $-anchored: exact end only
        "https://ex.org/pub2",       # not anchored-match -> allowed
        "https://ex.org/abcz",       # /a*z$ matches
        "https://ex.org/abcza",      # anchored, trailing 'a' -> allowed
        "https://ex.org/file.php",   # literal dot
        "https://ex.org/fileXphp",   # dot escaped: no match
    ])
    assert got["https://ex.org/pub"] is False
    assert got["https://ex.org/pub2"] is True
    assert got["https://ex.org/abcz"] is False
    assert got["https://ex.org/abcza"] is True
    assert got["https://ex.org/file.php"] is False
    assert got["https://ex.org/fileXphp"] is True


def test_allow_wins_length_tie(spark):
    txt = "User-agent: *\nDisallow: /dir/\nAllow: /dirx/\n"
    # same-length patterns both matching is impossible for distinct
    # literals; pin the tie with identical-length overlapping wildcards
    txt2 = "User-agent: *\nDisallow: /p*\nAllow: /p*\n"
    got = _decide(spark, "any", ["https://ex.org/p1"], txt=txt2)
    assert got["https://ex.org/p1"] is True
    got = _decide(spark, "any", ["https://ex.org/dir/a", "https://ex.org/dirx/a"], txt=txt)
    assert got["https://ex.org/dir/a"] is False
    assert got["https://ex.org/dirx/a"] is True


def test_query_in_match_target(spark):
    txt = "User-agent: *\nDisallow: /*?session=\n"
    got = _decide(spark, "any", [
        "https://ex.org/p?session=1",
        "https://ex.org/p?id=2",
        "https://ex.org?session=3",   # empty path -> '/?session=3'
    ], txt=txt)
    assert got["https://ex.org/p?session=1"] is False
    assert got["https://ex.org/p?id=2"] is True
    assert got["https://ex.org?session=3"] is False


def test_empty_disallow_and_unknown_fields_ignored(spark):
    txt = "User-agent: *\nDisallow:\nCrawl-delay: 5\nNoise here\n"
    got = _decide(spark, "any", ["https://ex.org/x"], txt=txt)
    assert got["https://ex.org/x"] is True


def test_missing_host_and_empty_rules_allow(spark):
    robots = spark.createDataFrame(
        [("ex.org", "User-agent: *\nDisallow: /\n")],
        "host string, robots_txt string",
    )
    fr = spark.createDataFrame(
        [("ex.org", "https://ex.org/a"), ("other.org", "https://other.org/b")],
        "host string, url string",
    )
    rows = apply_robots(fr, robots_rules(robots, "any")).collect()
    got = {r["url"]: r["allowed"] for r in rows}
    assert got["https://ex.org/a"] is False
    assert got["https://other.org/b"] is True  # no robots row -> allowed


def test_consecutive_ua_lines_share_group(spark):
    got = _decide(spark, "otherbot", ["https://ex.org/private/a"])
    assert got["https://ex.org/private/a"] is False


def test_filter_frontier_composition(spark):
    robots = spark.createDataFrame(
        [("ex.org", "User-agent: *\nDisallow: /private/\n")],
        "host string, robots_txt string",
    )
    fr = spark.createDataFrame(
        [("ex.org", "https://ex.org/a"), ("ex.org", "https://ex.org/private/b")],
        "host string, url string",
    )
    kept = robots_filter_frontier(fr, robots, "zas-bot")
    assert [r["url"] for r in kept.collect()] == ["https://ex.org/a"]
    assert "allowed" not in kept.columns


def test_decision_is_single_broadcast_join_no_shuffle(spark):
    """apply_robots over a MATERIALIZED rules dim (the production shape:
    rules are a prepared per-host artifact) is one broadcast join + a
    map — zero shuffle Exchanges anywhere in the plan."""
    robots = spark.createDataFrame(
        [("ex.org", "User-agent: *\nDisallow: /private/\n")],
        "host string, robots_txt string",
    )
    built = robots_rules(robots, "zas-bot")
    rules = spark.createDataFrame(built.collect(), built.schema)
    fr = spark.range(100).select(
        F.concat(F.lit("https://ex.org/p/"), F.col("id")).alias("url")
    ).withColumn("host", F.regexp_extract("url", r"://([^/]*)", 1))
    out = apply_robots(fr, F.broadcast(rules))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "hashpartitioning" not in plan
    assert out.where(~F.col("allowed")).count() == 0


def test_hints_sitemaps_and_crawl_delay(spark):
    from zio_analytics_spark.operators.robots import robots_hints

    txt = (
        "Sitemap: https://ex.org/s1.xml\n"
        "User-agent: zas-bot\nCrawl-delay: 3\nDisallow: /a\n"
        "Sitemap: https://ex.org/s0.xml\n"
        "\n"
        "User-agent: zas-bot\nCrawl-delay: 5\n"
        "\n"
        "User-agent: *\nCrawl-delay: 99\n"
    )
    robots = spark.createDataFrame(
        [("ex.org", txt), ("bare.org", "User-agent: *\nDisallow: /x\n")],
        "host string, robots_txt string",
    )
    got = {r["host"]: r for r in robots_hints(robots, "zas-bot").collect()}
    # sitemaps are group-independent and sorted; delay is the MIN over
    # the selected (specific) groups -- the * group's 99 must not apply
    assert got["ex.org"]["sitemaps"] == [
        "https://ex.org/s0.xml", "https://ex.org/s1.xml",
    ]
    assert got["ex.org"]["crawl_delay"] == 3.0
    assert got["bare.org"]["sitemaps"] == []
    assert got["bare.org"]["crawl_delay"] is None
    # star fallback agent sees the * group's delay
    star = {r["host"]: r for r in robots_hints(robots, "nobody").collect()}
    assert star["ex.org"]["crawl_delay"] == 99.0


def test_hints_junk_delay_drops_and_ua_run_breaks(spark):
    from zio_analytics_spark.operators.robots import robots_hints, robots_rules

    txt = (
        "User-agent: a\nCrawl-delay: fast\n"   # junk -> try_cast NULL
        "User-agent: b\nDisallow: /b\n"        # delay line BREAKS the UA run:
    )                                          # agent b must NOT inherit /b? no — b's own group has /b
    robots = spark.createDataFrame([("h", txt)], "host string, robots_txt string")
    got = robots_hints(robots, "a").collect()[0]
    assert got["crawl_delay"] is None
    # the crawl-delay line between the two UA lines splits the groups:
    # agent a's group has no rules, agent b's group disallows /b
    ra = robots_rules(robots, "a").collect()[0]["rules"]
    rb = robots_rules(robots, "b").collect()[0]["rules"]
    assert ra == [] and len(rb) == 1 and rb[0]["allow"] is False


def _py_decide(rules, target):
    """Pure-Python reference of the documented decision spec: longest
    pattern wins, allow wins ties, no match -> allowed. Wildcard match
    done by regex translation INDEPENDENT of the Column code path."""
    import re as _re

    best = None  # (pat_len, allow)
    for allow, pat in rules:
        anchored = pat.endswith("$")
        core = pat[:-1] if anchored else pat
        rx = "^" + ".*".join(_re.escape(seg) for seg in core.split("*"))
        if anchored:
            rx += "$"
        if _re.search(rx, target):
            key = (len(pat), allow)
            if best is None or key > best:
                best = key
    return True if best is None else best[1]


def test_differential_random_patterns(spark):
    """Seeded randomized differential: 150 (ruleset, path) cases decided
    by ONE Spark job vs the independent Python reference."""
    import random

    rng = random.Random(1207)
    segs = ["/a", "/b", "/ab", "/a.b", "/c/", "/(d)", "/e+f"]
    cases = []
    for i in range(150):
        n_rules = rng.randint(1, 5)
        rules = []
        for _ in range(n_rules):
            pat = "".join(rng.choice(segs) for _ in range(rng.randint(1, 3)))
            if rng.random() < 0.4:
                pat = pat.replace(rng.choice(segs), "*", 1) if rng.random() < 0.5 else pat + "*"
            if rng.random() < 0.3:
                pat += "$"
            if not pat.startswith(("/", "*")):
                pat = "/" + pat
            rules.append((rng.random() < 0.5, pat))
        target = "".join(rng.choice(segs) for _ in range(rng.randint(1, 4)))
        cases.append((i, rules, target))

    robots_rows, fr_rows = [], []
    for i, rules, target in cases:
        host = f"h{i}.org"
        txt = "User-agent: *\n" + "".join(
            f"{'Allow' if a else 'Disallow'}: {p}\n" for a, p in rules
        )
        robots_rows.append((host, txt))
        fr_rows.append((host, f"https://{host}{target}"))
    robots = spark.createDataFrame(robots_rows, "host string, robots_txt string")
    fr = spark.createDataFrame(fr_rows, "host string, url string")
    got = {
        r["host"]: r["allowed"]
        for r in apply_robots(fr, robots_rules(robots, "any")).collect()
    }
    for i, rules, target in cases:
        expect = _py_decide(rules, target)
        assert got[f"h{i}.org"] == expect, (i, rules, target, got[f"h{i}.org"], expect)


def test_fetch_status_semantics(spark):
    """RFC 9309 §2.3.1: 2xx parses, 4xx allows all, 5xx/unreachable
    assumes complete disallow."""
    rows = [
        ("ok.org", "User-agent: *\nDisallow: /private/\n", 200),
        ("gone.org", "", 404),
        ("down.org", "", 503),
        ("dead.org", "", None),
    ]
    robots = spark.createDataFrame(
        rows, "host string, robots_txt string, status int"
    )
    fr = spark.createDataFrame(
        [("ok.org", "https://ok.org/private/a"), ("ok.org", "https://ok.org/x"),
         ("gone.org", "https://gone.org/anything"),
         ("down.org", "https://down.org/anything"),
         ("dead.org", "https://dead.org/anything")],
        "host string, url string",
    )
    rules = robots_rules(robots, "zas-bot", status_col="status")
    got = {r["url"]: r["allowed"] for r in apply_robots(fr, rules).collect()}
    assert got["https://ok.org/private/a"] is False
    assert got["https://ok.org/x"] is True
    assert got["https://gone.org/anything"] is True     # 404 -> crawl all
    assert got["https://down.org/anything"] is False    # 503 -> assume disallow
    assert got["https://dead.org/anything"] is False    # unreachable -> disallow
