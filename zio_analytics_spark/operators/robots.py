"""[EXT] robots.txt — the Robots Exclusion Protocol (RFC 9309) for the
crawl frontier.

The frontier chain so far is extract (html.html_extract_links) →
canonicalize (url.canonicalize_frontier) → dedup; a production crawler
must then drop every URL its robots.txt disallows BEFORE scheduling a
fetch, or it burns crawl budget and politeness goodwill on pages it must
discard. This module is that gate — parse robots.txt bodies into
per-host rule tables, then decide allow/deny per frontier URL with RFC
9309 longest-match semantics. Round-12 crawl-loop closure (the
verdict's WARC → charset → URL-canonicalize ingest head now has its
politeness gate).

Spec (documented, deterministic; RFC 9309 restated for the crawl
cases — every step is plain Column machinery):

**Parse** (:func:`robots_rules`):

- lines split on ``\\n``; ``#`` comments stripped; surrounding
  whitespace trimmed; a line is *relevant* iff it parses as
  ``field: value`` with field case-insensitively one of
  ``user-agent`` / ``allow`` / ``disallow`` (everything else —
  ``crawl-delay``, ``sitemap``, blank lines, junk — is ignored, per
  RFC 9309 §2.2.4's unknown-line rule);
- over the relevant lines of one host, a ``user-agent`` line STARTS a
  new group iff the previous relevant line is not itself a
  ``user-agent`` line (consecutive UA lines share one group, RFC 9309
  §2.2.1);
- a group applies to crawler ``agent`` iff one of its UA values equals
  ``agent`` case-insensitively, or is ``*``; if ANY group names the
  agent specifically, only the specifically-named groups apply (the
  ``*`` groups are fallback only, §2.2.1); multiple applicable groups
  merge their rules;
- ``allow`` / ``disallow`` rules with an EMPTY value match nothing and
  are dropped (``Disallow:`` on its own line = allow all, §2.2.2).

**Match** (:func:`apply_robots`): the match target is the URL's
``path['?'query]`` (empty path → ``/``). A rule pattern matches as a
prefix, with ``*`` matching any span and a trailing ``$`` anchoring the
end (§2.2.3). Compiled to a Java regex Spark-side only — the catalog
oracle is LITERAL (expected decisions pinned by value), so no regex
dialect is mirrored cross-engine. Decision: among matching rules the
LONGEST pattern (octet length, §2.2.2) wins; a length tie goes to
``allow``; no matching rule → allowed; a host with no rules for this
agent → allowed.

Scale shape: robots.txt bodies are a PER-HOST dimension (one small text
per host — millions of hosts, bytes each, vs billions of frontier
rows). :func:`robots_rules` shuffles only that dimension (explode lines
→ two small window scans → collect per host); :func:`apply_robots` is
ONE equi-join of the frontier against the per-host rule arrays —
broadcast when the host dim fits, hash-join otherwise — followed by a
map-only HOF fold per row (no per-rule row explosion, no second
shuffle, no UDF). At 100 TB of frontier the cost is the one join the
politeness scheduler needs anyway.

Reference scope: the zio-analytics reference has no crawl surface
(sources are ``fromLiterals``, DataStream.scala:87-88); [EXT] for the
LLM-pipeline north star.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "robots_rules",
    "robots_hints",
    "apply_robots",
    "robots_filter_frontier",
]

#: regex-special characters escaped when a rule pattern compiles to a
#: Java regex — everything except ``*`` (wildcard) and the trailing
#: ``$`` (anchor), which carry RFC 9309 meaning.
_SPECIALS = r"([.\[\]{}()+?^$|\\])"

_FIELD_RE = r"^([A-Za-z-]+)[ \t]*:"
_VALUE_RE = r"^[A-Za-z-]+[ \t]*:(.*)$"


def _pattern_regex(pat: Column, anchored: Column) -> Column:
    """RFC 9309 rule pattern → Java regex (prefix match; ``*`` → ``.*``;
    trailing ``$`` already stripped by the caller → ``$`` anchor)."""
    esc = F.regexp_replace(pat, _SPECIALS, r"\\$1")
    body = F.regexp_replace(esc, r"\*", ".*")
    return F.concat(F.lit("^"), body, F.when(anchored, F.lit("$")).otherwise(F.lit("")))


#: fields that constitute a group's lines — a ``user-agent`` line starts
#: a new group iff the previous line in THIS set is not a user-agent
#: line. ``sitemap`` is deliberately absent: it is a standalone
#: directive independent of groups (sitemaps.org), so it neither breaks
#: a UA run nor belongs to any group.
_GROUP_FIELDS = ("user-agent", "allow", "disallow", "crawl-delay")


def _grouped_lines(df: DataFrame, host_col: str, txt_col: str) -> DataFrame:
    """robots.txt bodies → ``(host, line_no, field, value, group_id)``
    over the group-relevant lines (module docstring parse spec)."""
    lines = (
        df.select(
            F.col(host_col).alias("host"),
            F.posexplode(F.split(F.col(txt_col), "\n")).alias("line_no", "raw"),
        )
        .withColumn("line", F.trim(F.regexp_replace("raw", "#.*$", "")))
        .withColumn("field", F.lower(F.regexp_extract("line", _FIELD_RE, 1)))
        .withColumn("value", F.trim(F.regexp_extract("line", _VALUE_RE, 1)))
        .where(F.col("field").isin(*_GROUP_FIELDS))
    )
    w = Window.partitionBy("host").orderBy("line_no")
    return lines.withColumn(
        "group_id",
        F.sum(
            (
                (F.col("field") == "user-agent")
                & (F.coalesce(F.lag("field").over(w), F.lit("")) != "user-agent")
            ).cast("int")
        ).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )


def _selected_groups(grouped: DataFrame, agent: str) -> DataFrame:
    """``(host, group_id)`` of the groups that apply to ``agent`` —
    specific beats ``*`` (RFC 9309 §2.2.1)."""
    ua = grouped.where(F.col("field") == "user-agent").select(
        "host",
        "group_id",
        (F.lower("value") == agent.lower()).alias("is_specific"),
        (F.col("value") == "*").alias("is_star"),
    )
    gsel = ua.groupBy("host", "group_id").agg(
        F.max("is_specific").alias("has_specific"),
        F.max("is_star").alias("has_star"),
    )
    whost = Window.partitionBy("host")
    return (
        gsel.withColumn(
            "selected",
            F.col("has_specific")
            | (F.col("has_star") & ~F.max("has_specific").over(whost)),
        )
        .where("selected")
        .select("host", "group_id")
    )


def robots_rules(
    df: DataFrame,
    agent: str,
    host_col: str = "host",
    txt_col: str = "robots_txt",
    status_col: str | None = None,
) -> DataFrame:
    """Parse robots.txt bodies → one row per host with the rule array
    that applies to ``agent``.

    Output: ``(host, rules array<struct<pat_len int, allow boolean,
    regex string>>)`` — hosts whose robots.txt yields no applicable
    rules keep an empty array (join-friendly: a missing host row and an
    empty array both decide "allowed").

    ``status_col`` (optional) applies RFC 9309 §2.3.1 FETCH semantics to
    the robots.txt request itself: 2xx parses the body; 3xx left
    UNRESOLVED in the log (resolve redirect chains upstream — e.g.
    url.resolve_redirects — before calling) is treated per §2.3.1.2 as
    robots-not-found → empty rules, crawl everything, the same as 4xx
    ("no conditions"); 5xx / unreachable (status NULL or ≥500) means the
    crawler MUST assume complete disallow → one catch-all deny rule.
    Without ``status_col`` every body is treated as fetched (the 2xx
    path).

    Input is deduplicated to ONE row per host first (a retried fetch
    logged at both 503 and 200 must not fan out downstream joins): the
    row with the lowest status wins (a definitive 2xx beats a redirect
    beats an error; ties break on the body bytes), so exactly one rules
    row per host comes out."""
    if status_col is not None:
        status = F.col(status_col)
        # one row per host: min (status, body) struct — 200 < 301 < 404
        # < 503 < unreachable(NULL→sentinel); deterministic on ties
        df = (
            df.groupBy(F.col(host_col).alias("host"))
            .agg(
                F.min(
                    F.struct(
                        F.coalesce(status, F.lit(999)).alias("__rank"),
                        status.alias(status_col),
                        F.col(txt_col).alias(txt_col),
                    )
                ).alias("__pick")
            )
            .select(
                F.col("host").alias(host_col),
                F.col(f"__pick.{status_col}").alias(status_col),
                F.col(f"__pick.{txt_col}").alias(txt_col),
            )
        )
        status = F.col(status_col)
        fetched = df.where((status >= 200) & (status < 300))
        deny_all = F.array(
            F.struct(
                F.lit(1).cast("int").alias("pat_len"),
                F.lit(False).alias("allow"),
                F.lit("^/").alias("regex"),
            )
        )
        by_status = df.select(
            F.col(host_col).alias("host"),
            F.when(
                status.isNull() | (status >= 500), deny_all
            ).otherwise(
                F.array().cast("array<struct<pat_len:int,allow:boolean,regex:string>>")
            ).alias("rules"),
        ).where(status.isNull() | (status >= 300))
        parsed = robots_rules(fetched, agent, host_col=host_col, txt_col=txt_col)
        return parsed.unionByName(by_status)
    # one row per host here too (deterministic: min body wins) — multiple
    # differing bodies for a host would otherwise blend their line groups
    df = (
        df.groupBy(F.col(host_col).alias("host"))
        .agg(F.min(F.col(txt_col)).alias(txt_col))
        .select(F.col("host").alias(host_col), txt_col)
    )
    grouped = _grouped_lines(df, host_col, txt_col)
    rules = (
        grouped.where(F.col("field").isin("allow", "disallow") & (F.col("value") != ""))
        .join(_selected_groups(grouped, agent), ["host", "group_id"])
        .select(
            "host",
            F.struct(
                F.length("value").cast("int").alias("pat_len"),
                (F.col("field") == "allow").alias("allow"),
                _pattern_regex(
                    F.when(
                        F.col("value").endswith("$"),
                        F.expr("substring(value, 1, length(value) - 1)"),
                    ).otherwise(F.col("value")),
                    F.col("value").endswith("$"),
                ).alias("regex"),
            ).alias("rule"),
        )
        .groupBy("host")
        .agg(F.collect_list("rule").alias("rules"))
    )
    # hosts that parsed to zero applicable rules still get a row
    hosts = df.select(F.col(host_col).alias("host")).distinct()
    return (
        hosts.join(rules, "host", "left")
        .select(
            "host",
            F.coalesce(
                "rules",
                F.array().cast("array<struct<pat_len:int,allow:boolean,regex:string>>"),
            ).alias("rules"),
        )
    )


def robots_hints(
    df: DataFrame,
    agent: str,
    host_col: str = "host",
    txt_col: str = "robots_txt",
) -> DataFrame:
    """The non-rule directives a crawler consumes from robots.txt:

    - ``sitemaps`` — every ``Sitemap:`` line's URL, sorted; these are
      GROUP-INDEPENDENT (sitemaps.org) and feed
      :func:`~zio_analytics_spark.operators.sitemap.sitemap_entries` —
      the robots → sitemap discovery chain;
    - ``crawl_delay`` — the MINIMUM ``Crawl-delay`` value (seconds,
      ``try_cast`` double — junk values drop) across the groups that
      apply to ``agent`` under the same specific-beats-``*`` selection
      as the rules; NULL when no applicable group declares one. Feed it
      into ``frontier_schedule``'s per-host pacing.

    Output: ``(host, sitemaps array<string>, crawl_delay double)`` —
    one row per input host, same dim-table shape as
    :func:`robots_rules`."""
    sm = (
        df.select(
            F.col(host_col).alias("host"),
            F.explode(F.split(F.col(txt_col), "\n")).alias("raw"),
        )
        .withColumn("line", F.trim(F.regexp_replace("raw", "#.*$", "")))
        .where(F.lower(F.regexp_extract("line", _FIELD_RE, 1)) == "sitemap")
        .select(
            "host", F.trim(F.regexp_extract("line", _VALUE_RE, 1)).alias("url")
        )
        .where(F.col("url") != "")
        .groupBy("host")
        .agg(F.array_sort(F.collect_list("url")).alias("sitemaps"))
    )
    grouped = _grouped_lines(df, host_col, txt_col)
    delay = (
        grouped.where(F.col("field") == "crawl-delay")
        .join(_selected_groups(grouped, agent), ["host", "group_id"])
        .groupBy("host")
        .agg(F.min(F.col("value").try_cast("double")).alias("crawl_delay"))
    )
    hosts = df.select(F.col(host_col).alias("host")).distinct()
    return (
        hosts.join(sm, "host", "left")
        .join(delay, "host", "left")
        .select(
            "host",
            F.coalesce("sitemaps", F.array().cast("array<string>")).alias("sitemaps"),
            "crawl_delay",
        )
    )


def _match_target(url: Column) -> Column:
    """``path['?'query]`` of an absolute URL (empty path → ``/``) —
    the RFC 9309 match target."""
    tail = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*(.*)$", 1)
    return F.when(
        (tail == "") | tail.startswith("?"), F.concat(F.lit("/"), tail)
    ).otherwise(tail)


def apply_robots(
    frontier: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    out_col: str = "allowed",
) -> DataFrame:
    """Decide every frontier URL against its host's rule array.

    One equi-join on host (broadcast-eligible dim) + a map-only HOF
    fold: filter the array to matching rules, take the max
    ``(pat_len, allow)`` struct — longest match wins, ties go to allow
    (struct ordering gives both for free) — and read its verdict;
    no matching rule (or no rules row) → allowed.

    Working columns use the reserved ``__robots_*`` prefix so a frontier
    that already carries ``rules`` (or ``target``) columns passes
    through untouched; only that prefix is reserved (ValueError if the
    frontier claims it)."""
    clash = {"__robots_target", "__robots_rules"} & set(frontier.columns)
    if clash:
        raise ValueError(f"frontier columns collide with reserved names: {clash}")
    target = _match_target(F.col(url_col))
    dim = rules.select(
        F.col("host").alias(host_col), F.col("rules").alias("__robots_rules")
    )
    joined = frontier.withColumn("__robots_target", target).join(
        dim, host_col, "left"
    )
    matched = F.filter(
        F.coalesce(
            F.col("__robots_rules"),
            F.array().cast("array<struct<pat_len:int,allow:boolean,regex:string>>"),
        ),
        lambda r: F.regexp_like(F.col("__robots_target"), r["regex"]),
    )
    best = F.array_max(matched)
    return joined.withColumn(
        out_col, F.when(F.size(matched) == 0, F.lit(True)).otherwise(best["allow"])
    ).drop("__robots_target", "__robots_rules")


def robots_filter_frontier(
    frontier: DataFrame,
    robots: DataFrame,
    agent: str,
    url_col: str = "url",
    host_col: str = "host",
) -> DataFrame:
    """The composed gate: parse + decide + keep only allowed URLs."""
    decided = apply_robots(
        frontier, robots_rules(robots, agent, host_col=host_col),
        url_col=url_col, host_col=host_col,
    )
    return decided.where(F.col("allowed")).drop("allowed")
