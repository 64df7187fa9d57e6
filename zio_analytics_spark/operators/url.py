"""[EXT] URL canonicalization — the crawl-frontier normalizer.

``html.html_extract_links`` emits raw ``href`` values; a crawler's
frontier needs CANONICAL absolute URLs, or the same page is fetched once
per spelling (``HTTP://Ex.org:80/p#top`` vs ``http://ex.org/p``) and the
frontier-dedup step under-merges. This module is the deterministic
normalizer between the two — round-10 verdict ask #6.

Spec (documented, oracle-replayable; every step is a plain
``regexp_replace``/``concat`` Column with identical semantics in Java
regex and RE2, the html.py discipline):

**Resolution** of an href against the page's base URL (RFC 3986 §5
restated for the crawl cases):

- absolute (``scheme:...``) → itself;
- scheme-relative (``//host/...``) → base scheme + ``:`` + href;
- root-relative (``/path``) → base scheme + ``://`` + base authority + href;
- fragment-only (``#...``) or empty → NULL (same-page, not frontier);
- path-relative → resolved against the base DIRECTORY (base path up to
  its last ``/``).

**Canonicalization** of the resolved URL:

1. fragment stripped;
2. scheme and authority lowercased (path/query case is significant —
   left alone);
3. default ports stripped (``:80`` for http, ``:443`` for https);
4. dot-segments collapsed: ``/./`` runs, then ``/seg/../`` bounded to
   :data:`DOTDOT_PASSES` left-to-right passes (4 — deeper nesting stays
   un-collapsed IDENTICALLY on both engines; a fixed pass count is what
   makes the reduction cross-engine deterministic), then a leading
   ``/../`` clamps to ``/``;
5. tracking params dropped: every ``utm_*`` query parameter, the ``?``
   itself if the query empties;
6. an empty path with an authority becomes ``/``;
7. non-http(s) schemes (mailto, javascript, data, …) → NULL — not
   fetchable frontier.

Scale shape: pure Column expressions — map-only, whole-stage codegen,
fuses into the link-extraction scan; the frontier dedup downstream is
the exact-dedup shuffle it always was, just on keys that actually
collide.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "canonical_url_expr",
    "canonicalize_frontier",
    "surt_key_expr",
    "frontier_schedule",
    "resolve_redirects",
    "DOTDOT_PASSES",
]

#: fixed number of ``/seg/../`` collapse passes (spec step 4)
DOTDOT_PASSES = 4

_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.\-]*):"
#: scheme://authority capture (authority = up to first /?#)
_AUTH_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]*)"
#: path after the authority (up to ?#)
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*([^?#]*)"


def _resolve(href: Column, base: Column) -> Column:
    """Spec resolution rules → absolute URL string (or NULL)."""
    scheme = F.lower(F.regexp_extract(base, _SCHEME_RE, 1))
    auth = F.regexp_extract(base, _AUTH_RE, 1)
    path = F.regexp_extract(base, _PATH_RE, 1)
    base_dir = F.regexp_replace(
        F.when(path == "", F.lit("/")).otherwise(path), r"[^/]*$", ""
    )
    origin = F.concat(scheme, F.lit("://"), auth)
    return (
        F.when((href == "") | href.startswith("#"), F.lit(None).cast("string"))
        .when(href.startswith("//"), F.concat(scheme, F.lit(":"), href))
        .when(href.rlike(_SCHEME_RE), href)
        .when(href.startswith("/"), F.concat(origin, href))
        .otherwise(F.concat(origin, base_dir, href))
    )


def canonical_url_expr(
    href: Column, base: Column, absolute_href: bool = False
) -> Column:
    """Resolve ``href`` against ``base`` and canonicalize (module
    docstring spec). NULL for same-page and non-http(s) results.

    ``absolute_href=True`` is the fetch-log fast path: when the caller
    guarantees ``href`` is already absolute (a fetched URL, not an
    extracted link), the whole relative-resolution CASE is dropped from
    the expression tree — on inputs where it matters this is byte-
    identical to the general path (a scheme-less href resolves against
    itself to a scheme-less result, which step 7 nulls out anyway), and
    the smaller tree is what keeps the generated code compilable."""
    if absolute_href:
        u = F.when(href.rlike(_SCHEME_RE), href)
    else:
        u = _resolve(href, base)
    # 1. fragment
    u = F.regexp_replace(u, r"#.*$", "")
    # Every step below references its input COLUMN exactly once: inside a
    # higher-order-function lambda (canonicalize_frontier's transform)
    # the tree is evaluated INTERPRETED with no common-subexpression
    # elimination, so each extra reference re-runs its whole upstream
    # regex chain per array element. The previous split into
    # scheme/auth/rest with multi-branch CASEs re-evaluated the resolve
    # chain ~10x per element (measured 2x entry cost on
    # crawl_frontier_pipeline).
    # 2. scheme://authority lowercased as ONE prefix (path/query case is
    # significant — left alone); no match (no authority, e.g. mailto:)
    # -> '' and step 7 yields NULL. Degenerate scheme-colon-without-//
    # forms ('http:foo') now canonicalize to NULL (spec step 7: not a
    # fetchable frontier URL) instead of the old 'http://http:foo'.
    prefix = F.lower(
        F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*)", 1)
    )
    # 3. default ports (prefix is exactly scheme://authority, so the
    # port anchors at $; scheme-conditional via the literal prefix)
    prefix = F.regexp_replace(prefix, r"^(http://[^/?#]*):80$", r"$1")
    prefix = F.regexp_replace(prefix, r"^(https://[^/?#]*):443$", r"$1")
    rest = F.regexp_replace(u, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*", "")
    # 4. dot segments (path part only — stop at ? which cannot precede
    # the path; bounded fixed passes keep both engines byte-identical)
    rest = F.regexp_replace(rest, r"^([^?]*)/\./", r"$1/")
    rest = F.regexp_replace(rest, r"^([^?]*)/\./", r"$1/")
    for _ in range(DOTDOT_PASSES):
        rest = F.regexp_replace(rest, r"^([^?]*?)/[^/?]+/\.\./", r"$1/")
    rest = F.regexp_replace(rest, r"^/(\.\./)+", "/")
    # 5. utm params: interior ones first, then a leading one (promoting
    # the next param to '?'), then a lone trailing one with its '?'
    rest = F.regexp_replace(rest, r"&utm_[^&#]*", "")
    rest = F.regexp_replace(rest, r"\?utm_[^&#]*&", "?")
    rest = F.regexp_replace(rest, r"\?utm_[^&#]*$", "")
    # 6. empty path with authority -> '/' (single-reference form: insert
    # '/' at the start when rest is empty or begins with the query)
    rest = F.regexp_replace(rest, r"^(?=\?)|^$", "/")
    # 7. frontier is http(s) only
    return F.when(prefix.rlike(r"^https?://"), F.concat(prefix, rest))


def canonicalize_frontier(
    df: DataFrame,
    links_col: str = "links",
    base_col: str = "base_url",
    id_col: str = "doc_id",
) -> DataFrame:
    """``html_extract_links`` output + the page URL → the canonical
    frontier: per page, the DISTINCT canonical targets (NULLs — same-page
    and unfetchable schemes — dropped, original order of first
    occurrence NOT preserved: the frontier is a set, so the output array
    is sorted for determinism).

    Returns ``(id, frontier array<string>, n_out)``. Map-only; the
    cross-page frontier dedup is ``explode → distinct`` downstream."""
    canon = F.array_sort(
        F.array_distinct(
            F.filter(
                F.transform(
                    F.col(links_col),
                    lambda h: canonical_url_expr(h, F.col(base_col)),
                ),
                lambda x: x.isNotNull(),
            )
        )
    )
    return df.select(
        F.col(id_col),
        canon.alias("frontier"),
        F.size(canon).alias("n_out"),
    )


def surt_key_expr(url: Column) -> Column:
    """SURT urlkey of a CANONICAL http(s) URL — the sort-friendly key the
    CDX index (warc.warc_cdx) and frontier stores order by, so one
    host's pages are contiguous: ``https://ex.org/a?b=2&a=1`` →
    ``org,ex)/a?a=1&b=2``.

    Spec (restated from the public SURT convention for the canonical-
    input case): scheme dropped; host lowercased and label-reversed with
    commas; an explicit port kept after the reversed host; ``)``
    separates authority from path; empty path → ``/``; query parameters
    sorted bytewise and re-joined (the ``?`` dropped when no query).
    Input is expected canonical (``canonical_url_expr``) — default ports
    and fragments are already gone, userinfo never reaches the frontier.
    Pure Columns, map-only.

    Single-reference discipline (the canonical_url_expr lesson): the key
    is a join column, so constraint propagation clones the WHOLE
    expression into inferred ``isnotnull`` filters — every CASE that
    referenced ``auth``/``path``/``query`` twice doubled that filter's
    per-row regex work. Each step below references its input once: the
    port keeps its ``:`` in the capture (no re-attach CASE), the empty
    path fix is an ``^$`` replace, and the ``?`` prefix is attached
    unconditionally then stripped when the query is empty."""
    auth = F.lower(F.regexp_extract(url, _AUTH_RE, 1))
    rev = F.array_join(
        F.reverse(F.split(F.regexp_replace(auth, r":\d+$", ""), r"\.")), ","
    )
    portpart = F.regexp_extract(auth, r"(:\d+)$", 1)
    path = F.regexp_replace(F.regexp_extract(url, _PATH_RE, 1), r"^$", "/")
    qsorted = F.array_join(
        F.array_sort(F.split(F.regexp_extract(url, r"\?(.*)$", 1), "&")), "&"
    )
    qpart = F.regexp_replace(F.concat(F.lit("?"), qsorted), r"^\?$", "")
    return F.concat(rev, portpart, F.lit(")"), path, qpart)


def frontier_schedule(
    df: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    priority_col: str = "priority",
    per_host_cap: int = 100,
    host_parallelism: int = 8,
    n_buckets: int = 16,
    salt: str = "frontier",
) -> DataFrame:
    """Politeness scheduling for the crawl frontier: per host, keep the
    top ``per_host_cap`` URLs by priority, assign each a fetch ``wave``
    (at most ``host_parallelism`` fetches of one host per wave — the
    per-host rate cap), and a deterministic worker ``bucket`` (salted
    md5 of the host, the splits.py discipline, so ONE worker owns a
    host's connections and DNS/robots cache).

    Output: ``(host, url, priority, rank, wave, bucket)``, kept rows
    only. One row_number shuffle on host — the partition a crawler
    needs anyway; the cap bounds any skewed mega-host to
    ``per_host_cap`` rows before anything downstream sees it."""
    w = Window.partitionBy(host_col).orderBy(
        F.col(priority_col).desc(), F.col(url_col)
    )
    ranked = df.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= per_host_cap
    )
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), F.col(host_col))), 1, 8), 16, 10)
        .cast("long")
        % n_buckets
    )
    return ranked.select(
        host_col,
        url_col,
        priority_col,
        "rank",
        (((F.col("rank") - 1) / host_parallelism).cast("int") + 1).alias("wave"),
        bucket.cast("int").alias("bucket"),
    )


def resolve_redirects(
    df: DataFrame,
    url_col: str = "url",
    status_col: str = "status",
    location_col: str = "location",
    max_hops: int = 3,
) -> DataFrame:
    """Follow HTTP redirect chains to their landing URL — the frontier
    maintenance a crawl round runs over its fetch results (~a fifth of
    real-web responses are 3xx; leaving them unresolved double-counts
    pages and mis-keys the CDX lookup).

    Input: one row per fetched URL with its status and the raw
    ``Location`` header (NULL for non-redirects). Location resolves
    against the REDIRECTING url (RFC 9110 §10.2.2 — relative forms are
    legal) through the same resolution + canonicalization as hrefs.

    Output: the input columns plus ``final_url`` (the chain's landing
    URL), ``hops`` (redirects followed), and ``resolved`` (false when
    the chain is still on a redirect after ``max_hops`` — a loop or a
    chain longer than the bound; a crawler drops those).

    Plan shape (VERDICT r13 #1): chains are collapsed FIRST, on the 3xx
    EDGE DIM only, via binary pointer doubling — ⌈log₂ max_hops⌉
    edge-dim self-joins build a closure mapping every redirect source to
    its landing node after min(chain_len, max_hops) hops — and the full
    fetch log then joins that closure ONCE. The corpus (the 100 TB side)
    shuffles a single time; everything iterative touches only the 3xx
    fraction. A fixed hop bound is also what makes the reduction
    deterministic (the dot-dot discipline above)."""
    is_redirect = (F.col(status_col) >= 300) & (F.col(status_col) < 400)
    # Edge SOURCES are canonicalized with the same pipeline as the
    # destinations: fetch logs routinely carry raw (un-normalized) URLs,
    # and a chain hop lands on the CANONICAL form of the Location — a raw
    # key would silently miss the next edge and mis-report resolved=true
    # (round-12 ADVICE). Duplicate sources (the same URL fetched twice
    # with different Locations) reduce deterministically to max(__dst).
    src_key = canonical_url_expr(
        F.col(url_col), F.col(url_col), absolute_href=True
    )
    # Two canonical pipelines feed the edge dim; keep each in its OWN
    # projection stage (split across the repartition exchange) so each
    # generated method stays compilable — fused, the pair blows Janino's
    # 64 KB limit and the stage runs interpreted (round-7 lesson). The
    # repartition also re-spreads the 3xx subset before the per-row
    # regex work: upstream AQE routinely coalesces a small filtered dim
    # onto one partition (round-9 lesson).
    edges = (
        df.where(is_redirect & F.col(location_col).isNotNull())
        .select(
            F.col(url_col),
            canonical_url_expr(F.col(location_col), F.col(url_col)).alias("__dst"),
        )
        .repartition(df.sparkSession.sparkContext.defaultParallelism)
        .select(F.coalesce(src_key, F.col(url_col)).alias("__src"), "__dst")
        .groupBy("__src")
        .agg(F.max("__dst").alias("__dst"))
        # NULL __dst drops HERE, on the agg output, never before the
        # projection: a pre-aggregation IS NOT NULL filter gets pushed
        # below the Project, inlining ~6 copies of the canonical tree
        # into one Filter and blowing codegen (max() ignores NULLs, so
        # this is semantics-identical — an all-NULL source aggregates
        # to NULL and is dropped just the same)
        .where(F.col("__dst").isNotNull())
        # the edge dim is referenced by every doubling round AND the
        # open-chain check: materialize it ONCE (the graph.py iterative
        # discipline) — without this each reference recomputes the whole
        # upstream fetch pipeline
        .localCheckpoint(eager=True)
    )
    # ---- collapse chains on the EDGE DIM via binary pointer doubling.
    # ptr_k maps each redirect source to (node after min(chain_len, k)
    # hops, hops actually taken). compose(ptr_a, ptr_b) = walk a steps,
    # then b: only rows whose current node is STILL an edge source
    # extend — a terminated chain's node has no outgoing edge, so the
    # left join leaves it unchanged (which is also why no explicit
    # "saturated" guard is needed). Keys are canonical ONCE (edges are
    # built canonical on both ends); nothing re-canonicalizes per hop.
    def _compose(a: DataFrame, b: DataFrame) -> DataFrame:
        rhs = b.select(
            F.col("__src").alias("__s2"),
            F.col("__cur").alias("__c2"),
            F.col("__hops").alias("__h2"),
        )
        return a.join(rhs, a["__cur"] == rhs["__s2"], "left").select(
            "__src",
            F.coalesce("__c2", "__cur").alias("__cur"),
            (F.col("__hops") + F.coalesce("__h2", F.lit(0))).alias("__hops"),
        )

    step = edges.select(
        "__src", F.col("__dst").alias("__cur"), F.lit(1).alias("__hops")
    )
    closure = None
    n = max_hops
    while n:
        if n & 1:
            closure = step if closure is None else _compose(closure, step)
        n >>= 1
        if n:
            step = _compose(step, step)
            if n > 1:
                # a squared step that will be referenced again (by the
                # next squaring and/or a compose) must MATERIALIZE, or
                # each reference re-expands its whole lazy join tree and
                # the executed join count degrades from O(log max_hops)
                # back to O(max_hops) — for the default max_hops=3 this
                # never fires (the single squared step is consumed once)
                step = step.localCheckpoint(eager=True)
    if closure is None:  # max_hops=0: follow nothing, only flag open heads
        closure = edges.select(
            "__src", F.col("__src").alias("__cur"), F.lit(0).alias("__hops")
        )
    # unresolved = the landing node is STILL a redirect source (loop, or
    # a chain longer than the bound) — a crawler drops those; decided on
    # the dim, so the corpus never joins edges directly
    closure = closure.join(
        edges.select(F.col("__src").alias("__open")),
        closure["__cur"] == F.col("__open"),
        "left",
    ).select(
        "__src", "__cur", "__hops", F.col("__open").isNotNull().alias("__still")
    )
    # ---- ONE corpus-side join against the collapsed closure dim
    return (
        df.withColumn("__key", F.coalesce(src_key, F.col(url_col)))
        .join(closure, F.col("__key") == closure["__src"], "left")
        .withColumn(
            "final_url",
            F.when(F.col("__hops") >= 1, F.col("__cur")).otherwise(
                F.col(url_col)
            ),
        )
        .withColumn("hops", F.coalesce(F.col("__hops"), F.lit(0)))
        .withColumn("resolved", ~F.coalesce(F.col("__still"), F.lit(False)))
        .drop("__key", "__src", "__cur", "__hops", "__still")
    )
