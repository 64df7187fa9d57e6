"""[EXT] Sitemap ingestion — the OTHER crawl-frontier source.

A crawler discovers URLs two ways: links scraped from pages
(html.html_extract_links → url.canonicalize_frontier) and the site's own
declared inventory — sitemaps (the public sitemaps.org protocol, also
pointed to by robots.txt ``Sitemap:`` lines). This module parses both
document kinds into frontier rows:

- ``urlset`` files: one ``<url>`` entry per page with ``<loc>`` and the
  optional ``<lastmod>`` / ``<priority>`` scheduling hints;
- ``sitemapindex`` files: one ``<sitemap>`` entry per CHILD sitemap —
  the crawl walks those before any page URL appears.

Spec (documented, deterministic — plain-tag scope, the common crawl
reality; namespace-prefixed tags and CDATA sections are out of scope
and documented so):

1. kind = ``index`` if the body contains ``<sitemapindex`` (ignoring
   case and attributes), else ``urlset``;
2. entry blocks = non-greedy ``<url>…</url>`` (or ``<sitemap>…</sitemap>``)
   spans, dotall;
3. per block: ``loc`` = trimmed ``<loc>`` text (entries without a
   ``<loc>`` are dropped — nothing to fetch), ``lastmod`` = trimmed
   ``<lastmod>`` text or NULL, ``priority`` = ``<priority>`` parsed as
   double or NULL (urlset only; protocol default 0.5 is NOT injected —
   the scheduler decides);
4. the five XML entities in ``loc`` decode (``&amp;`` LAST — the html.py
   double-decode discipline), because ``&`` in query strings MUST be
   escaped in valid sitemaps.

Everything is regexp_extract_all + a transform HOF + one explode —
map-only, whole-stage codegen, no UDF; at 100 TB the parse fuses into
whatever scan delivered the XML (gzipped ``.xml.gz`` sitemaps first pass
through compression.payload_decompress). Feed ``loc`` into
url.canonical_url_expr / robots.apply_robots / url.frontier_schedule
downstream — this module only surfaces what the site declared.

Reference scope: no crawl surface in the reference (DataStream.scala:
87-88); [EXT] for the LLM-pipeline north star.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["sitemap_entries", "xml_text_decode_expr"]

_WS = r"[ \t\n\r\f\x0B]*"


def xml_text_decode_expr(col: Column) -> Column:
    """The five XML character entities, ``&amp;`` decoded last so
    ``&amp;lt;`` yields the literal ``&lt;`` (the html.py pitfall)."""
    out = col
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&apos;", "'")):
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return F.replace(out, F.lit("&amp;"), F.lit("&"))


def _tag_text(block: Column, tag: str) -> Column:
    """Trimmed text of the first ``<tag>…</tag>`` in a block ('' if
    absent) — non-greedy, dotall, attribute-free plain-tag scope."""
    return F.regexp_extract(
        block, rf"(?is)<{tag}{_WS}>{_WS}(.*?){_WS}</{tag}{_WS}>", 1
    )


def sitemap_entries(
    df: DataFrame,
    xml_col: str = "xml",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sitemap XML → one row per declared entry (module docstring spec).

    Output: ``(id, kind, loc, lastmod, priority)`` — ``kind`` is
    ``'index'`` (child sitemaps to walk) or ``'urlset'`` (page URLs);
    ``priority`` is NULL for index entries and unparseable values
    (``try_cast`` — a junk priority must not kill the scan)."""
    xml = F.col(xml_col)
    is_index = xml.rlike(r"(?is)<sitemapindex[\s>]")
    kind = F.when(is_index, F.lit("index")).otherwise(F.lit("urlset"))
    blocks = F.when(
        is_index,
        F.regexp_extract_all(xml, F.lit(r"(?is)<sitemap\s*>(.*?)</sitemap\s*>"), F.lit(1)),
    ).otherwise(
        F.regexp_extract_all(xml, F.lit(r"(?is)<url\s*>(.*?)</url\s*>"), F.lit(1))
    )
    entries = F.filter(
        F.transform(
            blocks,
            lambda b: F.struct(
                xml_text_decode_expr(_tag_text(b, "loc")).alias("loc"),
                F.nullif(_tag_text(b, "lastmod"), F.lit("")).alias("lastmod"),
                F.when(
                    ~is_index, _tag_text(b, "priority").try_cast("double")
                ).alias("priority"),
            ),
        ),
        lambda e: e["loc"] != "",
    )
    return df.select(
        F.col(id_col),
        kind.alias("kind"),
        F.explode(entries).alias("e"),
    ).select(id_col, "kind", "e.loc", "e.lastmod", "e.priority")
