"""Sitemap ingestion contract (operators/sitemap.py): urlset vs
sitemapindex detection, entity decode in loc, optional-field NULLs,
loc-less blocks dropped, junk priority survives, whitespace/case
tolerance, and the map-only plan shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from zio_analytics_spark.operators.sitemap import sitemap_entries, xml_text_decode_expr

_URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc> https://ex.org/a?x=1&amp;y=2 </loc><lastmod>2026-01-03</lastmod><priority>0.8</priority></url>
  <url><loc>https://ex.org/b</loc></url>
  <url><lastmod>2026-01-01</lastmod></url>
  <url><loc>https://ex.org/c</loc><priority>junk</priority></url>
</urlset>"""

_INDEX = """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://ex.org/s1.xml.gz</loc><lastmod>2026-02-01T00:00:00Z</lastmod></sitemap>
  <sitemap><loc>https://ex.org/s2.xml</loc></sitemap>
</sitemapindex>"""


def _parse(spark, xmls):
    df = spark.createDataFrame(list(enumerate(xmls)), "doc_id long, xml string")
    return sitemap_entries(df).orderBy("doc_id", "loc").collect()


def test_urlset_entries(spark):
    rows = [r for r in _parse(spark, [_URLSET])]
    assert [(r["loc"], r["lastmod"], r["priority"]) for r in rows] == [
        ("https://ex.org/a?x=1&y=2", "2026-01-03", 0.8),  # trimmed + &amp; decoded
        ("https://ex.org/b", None, None),
        ("https://ex.org/c", None, None),                  # junk priority -> NULL
    ]
    assert all(r["kind"] == "urlset" for r in rows)


def test_index_entries(spark):
    rows = _parse(spark, [_INDEX])
    assert [(r["kind"], r["loc"], r["lastmod"]) for r in rows] == [
        ("index", "https://ex.org/s1.xml.gz", "2026-02-01T00:00:00Z"),
        ("index", "https://ex.org/s2.xml", None),
    ]
    assert all(r["priority"] is None for r in rows)


def test_case_and_whitespace_tolerance(spark):
    xml = "<URLSET>\n<URL>\n<LOC>\nhttps://ex.org/x\n</LOC>\n</URL>\n</URLSET>"
    rows = _parse(spark, [xml])
    assert [(r["kind"], r["loc"]) for r in rows] == [("urlset", "https://ex.org/x")]


def test_entity_decode_order(spark):
    df = spark.createDataFrame(
        [("&amp;lt;",), ("&lt;b&gt;",), ("a&amp;b",), ("&quot;q&apos;",)], "s string"
    )
    got = [r["d"] for r in df.select(xml_text_decode_expr(F.col("s")).alias("d")).collect()]
    assert got == ["&lt;", "<b>", "a&b", "\"q'"]


def test_empty_and_junk_documents(spark):
    rows = _parse(spark, ["", "no tags here", "<urlset></urlset>"])
    assert rows == []


def test_map_only_plan(spark):
    df = spark.createDataFrame([(1, _URLSET)], "doc_id long, xml string")
    plan = sitemap_entries(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Generate" in plan  # one explode, no shuffle
