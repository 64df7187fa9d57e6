"""Crawl-loop tour (round-12 surface).

Run: python examples/crawl_loop_tour.py [sf_dir]

The full next-hop loop of a crawler, in the order the crawl runs it:

1. WARC ingest + CDX: synthesized gzip-member WARC files walk into
   records; the CDX index (SURT urlkey, timestamp, mime, status,
   digest, member offset/length) is built in the same pass — then one
   record is RANGE-REPLAYED from its (offset, length) span to show why
   the index makes a 100 TB corpus random-accessible.
2. MIME routing: resource-record bodies sniffed by magic bytes and
   routed to codec lanes (transport types lie; leading bytes don't).
3. Page → frontier: html_extract_links → canonicalize_frontier (the
   uppercase-host :443 duplicate collapses, mailto drops).
4. robots.txt: RFC 9309 rules gate the frontier; Sitemap:/Crawl-delay
   hints surface; a sitemap's urlset merges in declared URLs.
5. Politeness: per-host top-K by priority, fetch waves, salted worker
   buckets — the fetch schedule the next crawl round executes.
"""

from __future__ import annotations

import os
import sys
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from zio_analytics_spark.operators.html import html_extract_links  # noqa: E402
from zio_analytics_spark.operators.mime import sniff_mime_expr  # noqa: E402
from zio_analytics_spark.operators.robots import (  # noqa: E402
    apply_robots,
    robots_hints,
    robots_rules,
)
from zio_analytics_spark.operators.sitemap import sitemap_entries  # noqa: E402
from zio_analytics_spark.operators.url import (  # noqa: E402
    canonicalize_frontier,
    frontier_schedule,
    surt_key_expr,
)
from zio_analytics_spark.operators.warc import encode_warc, warc_cdx  # noqa: E402
from zio_analytics_spark.session import get_spark  # noqa: E402
from zio_analytics_spark.sources.parquet import read_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("crawl-loop-tour")
    docs = read_table(spark, sf_dir, "documents").limit(50).cache()

    # -- 1. WARC + CDX ------------------------------------------------
    def build_warc(rows):
        recs = []
        for r in rows:
            body = f"<html><body><p>{r['text'][:80]}</p></body></html>".encode()
            http = (
                f"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
            ).encode() + body
            recs.append((
                {"WARC-Type": "response",
                 "WARC-Target-URI": f"https://{r['lang']}.ex.org/doc/{r['doc_id']}",
                 "WARC-Date": "2026-08-16T00:00:00Z",
                 "Content-Type": "application/http; msgtype=response"},
                http,
            ))
        recs.append((
            {"WARC-Type": "resource",
             "WARC-Target-URI": "https://ex.org/logo",
             "Content-Type": "application/octet-stream"},
            bytes.fromhex("89504E470D0A1A0A") + b"fake-png-body",
        ))
        return encode_warc(recs, gzip_members=True)

    sample = docs.limit(8).collect()
    payload = build_warc(sample)
    files = spark.createDataFrame([(1, bytearray(payload))], "file_id long, content binary")
    cdx = warc_cdx(files).withColumn("urlkey", surt_key_expr(F.col("target_uri")))
    print("== CDX index (first rows) ==")
    cdx.select("urlkey", "ts", "mime", "http_status", "offset", "length").show(5, False)

    row = cdx.where(F.col("warc_type") == "response").orderBy("rec_idx").first()
    span = payload[row["offset"] : row["offset"] + row["length"]]
    replay = zlib.decompress(span, 47)
    print(f"range replay of {row['urlkey']}: {len(span)} compressed bytes -> "
          f"{len(replay)} record bytes, target present: "
          f"{row['target_uri'].encode() in replay}")

    # -- 2. MIME routing ----------------------------------------------
    print("\n== MIME routing of resource bodies ==")
    from zio_analytics_spark.operators.warc import warc_records

    recs = warc_records(files)
    recs.where(F.col("ok")).select(
        "warc_type", sniff_mime_expr(F.col("body")).alias("sniffed")
    ).show(10, False)

    # -- 3. page -> canonical frontier --------------------------------
    d = F.col("doc_id").cast("string")
    site = F.concat(F.col("lang"), F.lit(".ex.org"))
    pages = docs.select(
        "doc_id",
        F.concat(F.lit("https://"), site, F.lit("/dir/page.html")).alias("base_url"),
        F.concat(
            F.lit('<html><body><a href="next-'), d, F.lit('.html">n</a>'),
            F.lit('<a href="/private/s-'), d, F.lit('">s</a>'),
            F.lit('<a href="//'), F.upper(site), F.lit(":443/dir/next-"), d,
            F.lit('.html#f">dup</a><a href="mailto:x@y">m</a></body></html>'),
        ).alias("html"),
    )
    frontier = (
        canonicalize_frontier(html_extract_links(pages, keep_cols=("base_url",)))
        .select("doc_id", F.explode("frontier").alias("url"))
        .withColumn("host", F.regexp_extract("url", r"://([^/]*)", 1))
    )
    print("== canonical frontier (dup collapsed, mailto gone) ==")
    frontier.show(4, False)

    # -- 4. robots + sitemap ------------------------------------------
    robots = docs.select(site.alias("host")).distinct().withColumn(
        "robots_txt",
        F.concat(
            F.lit("User-agent: zas-bot\nDisallow: /private/\nCrawl-delay: 2\n"
                  "Sitemap: https://"), F.col("host"), F.lit("/sitemap.xml\n"),
        ),
    )
    decided = apply_robots(frontier, robots_rules(robots, "zas-bot"))
    print("== robots decisions ==")
    decided.groupBy("allowed").count().show()
    print("== robots hints ==")
    robots_hints(robots, "zas-bot").show(3, False)

    sitemaps = docs.limit(3).select(
        "doc_id",
        F.concat(
            F.lit("<urlset><url><loc>https://"), site,
            F.lit("/declared-"), d, F.lit("</loc><lastmod>2026-08-01</lastmod>"
                  "</url></urlset>"),
        ).alias("xml"),
    )
    declared = sitemap_entries(sitemaps).select(
        F.col("loc").alias("url"),
        F.regexp_extract("loc", r"://([^/]*)", 1).alias("host"),
    )
    print("== sitemap-declared URLs merging into the frontier ==")
    declared.show(3, False)

    # -- 5. politeness schedule ---------------------------------------
    allowed = decided.where("allowed").select("host", "url").unionByName(declared)
    sched = frontier_schedule(
        allowed.withColumn("priority", F.length("url").cast("long")),
        per_host_cap=10, host_parallelism=4, n_buckets=8,
    )
    print("== fetch schedule (per-host waves, worker buckets) ==")
    sched.orderBy("host", "rank").show(12, False)

    spark.stop()


if __name__ == "__main__":
    main()
