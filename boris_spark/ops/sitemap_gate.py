"""Sitemap-ingestion gates: deterministic sitemaps.org XML documents are
synthesized JVM-side from `documents` (one leaf sitemap per host + one
sitemap-index naming them), parsed back through the distributed source
(boris_spark/sources/sitemap.py), and every output column — including the
XML-entity-escaped query strings and the canonical frontier keys — is
oracled in closed-form SQL.

The reference's spider has no sitemap notion (seeds are program literals,
/root/reference/boris/main.rkt); this follows the public sitemaps.org 0.9
protocol, the seed source a web-scale crawl actually starts from.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..synth.webgen import DOC_HOSTS
from .queries import T, q

_CHANGEFREQ = ["always", "hourly", "daily", "weekly", "monthly", "yearly",
               "never"]
_INDEX_URL = "http://docs.test/sitemap-index.xml"


def _sitemap_docs(spark, sf_dir):
    """(url, xml) sitemap documents built JVM-side from `documents`:
    one urlset per host (entries XML-entity-escaped — every 5th doc's loc
    carries a ``?a=1&b=2`` query, serialized as ``&amp;``), plus one
    sitemapindex naming the per-host sitemaps. Pure codegen'd string
    concat + one groupBy(host); the build is the test fixture, the PARSE
    under test runs distributed in sources/sitemap.py."""
    d = T(spark, sf_dir, "documents").select(
        F.pmod("doc_id", F.lit(DOC_HOSTS)).alias("h"),
        F.concat(
            F.lit("<url><loc> http://h"),
            F.pmod("doc_id", F.lit(DOC_HOSTS)),
            F.lit(".docs.test/d/"),
            F.col("doc_id"),
            F.when(F.pmod("doc_id", F.lit(5)) == 0, F.lit("?a=1&amp;b=2"))
            .otherwise(F.lit("")),
            F.lit(" </loc><lastmod>"),
            F.date_format(
                F.date_add(F.to_date(F.lit("2024-01-01")),
                           F.pmod("doc_id", F.lit(28)).cast("int")),
                "yyyy-MM-dd",
            ),
            F.lit("</lastmod><changefreq>"),
            F.element_at(
                F.array(*[F.lit(c) for c in _CHANGEFREQ]),
                (F.pmod("doc_id", F.lit(7)) + 1).cast("int"),
            ),
            F.lit("</changefreq><priority>"),
            F.format_string(
                "%.1f", F.pmod("doc_id", F.lit(11)).cast("double") / 10
            ),
            F.lit("</priority></url>"),
        ).alias("entry"),
    )
    leaves = d.groupBy("h").agg(
        F.concat(
            F.lit('<?xml version="1.0" encoding="UTF-8"?>'
                  '<urlset xmlns="http://www.sitemaps.org/schemas/'
                  'sitemap/0.9">'),
            F.concat_ws("", F.sort_array(F.collect_list("entry"))),
            F.lit("</urlset>"),
        ).alias("xml"),
    ).select(
        F.concat(F.lit("http://h"), F.col("h"),
                 F.lit(".docs.test/sitemap.xml")).alias("url"),
        "xml",
    )
    index = (
        d.select("h").distinct()
        .agg(
            F.concat(
                F.lit('<?xml version="1.0" encoding="UTF-8"?><sitemapindex>'),
                F.concat_ws("", F.sort_array(F.collect_list(
                    F.concat(
                        F.lit("<sitemap><loc>http://h"), F.col("h"),
                        F.lit(".docs.test/sitemap.xml</loc>"
                              "<lastmod>2024-01-01</lastmod></sitemap>"),
                    )
                ))),
                F.lit("</sitemapindex>"),
            ).alias("xml"),
        )
        .select(F.lit(_INDEX_URL).alias("url"), "xml")
    )
    return leaves.unionByName(index)


_LOC_SQL = (
    f"'http://h' || (doc_id % {DOC_HOSTS}) || '.docs.test/d/' || doc_id"
    " || CASE WHEN doc_id % 5 = 0 THEN '?a=1&b=2' ELSE '' END"
)

_SITEMAP_SQL = f"""
SELECT 'http://h' || (doc_id % {DOC_HOSTS}) || '.docs.test/sitemap.xml'
           AS sitemap_url,
       'urlset' AS kind,
       {_LOC_SQL} AS loc,
       strftime(DATE '2024-01-01' + INTERVAL (doc_id % 28) DAY, '%Y-%m-%d')
           AS lastmod,
       list_extract(
           ['always','hourly','daily','weekly','monthly','yearly','never'],
           CAST(doc_id % 7 AS INT) + 1) AS changefreq,
       CAST(doc_id % 11 AS DOUBLE) / 10 AS priority
FROM documents
UNION ALL
SELECT '{_INDEX_URL}', 'sitemapindex',
       'http://h' || h || '.docs.test/sitemap.xml',
       '2024-01-01', NULL, CAST(NULL AS DOUBLE)
FROM (SELECT DISTINCT doc_id % {DOC_HOSTS} AS h FROM documents)
"""


@q("sitemap_parse", _SITEMAP_SQL)
def sitemap_parse(spark, sf_dir):
    """Sitemap source gate: every entry of the synthesized per-host
    sitemaps and the index comes back with entity-decoded loc (``&amp;`` →
    ``&``), whitespace-trimmed, lastmod/changefreq/priority typed — parsed
    distributed, one Arrow batch per input split."""
    from ..sources.sitemap import read_sitemaps

    return read_sitemaps(_sitemap_docs(spark, sf_dir))


_SEEDS_SQL = f"""
WITH locs AS (
    SELECT {_LOC_SQL} AS loc, doc_id % {DOC_HOSTS} AS h FROM documents
)
SELECT replace(loc, '&', '') AS url_canon,
       loc AS url_full,
       'h' || h || '.docs.test' AS host
FROM locs
"""


@q("sitemap_seeds", _SEEDS_SQL)
def sitemap_seeds(spark, sf_dir):
    """Frontier-seed gate: parsed leaf entries → deduplicated canonical
    seeds through the SAME kernel the crawl's url_canonicalize stage uses
    (query separators dropped by canonical re-join, url.rkt:37-55
    semantics), so sitemap seeds dedup against link-discovered urls
    byte-for-byte. url_hash is kernel xxh64 (not SQL-expressible) and is
    exercised by the pytest instead."""
    from ..sources.sitemap import read_sitemaps, sitemap_frontier

    entries = read_sitemaps(_sitemap_docs(spark, sf_dir))
    return sitemap_frontier(entries).select("url_canon", "url_full", "host")
