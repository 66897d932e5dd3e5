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

# Hand-AUTHORED golden fixtures flowing through the same gate. The
# synthesized fixtures above share their escaping conventions with the
# generator; these three share nothing with any code path under test —
# a namespace-prefixed urlset with entity-escaped loc + out-of-vocabulary
# changefreq + unparsable priority + a loc-less entry (all real-web
# shapes), a BROKEN-XML urlset exercising the lenient regex-fallback
# parser (the second <url> is unclosed: the parser must keep the first
# entry, not drop the document), and a real-world-shaped sitemapindex
# with timestamped lastmod. Expected rows are literal SELECTs in the
# oracle SQL.
_GOLDEN_DOCS = [
    (
        "http://golden.test/sitemap.xml",
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<sm:urlset xmlns:sm="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        "  <sm:url>\n"
        "    <sm:loc>\n"
        "      http://golden.test/a?x=1&amp;y=2\n"
        "    </sm:loc>\n"
        "    <sm:lastmod>2024-02-29T12:00:00+00:00</sm:lastmod>\n"
        "    <sm:changefreq>Sometimes</sm:changefreq>\n"
        "    <sm:priority>high</sm:priority>\n"
        "  </sm:url>\n"
        "  <sm:url>\n"
        "    <sm:loc>http://golden.test/b</sm:loc>\n"
        "    <sm:changefreq>WEEKLY</sm:changefreq>\n"
        "    <sm:priority>0.8</sm:priority>\n"
        "  </sm:url>\n"
        "  <sm:url><sm:lastmod>2024-01-01</sm:lastmod></sm:url>\n"
        "</sm:urlset>",
    ),
    (
        "http://broken.test/sitemap.xml",
        '<?xml version="1.0"?><urlset><url><loc>http://broken.test/1</loc>'
        "<priority>0.5</priority></url><url><loc>http://broken.test/2</loc>"
        "</urlset>",
    ),
    (
        "http://golden.test/sitemap-index.xml",
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        "  <sitemap><loc>http://golden.test/sitemap-news.xml</loc>"
        "<lastmod>2024-03-01T08:15:00Z</lastmod></sitemap>\n"
        "  <sitemap><loc>http://golden.test/sitemap-posts.xml</loc>"
        "</sitemap>\n"
        "</sitemapindex>",
    ),
]

# what the kernel parser must produce for _GOLDEN_DOCS, as SQL literals:
# (sitemap_url, kind, loc, lastmod, changefreq, priority)
_GOLDEN_ROWS_SQL = """
SELECT * FROM (VALUES
  ('http://golden.test/sitemap.xml', 'urlset',
   'http://golden.test/a?x=1&y=2', '2024-02-29T12:00:00+00:00',
   CAST(NULL AS VARCHAR), CAST(NULL AS DOUBLE)),
  ('http://golden.test/sitemap.xml', 'urlset', 'http://golden.test/b',
   CAST(NULL AS VARCHAR), 'weekly', 0.8),
  ('http://broken.test/sitemap.xml', 'urlset', 'http://broken.test/1',
   CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), 0.5),
  ('http://golden.test/sitemap-index.xml', 'sitemapindex',
   'http://golden.test/sitemap-news.xml', '2024-03-01T08:15:00Z',
   CAST(NULL AS VARCHAR), CAST(NULL AS DOUBLE)),
  ('http://golden.test/sitemap-index.xml', 'sitemapindex',
   'http://golden.test/sitemap-posts.xml', CAST(NULL AS VARCHAR),
   CAST(NULL AS VARCHAR), CAST(NULL AS DOUBLE))
) AS g(sitemap_url, kind, loc, lastmod, changefreq, priority)
"""


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
    golden = spark.createDataFrame(_GOLDEN_DOCS, "url string, xml string")
    return leaves.unionByName(index).unionByName(golden)


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
UNION ALL
{_GOLDEN_ROWS_SQL}
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
UNION ALL
SELECT * FROM (VALUES
  ('http://golden.test/a?x=1y=2', 'http://golden.test/a?x=1&y=2',
   'golden.test'),
  ('http://golden.test/b', 'http://golden.test/b', 'golden.test'),
  ('http://broken.test/1', 'http://broken.test/1', 'broken.test')
) AS g(url_canon, url_full, host)
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
