"""Sitemap kernel + distributed source tests.

The reference's spider has no sitemap notion (seeds are program literals,
/root/reference/boris/main.rkt); the semantics pinned here follow the public
sitemaps.org 0.9 protocol. Kernel tests are pure-Python goldens; the Spark
tests exercise the distributed source end-to-end (parse → frontier seeds)
and the frontier-key parity with the crawl engine's url kernel.
"""

from __future__ import annotations

from boris_spark.kernel import canonicalize, url_hash
from boris_spark.kernel.sitemapkit import (
    parse_sitemap,
    sitemap_urls_from_robots,
)

LEAF = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc> http://a.test/x?q=1&amp;r=2 </loc>
    <lastmod>2024-03-01</lastmod>
    <changefreq>DAILY</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc>http://a.test/y</loc><changefreq>sometimes</changefreq></url>
  <url><lastmod>2024-01-01</lastmod></url>
</urlset>"""


def test_parse_leaf_fields():
    es = parse_sitemap(LEAF)
    # loc-less entry dropped
    assert [e.loc for e in es] == ["http://a.test/x?q=1&r=2", "http://a.test/y"]
    e0 = es[0]
    assert e0.kind == "urlset"
    assert e0.lastmod == "2024-03-01"
    assert e0.changefreq == "daily"  # case-folded
    assert e0.priority == 0.8
    # out-of-vocabulary changefreq dropped, URL kept
    assert es[1].changefreq is None and es[1].priority is None


def test_parse_index():
    idx = (
        '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<sitemap><loc>http://a.test/s1.xml</loc>"
        "<lastmod>2024-02-02</lastmod></sitemap>"
        "<sitemap><loc>http://a.test/s2.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    es = parse_sitemap(idx)
    assert [(e.kind, e.loc) for e in es] == [
        ("sitemapindex", "http://a.test/s1.xml"),
        ("sitemapindex", "http://a.test/s2.xml"),
    ]
    assert es[0].lastmod == "2024-02-02"
    # index entries never carry changefreq/priority
    assert es[0].changefreq is None and es[0].priority is None


def test_parse_broken_xml_regex_fallback():
    # unclosed root + stray ampersand: ET.fromstring raises; the regex
    # fallback must still recover both entries and decode &amp;
    broken = (
        "<urlset><url><loc>http://a.test/p&amp;q</loc>"
        "<priority>0.5</priority></url>"
        "<url><loc>http://a.test/r</loc></url>"
    )
    es = parse_sitemap(broken)
    assert [e.loc for e in es] == ["http://a.test/p&q", "http://a.test/r"]
    assert es[0].priority == 0.5


def test_parse_non_sitemap_document():
    assert parse_sitemap("<html><body>404</body></html>") == []
    assert parse_sitemap("not xml at all & < >") == []
    assert parse_sitemap("") == []


def test_robots_sitemap_directives():
    robots = (
        "User-agent: *\n"
        "Disallow: /private\n"
        "Sitemap: http://a.test/sitemap.xml\n"
        "sitemap:http://a.test/s2.xml  # comment\n"
        "Sitemap: http://a.test/sitemap.xml\n"  # dup dropped
        "SITEMAP: http://a.test/s3.xml\n"
    )
    assert sitemap_urls_from_robots(robots) == [
        "http://a.test/sitemap.xml",
        "http://a.test/s2.xml",
        "http://a.test/s3.xml",
    ]
    assert sitemap_urls_from_robots("User-agent: *\nDisallow:\n") == []


def test_spark_sitemap_frontier_keys(spark):
    """Distributed path: entries → frontier seeds keyed EXACTLY like the
    crawl engine's url_canonicalize stage (same kernel, same xxh64), so
    sitemap seeds and link-discovered urls dedup byte-for-byte."""
    from boris_spark.sources.sitemap import read_sitemaps, sitemap_frontier

    docs = spark.createDataFrame(
        [("http://a.test/sitemap.xml", LEAF)], "url string, xml string"
    )
    entries = read_sitemaps(docs)
    rows = {r.url_canon: r for r in sitemap_frontier(entries).collect()}
    raw = "http://a.test/x?q=1&r=2"
    assert set(rows) == {canonicalize(raw), canonicalize("http://a.test/y")}
    r = rows[canonicalize(raw)]
    assert r.url_full == raw
    assert r.host == "a.test"
    assert r.url_hash == url_hash(canonicalize(raw))


def test_spark_discover_sitemaps(spark):
    from boris_spark.sources.sitemap import discover_sitemaps

    robots = spark.createDataFrame(
        [
            ("http://a.test/robots.txt",
             b"Sitemap: http://a.test/s.xml\nSitemap: http://a.test/t.xml\n"),
            ("http://b.test/robots.txt", b"User-agent: *\nDisallow: /\n"),
        ],
        "url string, body binary",
    )
    out = discover_sitemaps(robots).orderBy("robots_url", "pos").collect()
    assert [(r.robots_url, r.pos, r.sitemap_url) for r in out] == [
        ("http://a.test/robots.txt", 0, "http://a.test/s.xml"),
        ("http://a.test/robots.txt", 1, "http://a.test/t.xml"),
    ]


def test_seed_frontier_from_sitemap(spark, tmp_path):
    """End-to-end DataFrame seeding (CrawlEngine.run(seed_frontier=...)):
    a crawl whose round-0 frontier comes from a parsed sitemap fetches the
    SAME url set and extracts the SAME value multiset as the equivalent
    Lit-seeded program — the seeds just never pass through the driver."""
    from boris_spark.engine.crawler import CrawlEngine
    from boris_spark.oracle.program import (
        Extract, First, Go, Lit, XpathE, XpathTextE,
    )
    from boris_spark.sources.sitemap import read_sitemaps, sitemap_frontier
    from boris_spark.synth import webgen

    n = 48
    seeds = [webgen.page_url(i, n, 7) for i in (0, 16, 32)]
    pages = spark.createDataFrame(
        [(u, h) for u, h in webgen.corpus_pages_dict(n, 7).items()],
        "url string, html string",
    )
    xml = (
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        + "".join(f"<url><loc>{u}</loc></url>" for u in seeds)
        + "</urlset>"
    )
    docs = spark.createDataFrame(
        [("http://a.test/sitemap.xml", xml)], "url string, xml string"
    )
    frontier = sitemap_frontier(read_sitemaps(docs))

    links = XpathE("//td[@class='title']/a/@href/text()")
    leaf = Extract(First(XpathTextE("//title")))

    def crawl(program, workdir, **kw):
        eng = CrawlEngine(spark, pages, str(workdir), politeness_k=1000)
        eng.run(program, max_rounds=20, **kw)
        return eng

    a = crawl(Go(Lit([]), leaf, Go(links, leaf)), tmp_path / "sm",
              seed_frontier=frontier)
    b = crawl(Go(Lit(seeds), leaf, Go(links, leaf)), tmp_path / "lit")

    seen_a = {r.url_canon for r in a.seen_df().collect()}
    seen_b = {r.url_canon for r in b.seen_df().collect()}
    assert seen_a == seen_b and seen_a
    vals_a = sorted(r.value for r in a.results_df().collect())
    vals_b = sorted(r.value for r in b.results_df().collect())
    assert vals_a == vals_b
