"""Kernel-function gates: each selector/codec kernel op as a distributed
query with a closed-form SQL oracle (the pattern proven by
``url_canonicalize``): inputs are synthesized JVM-side from `orders`
columns, the kernel runs in an Arrow-batched mapInPandas, and the oracle
reconstructs the expected output with plain string SQL.

Covers SURVEY.md §2d-§2e ops 26-29 and 36-37 — links (BFS ordering quirk,
links.rkt:33-35), links/text (links.rkt:37-43), html-decode/[*] (4-entity
table + fixpoint, html-entities.rkt:28-47), header codecs (title-casing,
head.rkt:60-66) and the RFC6265-subset cookie jar (fold + longest-path-first
match + header render, cookies.rkt:71-124, head.rkt:87-92).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .queries import T, q


def _orders_keyed(spark, sf_dir):
    # one slim-key shuffle so the Python-CPU stage downstream runs on every
    # core: the testdata orders table is a single small parquet file → a
    # 1-partition scan, which would serialize every kernel gate's
    # mapInPandas onto one core (at production scale the scan's file count
    # provides the parallelism; a CPU-heavy Arrow stage after a tiny scan
    # still wants this spread)
    return (
        T(spark, sf_dir, "orders")
        .select("o_orderkey")
        .repartition(spark.sparkContext.defaultParallelism)
    )


@q(
    "links_extract",
    """
    SELECT o_orderkey, CAST(0 AS INTEGER) AS idx,
           '/shallow/' || o_orderkey AS href FROM orders
    UNION ALL
    SELECT o_orderkey, CAST(1 AS INTEGER) AS idx,
           '/deep/' || o_orderkey FROM orders
    """,
)
def links_extract(spark, sf_dir):
    """``links`` gate: the DEEP anchor comes FIRST in document order, but
    links returns BFS order (shallow first) — the reference's ordering quirk
    (links.rkt:33-35, pinned by the '("fee" "foo") golden)."""
    from ..kernel import links

    o = _orders_keyed(spark, sf_dir).select(
        "o_orderkey",
        F.concat(
            F.lit("<html><body><table><tr><td><a href='/deep/"),
            F.col("o_orderkey").cast("string"),
            F.lit("'>d</a></td></tr></table><a href='/shallow/"),
            F.col("o_orderkey").cast("string"),
            F.lit("'>s</a></body></html>"),
        ).alias("html"),
    )

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = [
                {"o_orderkey": k, "idx": i, "href": u}
                for k, h in zip(pdf["o_orderkey"], pdf["html"])
                for i, u in enumerate(links(h))
            ]
            yield pd.DataFrame(rows, columns=["o_orderkey", "idx", "href"])

    return o.mapInPandas(run, "o_orderkey long, idx int, href string")


@q(
    "links_text_extract",
    "SELECT o_orderkey, '/buy/' || o_orderkey AS href FROM orders",
)
def links_text_extract(spark, sf_dir):
    """``links/text`` gate: hrefs of anchors whose TEXT matches the regex
    (links.rkt:37-43) — only the 'buy …' anchor survives."""
    from ..kernel import links_text

    o = _orders_keyed(spark, sf_dir).select(
        "o_orderkey",
        F.concat(
            F.lit("<html><body><td><a href='/buy/"),
            F.col("o_orderkey").cast("string"),
            F.lit("'>buy "), F.col("o_orderkey").cast("string"),
            F.lit("</a></td><td><a href='/info/"),
            F.col("o_orderkey").cast("string"),
            F.lit("'>info</a></td></body></html>"),
        ).alias("html"),
    )

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = [
                {"o_orderkey": k, "href": u}
                for k, h in zip(pdf["o_orderkey"], pdf["html"])
                for u in links_text(h, "^buy")
            ]
            yield pd.DataFrame(rows, columns=["o_orderkey", "href"])

    return o.mapInPandas(run, "o_orderkey long, href string")


@q(
    "html_decode_batch",
    """
    SELECT o_orderkey,
           'a&b/' || o_orderstatus || '&&lt;end&gt;:' AS decoded,
           '/' || o_orderkey AS decoded_star
    FROM orders
    """,
)
def html_decode_batch(spark, sf_dir):
    """``html-decode``/``html-decode*`` gate: ONLY the 4-entity table maps
    (&amp; &#38; &#x3a; &#x2f;); &lt;/&gt; pass through untouched, and the
    star form fixpoints double-encoded entities (html-entities.rkt:28-47)."""
    from ..kernel import html_decode, html_decode_star

    o = T(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.concat(
            F.lit("a&#38;b&#x2f;"), F.col("o_orderstatus"),
            F.lit("&amp;&lt;end&gt;&#x3a;"),
        ).alias("raw"),
        F.concat(F.lit("&amp;#x2f;"), F.col("o_orderkey").cast("string")).alias("raw2"),
    )

    def run(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["decoded"] = pdf["raw"].map(html_decode)
            pdf["decoded_star"] = pdf["raw2"].map(html_decode_star)
            yield pdf[["o_orderkey", "decoded", "decoded_star"]]

    return o.mapInPandas(run, "o_orderkey long, decoded string, decoded_star string")


@q(
    "header_parse",
    """
    SELECT o_orderkey, 'Content-Type' AS name, 'text/html' AS value FROM orders
    UNION ALL
    SELECT o_orderkey, 'X-Order-Id', CAST(o_orderkey AS VARCHAR) FROM orders
    UNION ALL
    SELECT o_orderkey, 'Set-Cookie', 'a=1' FROM orders
    """,
)
def header_parse(spark, sf_dir):
    """Header-codec gate: raw lower-cased header lines → (Title-Cased name,
    trimmed value) alist (head.rkt:60-66)."""
    from ..kernel.headers import headers_to_alist

    o = _orders_keyed(spark, sf_dir)

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for k in pdf["o_orderkey"]:
                alist = headers_to_alist([
                    b"content-type:  text/html ",
                    f"x-order-id: {k}".encode(),
                    b"set-cookie: a=1",
                ])
                rows += [
                    {"o_orderkey": k, "name": n, "value": v} for n, v in alist
                ]
            yield pd.DataFrame(rows, columns=["o_orderkey", "name", "value"])

    return o.mapInPandas(run, "o_orderkey long, name string, value string")


@q(
    "cookie_fold",
    """
    SELECT o_orderkey,
           'sess=' || o_orderkey || '; user=u' || (o_orderkey % 100) AS cookie_header
    FROM orders
    """,
)
def cookie_fold(spark, sf_dir):
    """Cookie-jar gate (cookies.rkt:71-124 + head.rkt:87-92): three
    Set-Cookie headers fold into the jar; matching against the request url
    keeps the path-matching pair in longest-path-first order and drops the
    non-matching path; the rendered Cookie header is closed-form."""
    from ..kernel.cookies import cookies_ref, cookies_to_header
    from ..kernel.headers import headers_set_cookies, headers_to_alist

    o = _orders_keyed(spark, sf_dir)

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for k in pdf["o_orderkey"]:
                url = f"http://shop{k % 5}.test/a/b/c"
                alist = headers_to_alist([
                    f"set-cookie: sess={k}; Path=/a/b".encode(),
                    f"set-cookie: user=u{k % 100}; Path=/".encode(),
                    b"set-cookie: other=x; Path=/zz",
                ])
                jar = headers_set_cookies(alist, url)
                rows.append({
                    "o_orderkey": k,
                    "cookie_header": cookies_to_header(cookies_ref(jar, url)),
                })
            yield pd.DataFrame(rows, columns=["o_orderkey", "cookie_header"])

    return o.mapInPandas(run, "o_orderkey long, cookie_header string")


@q(
    "robots_parse",
    """
    SELECT o_orderkey, 'disallow' AS rule_type,
           '/b/' || o_orderkey AS path FROM orders
    UNION ALL
    SELECT o_orderkey, 'disallow', '/priv' FROM orders
    UNION ALL
    SELECT o_orderkey, 'allow', '/b/ok*.html$' FROM orders
    """,
)
def robots_parse(spark, sf_dir):
    """robots.txt parser gate (RFC 9309, engine/robots.py): the
    agent-specific group ('boris') wins over '*'; comments and empty
    Disallows are skipped; Allow rules (incl. wildcard/anchor paths) parse
    alongside Disallow — three rules per synthesized file. Runs the
    VECTORIZED batch parser (robots_frames — pandas str ops, no per-row
    Python); loop-vs-frame equivalence is separately pinned by
    tests/test_warc.py's golden + hypothesis parity tests."""
    from ..engine.robots import robots_frames

    o = _orders_keyed(spark, sf_dir)

    def run(batches):
        import pandas as pd

        for pdf in batches:
            bodies = [
                (
                    "# synthetic robots\n"
                    "User-agent: boris\n"
                    f"Disallow: /b/{k}\n"
                    "Disallow: /priv\n"
                    "Allow: /b/ok*.html$\n"
                    "\n"
                    "User-agent: *\n"
                    "Disallow: /everyone\n"
                    "Disallow:\n"
                )
                for k in pdf["o_orderkey"]
            ]
            rules, _ = robots_frames(pdf["o_orderkey"], bodies, "boris")
            yield pd.DataFrame({
                "o_orderkey": rules["key"].astype("int64"),
                "rule_type": rules["rule_type"],
                "path": rules["path"],
            })

    return o.mapInPandas(run, "o_orderkey long, rule_type string, path string")


@q(
    "doc_main_text",
    """
    SELECT o_orderkey,
           'Order ' || o_orderkey || ' was shipped with priority handling '
           || 'and arrived in good condition.' || chr(10)
           || 'Customer feedback for order ' || o_orderkey
           || ': careful packaging, prompt delivery window.' AS main_text,
           CAST(2 AS INTEGER) AS n_blocks
    FROM orders WHERE o_orderkey % 10 = 0
    """,
)
def doc_main_text(spark, sf_dir):
    """Boilerplate-removal gate (kernel/htmlkit.py main_text — jusText-style
    leaf-block segmentation): the <nav> prunes, the link-farm div dies on
    link density, the short <p> dies on min length, raw whitespace runs
    collapse, and the two content paragraphs survive newline-joined. The
    expected text is closed-form in the key, so the oracle is plain SQL.
    Not a reference op — the training-data-pipeline step downstream of the
    crawl (reference extraction stops at xpath/text, html/xpath.rkt)."""
    from ..kernel.htmlkit import main_text, main_text_blocks

    # deterministic 1-in-10 subset: the gate's value is semantic (prune /
    # density / length / collapse all exercised per row); the full-orders
    # form just multiplies identical work (24 s at sf0.1)
    o = _orders_keyed(spark, sf_dir).filter(F.col("o_orderkey") % 10 == 0)

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for k in pdf["o_orderkey"]:
                html = (
                    f"<html><head><title>Order {k}</title>"
                    "<style>p { color: red }</style></head><body>\n"
                    "<nav><a href='/'>Home</a> <a href='/orders'>All "
                    "orders</a></nav>\n"
                    "<div id='content'>\n"
                    f"  <p>Order {k} was shipped\n     with priority "
                    "handling and arrived in good condition.</p>\n"
                    f"  <p>Customer feedback for order {k}: careful "
                    "packaging, prompt delivery window.</p>\n"
                    "  <p>ok</p>\n"
                    "</div>\n"
                    "<div class='related'><a href='/o/1'>Related order "
                    "one</a> <a href='/o/2'>Related order two</a></div>\n"
                    "<footer>Copyright 2026 Example Corp.</footer>\n"
                    "</body></html>"
                )
                rows.append({
                    "o_orderkey": k,
                    "main_text": main_text(html),
                    "n_blocks": len(main_text_blocks(html)),
                })
            yield pd.DataFrame(
                rows, columns=["o_orderkey", "main_text", "n_blocks"]
            )

    return o.mapInPandas(
        run, "o_orderkey long, main_text string, n_blocks int"
    )


_RDEC_SQL = """
WITH u AS (
  SELECT o_orderkey,
         'h' || (o_orderkey % 5) || '.t' AS host,
         '/p/' || (o_orderkey % 40)
           || CASE WHEN o_orderkey % 2 = 0 THEN '.html' ELSE '' END AS pqf
  FROM orders
),
r AS (
  SELECT 'h' || h || '.t' AS host, 'disallow' AS rule_type,
         '/p/' AS path, '/p/%' AS pat, 3 AS plen
  FROM range(5) t(h)
  UNION ALL
  SELECT 'h' || h || '.t', 'allow', '/p/*.html$', '/p/%.html', 10
  FROM range(5) t(h)
  UNION ALL
  SELECT 'h' || h || '.t', 'disallow', '/p/1*.html$', '/p/1%.html', 11
  FROM range(5) t(h)
),
m AS (
  SELECT u.o_orderkey, r.rule_type, r.plen
  FROM u JOIN r USING (host) WHERE u.pqf LIKE r.pat
),
best AS (
  SELECT o_orderkey,
         max(plen * 2 + CASE WHEN rule_type = 'allow' THEN 1 ELSE 0 END) AS s
  FROM m GROUP BY o_orderkey
)
SELECT u.o_orderkey, 'http://' || u.host || u.pqf AS url_canon,
       COALESCE(best.s % 2 = 1, TRUE) AS allowed
FROM u LEFT JOIN best USING (o_orderkey)
"""


@q("robots_decision", _RDEC_SQL)
def robots_decision_gate(spark, sf_dir):
    """robots decision gate (RFC 9309 §2.2.2-§2.2.3): the engine's
    split_blocked — Allow + Disallow rules with ``*`` wildcards and
    trailing-``$`` anchors compiled to codegen'd LIKE patterns, longest
    rule wins, Allow wins ties, no match allows — partitions a synthesized
    URL population; the oracle replays the same precedence with LIKE +
    a grouped max in SQL. The rules side is a broadcast (it is per-HOST
    metadata — at 10^8 hosts it shards by host range, still never
    frontier-sized); the URL side is scanned once and the per-URL best
    match is one partial-agg shuffle (inside split_blocked's groupBy)."""
    from ..engine.robots import robots_rules_df, split_blocked

    u = _orders_keyed(spark, sf_dir).select(
        "o_orderkey",
        F.concat(
            F.lit("h"), F.pmod("o_orderkey", F.lit(5)).cast("string"), F.lit(".t")
        ).alias("host"),
        F.concat(
            F.lit("/p/"), F.pmod("o_orderkey", F.lit(40)).cast("string"),
            F.when(F.pmod("o_orderkey", F.lit(2)) == 0, ".html").otherwise(""),
        ).alias("pqf"),
    ).select(
        "o_orderkey", "host",
        F.concat(F.lit("http://"), "host", "pqf").alias("url_canon"),
    )
    rules = robots_rules_df(spark, [
        (f"h{h}.t", t, p)
        for h in range(5)
        for t, p in [
            ("disallow", "/p/"),
            ("allow", "/p/*.html$"),
            ("disallow", "/p/1*.html$"),
        ]
    ])
    allowed, blocked = split_blocked(u, rules)
    return (
        allowed.withColumn("allowed", F.lit(True))
        .unionByName(blocked.withColumn("allowed", F.lit(False)))
        .select("o_orderkey", "url_canon", "allowed")
    )


@q(
    "sitemap_discovery",
    """
    SELECT o_orderkey,
           'shop' || (o_orderkey % 5) || '.test' AS host,
           'http://shop' || (o_orderkey % 5) || '.test/sitemap'
               || (o_orderkey % 3) || '.xml' AS sitemap_url
    FROM orders
    UNION ALL
    SELECT o_orderkey, 'shop' || (o_orderkey % 5) || '.test',
           'http://shop' || (o_orderkey % 5) || '.test/maps/rel'
               || (o_orderkey % 2) || '.xml'
    FROM orders
    UNION ALL
    SELECT o_orderkey, 'shop' || (o_orderkey % 5) || '.test',
           'http://mirror.test/shared.xml'
    FROM orders
    """,
)
def sitemap_discovery(spark, sf_dir):
    """Sitemap discovery from robots.txt ``Sitemap:`` directives (the
    sitemaps.org robots-inclusion protocol; the reference's frontier
    seeding consumes the discovered inventory via ``seed_frontier``,
    sources/sitemap.py): per host, every Sitemap directive in the robots
    body — case-insensitive key, optional whitespace, absolute kept as-is
    and relative resolved against the host origin — emitted as
    (host, sitemap_url) rows ready for the sitemap source's bounded index
    recursion. The fixture robots bodies are synthesized closed-form from
    orders keys with three directive spellings (canonical, lowercase
    relative, no-space uppercase); the oracle enumerates the expected rows
    independently, sharing no parse code with the query.

    Scale design: discovery is a map-only codegen pass over robots bodies
    the crawl already fetched — a multiline ``regexp_extract_all`` +
    explode scan-side projection, no Python stage, no shuffle (the
    per-host dedup that follows in seed_frontier shuffles slim
    (host, url) rows only). At 10^8 hosts this is the same single pass
    that parses Allow/Disallow (engine/robots.py robots_frames); plan
    audit forbids any Exchange or Python stage (no ``_orders_keyed``
    repartition here — there is no Python CPU stage to spread, so the
    whole gate is scan → project → explode inside one codegen span)."""
    o = T(spark, sf_dir, "orders").select("o_orderkey")
    k = F.col("o_orderkey")
    host = F.concat(F.lit("shop"), (k % 5).cast("string"), F.lit(".test"))
    body = F.concat(
        F.lit("# synthetic robots\nUser-agent: *\nDisallow: /priv\n"),
        F.lit("Sitemap: http://"), host, F.lit("/sitemap"),
        (k % 3).cast("string"), F.lit(".xml\n"),
        F.lit("sitemap: /maps/rel"), (k % 2).cast("string"),
        F.lit(".xml  \n"),
        F.lit("SITEMAP:http://mirror.test/shared.xml\nDisallow: /other\n"),
    )
    sm = o.select(
        "o_orderkey",
        host.alias("host"),
        F.explode(
            F.regexp_extract_all(
                body, F.lit(r"(?im)^[ \t]*sitemap[ \t]*:[ \t]*(\S+)"), 1
            )
        ).alias("raw"),
    )
    return sm.select(
        "o_orderkey",
        "host",
        F.when(F.col("raw").startswith("http"), F.col("raw"))
        .otherwise(F.concat(F.lit("http://"), F.col("host"), F.col("raw")))
        .alias("sitemap_url"),
    )
