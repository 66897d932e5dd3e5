"""Oracle-interpreter tests mirroring the reference's semantics/interpreter
tests (/root/reference/boris/interpreter.rkt:63-81, semantics.rkt:96-137)
and its demo crawls (tests/boris/hn-crawl.rkt, wiki-crawl.rkt) over a
deterministic snapshot instead of the live web."""

from boris_spark.oracle import SnapshotFetcher, spider
from boris_spark.oracle.program import (
    First,
    Add, Body, Cmp, Extract, ExtractList, ForWeb, Go, IfE, Label, LetWeb,
    Lit, Recur, UrlE, Var, When, XpathE, XpathFirstE, XpathTextE, RxSearch,
    Fmt, LinksE,
)


def make_site():
    pages = {
        "http://a.com/": (
            "<title>index</title>"
            "<td class='title'><a href='/s/1'>story one</a></td>"
            "<td class='title'><a href='/s/2'>story two</a></td>"
            "<td class='title'><a href='/page/2'>More</a></td>"
        ),
        "http://a.com/s/1": "<p>body one</p><a href='http://b.com/x'>ext</a>",
        "http://a.com/s/2": "<p>body two</p>",
        "http://a.com/page/2": (
            "<td class='title'><a href='/s/3'>story three</a></td>"
        ),
        "http://a.com/s/3": "<p>body three</p>",
        "http://b.com/x": "<p>external</p>",
    }
    return SnapshotFetcher(pages)


def test_go_extract_body():
    # interpreter.rkt:73-78: let/web + go + extract (body)
    web = LetWeb([("a", Lit([3, 4]))], Go("http://a.com/s/2", Extract(Body())))
    res = spider(web, make_site())
    assert res.fly_values == ["<p>body two</p>"]
    assert res.seen == {"http://a.com/s/2"}


def test_go_fanout_order_and_relative_urls():
    web = Go(
        "http://a.com/",
        Go(XpathE("//td[@class='title']/a/@href/text()"),
           Extract(XpathTextE("//p"))),
    )
    res = spider(web, make_site())
    # /page/2 has no <p>; xpath/text over //p yields [] → extract/single of
    # a list... Extract wraps the whole list as one value.
    assert res.visits == [
        "http://a.com/",
        "http://a.com/s/1",
        "http://a.com/s/2",
        "http://a.com/page/2",
    ]
    assert res.fly_values == [["body one"], ["body two"], []]


def test_extract_list_vs_extract():
    web = Go("http://a.com/s/1", ExtractList(XpathTextE("//p")))
    res = spider(web, make_site())
    assert res.fly_values == ["body one"]


def test_none_suppressed():
    # browser-services.rkt:50-53: #f/void suppressed
    web = Go(
        "http://a.com/s/1",
        Extract(When(RxSearch("nomatch", Body()), Lit("found"))),
    )
    assert spider(web, make_site()).fly_values == []


def test_cache_dedup_fetch_once():
    web = Go(
        Lit(["http://a.com/s/1", "http://a.com/s/1"]),
        Extract(UrlE()),
    )
    res = spider(web, make_site())
    assert res.visits == ["http://a.com/s/1"]  # one fetch
    assert res.fly_values == ["http://a.com/s/1", "http://a.com/s/1"]  # two traversals


def test_for_web_zipped():
    # binding.rkt:27-33: multi-clause iteration is zipped, not cartesian
    web = ForWeb(
        [("x", Lit(["1", "2"])), ("y", Lit(["a", "b"]))],
        Extract(Fmt("{}{}", [Var("x"), Var("y")])),
    )
    assert spider(web, make_site()).fly_values == ["1a", "2b"]


def test_label_recur_pagination():
    # hn-crawl.rkt search-hn: crawl page list, follow 'More' up to N pages
    page_search = ForWeb(
        [("link", XpathE("//td[@class='title']/a"))],
        Go(XpathE("/a/@href/text()", Var("link")),
           Extract(Fmt("{}: {}", [First(XpathE("/a/text()", Var("link"))), UrlE()]))),
    )
    web = Go(
        "http://a.com/",
        LetWeb(
            [("pages_crawled", Lit(0))],
            Label(
                "hn_page",
                page_search,
                Go(IfE(Cmp(">", Lit(1), Var("pages_crawled")),
                       XpathE("//td[@class='title']/a[text() = 'More']/@href/text()"),
                       Lit([])),
                   LetWeb([("pages_crawled", Add(Var("pages_crawled"), Lit(1)))],
                          Recur("hn_page"))),
            ),
        ),
    )
    res = spider(web, make_site())
    assert res.fly_values == [
        "story one: http://a.com/s/1",
        "story two: http://a.com/s/2",
        "More: http://a.com/page/2",
        "story three: http://a.com/s/3",
    ]
    assert res.seen == {
        "http://a.com/", "http://a.com/s/1", "http://a.com/s/2",
        "http://a.com/page/2", "http://a.com/s/3",
    }


def test_path_keys_lexicographic_is_dfs():
    web = Go(
        "http://a.com/",
        Go(XpathE("//td[@class='title']/a/@href/text()"), Extract(UrlE())),
    )
    res = spider(web, make_site())
    paths = [f.path for f in res.flies]
    assert paths == sorted(paths)  # DFS emission order == lex path order
    # discoveries: min path per url reproduces first-visit order
    first = {}
    for url, p in res.discoveries:
        if url not in first or p < first[url]:
            first[url] = p
    ordered = [u for u, _ in sorted(first.items(), key=lambda kv: kv[1])]
    assert ordered == res.visits


def test_links_selector_bfs_parity():
    web = Go("http://a.com/s/1", Extract(LinksE(".")))
    assert spider(web, make_site()).fly_values == [["http://b.com/x"]]


