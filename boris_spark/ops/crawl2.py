"""Second flagship crawl gate: a form/pagination site exercising the
syntax-layer operators end-to-end through the distributed engine —
click (+Referer), submit (POST form, html_decode_star'd action), forms
parsing + fill, extract/list, let/web, for/web, label/recur pagination,
show, download — each with its own DuckDB oracle over `documents`
(reference behaviors: syntax/navigation.rkt:28-47, forms.rkt:46-85,
syntax/binding.rkt:27-64, syntax/control.rkt:14-28, syntax/io.rkt:17-36).

Site shape (deterministic, closed-form over doc_id so every oracle is plain
SQL): ≤8 listing pages chained by a "More" link (pagination depth stays
bounded at any sf — rounds are the sequential unit of the engine), each
listing shows its slice of documents as item anchors, one POST form whose
action is entity-encoded (``&#x2f;d&#x2f;<id>`` — html-entities.rkt:43-47
fixpoint decode), and every item click lands on a detail page whose body is
downloaded byte-identically.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..engine.crawler import CrawlEngine
from ..oracle import program as P
from ..oracle.program import (
    Click, Download, Extract, ExtractList, First, Fmt, FormsE, Go, Label,
    LetWeb, ListE, Lit, PrevRequestE, Recur, Show, Submit, ForWeb, UrlE,
    Var, XpathE, XpathTextE,
)
from .queries import T, q, table_rows

HOST = "list.test"
N_LISTS = 8  # listing-chain length is fixed: rounds stay O(8) at any sf


def _page_size(n_docs: int) -> int:
    return -(-n_docs // N_LISTS)  # ceil


def list_url(p: int) -> str:
    return f"http://{HOST}/l/{p}"


def detail_url(d: int) -> str:
    return f"http://{HOST}/d/{d}"


def detail_html_sql(text_expr: str = "text", id_expr: str = "doc_id") -> str:
    """The detail page as a SQL concat — shared by the builder oracle checks
    and the byte-identity download gate."""
    return (
        f"'<html><head><title>doc ' || {id_expr} || '</title></head>"
        f"<body><p>' || {text_expr} || '</p></body></html>'"
    )


# --------------------------------------------------------------- builders


def build_list_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(url, html) for the listing chain + detail pages — all JVM-side
    string concat over `documents` (whole-stage codegen, no UDF)."""
    docs = T(spark, sf_dir, "documents")
    n = table_rows(sf_dir, "documents")
    ps = _page_size(n)
    n_pages = -(-n // ps)
    d = F.col("doc_id")

    detail = docs.select(
        F.concat(F.lit(f"http://{HOST}/d/"), d.cast("string")).alias("url"),
        F.concat(
            F.lit("<html><head><title>doc "), d.cast("string"),
            F.lit("</title></head><body><p>"), F.col("text"),
            F.lit("</p></body></html>"),
        ).alias("html"),
    )

    item = F.concat(
        F.lit("<td class='it'><a href='/d/"), d.cast("string"),
        F.lit("'>item "), d.cast("string"), F.lit("</a></td>"),
    )
    pg = F.floor(d / ps).cast("long")
    listing = (
        docs.select(pg.alias("p"), d.alias("doc_id"), item.alias("item"))
        .groupBy("p")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("doc_id", "item"))
                    ),
                    lambda s: s.getField("item"),
                ),
                "",
            ).alias("items")
        )
        .select(
            F.concat(F.lit(f"http://{HOST}/l/"), F.col("p").cast("string")).alias("url"),
            F.concat(
                F.lit("<html><head><title>list "), F.col("p").cast("string"),
                F.lit("</title></head><body><span class='pg'>"),
                F.col("p").cast("string"), F.lit("</span>"),
                F.col("items"),
                # form action is entity-encoded: html_decode_star must fire
                F.lit("<form action='&#x2f;d&#x2f;"),
                (F.col("p") * ps).cast("string"),
                F.lit("' method='post'><input type='hidden' name='pg' value='"),
                F.col("p").cast("string"), F.lit("'></form>"),
                F.when(
                    F.col("p") + 1 < n_pages,
                    F.concat(
                        F.lit("<td class='more'><a href='/l/"),
                        (F.col("p") + 1).cast("string"),
                        F.lit("'>More</a></td>"),
                    ),
                ).otherwise(F.lit("")),
                F.lit("</body></html>"),
            ).alias("html"),
        )
    )
    return detail.unionByName(listing)


def build_list_pages_py(docs: list[tuple[int, str]]) -> dict[str, str]:
    """Pure-Python mirror of :func:`build_list_pages` (byte-identical) for
    the oracle interpreter's snapshot fetcher in parity tests."""
    n = len(docs)
    ps = _page_size(n)
    n_pages = -(-n // ps)
    pages: dict[str, str] = {}
    for d, text in docs:
        pages[detail_url(d)] = (
            f"<html><head><title>doc {d}</title></head>"
            f"<body><p>{text}</p></body></html>"
        )
    by_page: dict[int, list[tuple[int, str]]] = {}
    for d, _ in docs:
        by_page.setdefault(d // ps, []).append(
            (d, f"<td class='it'><a href='/d/{d}'>item {d}</a></td>")
        )
    for p, items in by_page.items():
        items.sort()
        more = (
            f"<td class='more'><a href='/l/{p + 1}'>More</a></td>"
            if p + 1 < n_pages else ""
        )
        pages[list_url(p)] = (
            f"<html><head><title>list {p}</title></head><body>"
            f"<span class='pg'>{p}</span>"
            + "".join(i for _, i in items)
            + f"<form action='&#x2f;d&#x2f;{p * ps}' method='post'>"
            f"<input type='hidden' name='pg' value='{p}'></form>"
            + more + "</body></html>"
        )
    return pages


# ---------------------------------------------------------------- program

EX_ITEMS = ExtractList(XpathTextE("//td[@class='it']/a"))
EX_PAGENO = Extract(Fmt("page:{0}", [Var("p")]))
EX_DETAIL = Extract(ListE([UrlE(), First(XpathTextE("//p"))]))
EX_POST = Extract(PrevRequestE())
DL_DETAIL = Download()


def make_program() -> P.Node:
    prog = Go(
        list_url(0),
        Label(
            "pg",
            Show(Lit("page"), EX_ITEMS),
            LetWeb([("p", First(XpathTextE("//span[@class='pg']")))], EX_PAGENO),
            ForWeb(
                [("d", XpathE("//td[@class='it']/a/@href/text()"))],
                Click(Var("d"), EX_DETAIL, DL_DETAIL),
            ),
            Submit(FormsE(), EX_POST),
            Click(XpathE("//td[@class='more']/a/@href/text()"), Recur("pg")),
        ),
    )
    P.assign_ids(prog)  # pin node ids now so gates can filter results by pc
    return prog


PROGRAM = make_program()

_crawl2_cache: dict[str, CrawlEngine] = {}


def _run_list_crawl(spark: SparkSession, sf_dir: str) -> CrawlEngine:
    key = os.path.abspath(sf_dir)
    if key in _crawl2_cache:
        return _crawl2_cache[key]
    pages = build_list_pages(spark, sf_dir)
    workdir = tempfile.mkdtemp(prefix="boris_crawl2_")
    eng = CrawlEngine(spark, pages, workdir, politeness_k=None, use_bloom=True)
    eng.run(PROGRAM, max_rounds=2 * N_LISTS + 4)
    _crawl2_cache[key] = eng
    return eng


def _json_str(col):
    """Decode a JSON-encoded scalar string value (from_json needs a
    container type, so wrap in a singleton array)."""
    return F.from_json(
        F.concat(F.lit("["), F.col(col), F.lit("]")), "array<string>"
    ).getItem(0)


def _results_for(spark, sf_dir, node) -> DataFrame:
    eng = _run_list_crawl(spark, sf_dir)
    return eng.results_df().where(F.col("pc") == node.node_id)


_PARAMS_CTE = """
WITH params AS (
    SELECT count(*) AS n,
           CAST(ceil(count(*) / 8.0) AS BIGINT) AS ps
    FROM documents
),
pages AS (
    SELECT UNNEST(range(CAST(ceil(n * 1.0 / ps) AS BIGINT))) AS p, ps
    FROM params
)
"""


@q(
    "crawl2_listing_items",
    "SELECT 'item ' || doc_id AS item FROM documents",
)
def crawl2_listing_items(spark, sf_dir):
    """extract/list gate (extraction.rkt:24-28): every listing emits its
    item anchor texts as separate flies — one per document overall."""
    return _results_for(spark, sf_dir, EX_ITEMS).select(
        _json_str("value").alias("item")
    )


@q(
    "crawl2_page_no",
    _PARAMS_CTE + "SELECT 'page:' || CAST(p AS VARCHAR) AS pageno FROM pages",
)
def crawl2_page_no(spark, sf_dir):
    """let/web gate (binding.rkt:36-47): bind the span text, format it —
    one fly per listing page."""
    return _results_for(spark, sf_dir, EX_PAGENO).select(
        _json_str("value").alias("pageno")
    )


@q(
    "crawl2_detail_text",
    "SELECT 'http://list.test/d/' || doc_id AS url, text FROM documents",
)
def crawl2_detail_text(spark, sf_dir):
    """for/web + click gate (binding.rkt:27-33, navigation.rkt:28-36):
    every item click lands on its detail page; (url, text) extracted —
    byte-identical text per url."""
    v = F.from_json("value", "array<string>")
    return _results_for(spark, sf_dir, EX_DETAIL).select(
        v.getItem(0).alias("url"), v.getItem(1).alias("text")
    )


@q(
    "crawl2_post_requests",
    _PARAMS_CTE + """
    SELECT 'POST' AS method, 'http://list.test/d/' || CAST(p * ps AS VARCHAR) AS url
    FROM pages
    """,
)
def crawl2_post_requests(spark, sf_dir):
    """submit + forms + previous-request gate (navigation.rkt:39-47,
    forms.rkt:55-58, selectors.rkt:29-30): the POST form's entity-encoded
    action is html_decode_star'd (html-entities.rkt:43-47), resolved, and
    the landed page reports its own request as [method, url]."""
    v = F.from_json("value", "array<string>")
    return _results_for(spark, sf_dir, EX_POST).select(
        v.getItem(0).alias("method"), v.getItem(1).alias("url")
    )


@q(
    "crawl2_downloads",
    "SELECT 'http://list.test/d/' || doc_id AS url, "
    + detail_html_sql()
    + " AS body FROM documents",
)
def crawl2_downloads(spark, sf_dir):
    """download gate (io.rkt:27-36): the detail body is sunk byte-identical
    once per reaching branch (exactly one branch per document here)."""
    eng = _run_list_crawl(spark, sf_dir)
    return eng.downloads_df().select("url", F.col("value").alias("body"))


@q(
    "crawl2_seen",
    _PARAMS_CTE + """
    SELECT 'http://list.test/l/' || CAST(p AS VARCHAR) AS url FROM pages
    UNION ALL
    SELECT 'http://list.test/d/' || doc_id FROM documents
    """,
)
def crawl2_seen(spark, sf_dir):
    """URL-seen set of the pagination crawl: all listings + all details,
    each fetched exactly once (the memoized request service,
    browser-services.rkt:35-47)."""
    eng = _run_list_crawl(spark, sf_dir)
    return eng.seen_df().select(F.col("url_canon").alias("url"))
