"""Engine ↔ oracle parity: the north-rule gate.

Given the same program + snapshot corpus, the distributed engine must
reproduce the reference semantics (via the oracle, which implements
/root/reference/boris/interpreter.rkt:54-59 exactly):

- identical extraction stream (values in path_key order, byte-identical);
- identical URL-seen set (canonical keys, /root/reference/hypertext-browser/url.rkt:37-38);
- identical first-visit order (lex-min discovery path);
- invariance to the politeness budget and to parallelism level.
"""

import json

import pytest

from boris_spark.engine.crawler import CrawlEngine
from boris_spark.oracle import SnapshotFetcher, spider
from boris_spark.oracle.program import (
    Add, Cmp, Extract, ExtractList, ForWeb, First, Fmt, Go, IfE, Label,
    LetWeb, Lit, Recur, UrlE, Var, XpathE, XpathTextE, path_key_hex,
)
from boris_spark.synth import webgen

N_PAGES = 240
SEED = 42


def flagship_program(seeds: list[str]):
    """Seeds → follow title links 2 hops → extract (url, page text)."""
    extract_leaf = Extract(Fmt("{}\t{}", [UrlE(), First(XpathTextE("//title"))]))
    return Go(
        Lit(seeds),
        ExtractList(XpathTextE("//p")),
        Go(XpathE("//td[@class='title']/a/@href/text()"),
           Go(XpathE("//td[@class='title']/a/@href/text()"), extract_leaf)),
    )


def pagination_program(seed_url: str):
    """label/recur loop following 'More' links (hn-crawl.rkt search-hn)."""
    page_scan = ForWeb(
        [("link", XpathE("//td[@class='title']/a"))],
        Go(XpathE("/a/@href/text()", Var("link")),
           Extract(Fmt("{}: {}", [First(XpathE("/a/text()", Var("link"))), UrlE()]))),
    )
    return Go(
        seed_url,
        LetWeb([("n", Lit(0))],
               Label("pg",
                     page_scan,
                     Go(IfE(Cmp("<", Var("n"), Lit(2)),
                            XpathE("//td[@class='title']/a[text() = 'More']/@href/text()"),
                            Lit([])),
                        LetWeb([("n", Add(Var("n"), Lit(1)))], Recur("pg"))))),
    )


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (r["url"], r["warc_ts"], r["html"], r["text"], r["lang"])
        for r in webgen.corpus(N_PAGES, SEED)
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    pages_dict = webgen.corpus_pages_dict(N_PAGES, SEED)
    return df, pages_dict


def run_both(spark, corpus, program, tmp_path, **engine_kw):
    pages_df, pages_dict = corpus
    oracle = spider(program, SnapshotFetcher(pages_dict))
    eng = CrawlEngine(spark, pages_df, str(tmp_path / "work"), **engine_kw)
    summary = eng.run(program, max_rounds=50)
    return oracle, eng, summary


def assert_parity(oracle, eng):
    # 1. extraction stream: path-key order, byte-identical values
    got = [
        (r["path_key"], r["value"])
        for r in eng.results_df().select("path_key", "value").collect()
    ]
    want = [
        (path_key_hex(f.path), json.dumps(f.value, sort_keys=True,
                                          separators=(",", ":"), ensure_ascii=False))
        for f in oracle.flies
    ]
    assert got == want
    # 2. URL-seen set
    got_seen = {r["url_canon"] for r in eng.seen_df().select("url_canon").collect()}
    assert got_seen == oracle.seen
    # 3. first-visit order
    got_visits = [r["url_canon"] for r in eng.visit_order_df().collect()]
    assert got_visits == oracle.visits


def test_flagship_parity(spark, corpus, tmp_path):
    seeds = webgen.seeds_for(N_PAGES, SEED)
    oracle, eng, summary = run_both(
        spark, corpus, flagship_program(seeds), tmp_path, politeness_k=None
    )
    assert summary.fetched > 20
    assert summary.results > 20
    assert_parity(oracle, eng)


def test_politeness_budget_invariance(spark, corpus, tmp_path):
    """Budgeted dequeue defers fetches across rounds but cannot change the
    extraction stream, seen set, or visit order (path_key is schedule-free)."""
    seeds = webgen.seeds_for(N_PAGES, SEED)
    oracle, eng, summary = run_both(
        spark, corpus, flagship_program(seeds), tmp_path,
        politeness_k=3, use_bloom=True,
    )
    assert summary.rounds > 3  # budget actually forced extra rounds
    assert_parity(oracle, eng)


def test_label_recur_parity(spark, corpus, tmp_path):
    _, pages_dict = corpus
    seed_url = webgen.page_url(0, N_PAGES, SEED)
    oracle, eng, _ = run_both(
        spark, corpus, pagination_program(seed_url), tmp_path, politeness_k=None
    )
    assert len(oracle.flies) > 0
    assert_parity(oracle, eng)


def test_resume_from_checkpoint(spark, corpus, tmp_path):
    """Kill the crawl after 2 rounds; resume must finish with identical output."""
    pages_df, pages_dict = corpus
    seeds = webgen.seeds_for(N_PAGES, SEED)
    program = flagship_program(seeds)
    oracle = spider(program, SnapshotFetcher(pages_dict))

    eng1 = CrawlEngine(spark, pages_df, str(tmp_path / "work"), politeness_k=4)
    eng1.run(program, max_rounds=2)  # partial crawl
    eng2 = CrawlEngine(spark, pages_df, str(tmp_path / "work"), politeness_k=4)
    eng2.run(program, max_rounds=50, resume=True)
    assert_parity(oracle, eng2)
