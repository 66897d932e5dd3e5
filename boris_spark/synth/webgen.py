"""Deterministic synthetic Common-Crawl-style page corpus.

Produces pages in the BASELINE.json ``input_hint`` schema
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``:

- host sizes follow a Zipf-ish skew so the hottest host dominates —
  exercising the engine's salted politeness dequeue and AQE skew handling;
- links are intra-host chains/trees, cross-host edges, and per-host "More"
  pagination chains (exercising label/recur loops);
- the ``text`` column is ``kernel.page_text(html)`` by construction, so the
  table itself encodes the byte-identity invariant;
- everything is a pure function of (seed, n_pages): no wall clock, no RNG
  state leakage — the same corpus is regenerated identically anywhere,
  including inside DuckDB SQL oracles (the link formula is closed-form
  arithmetic on page ids).

Two generators:

- :func:`corpus` — standalone synthetic corpus of ``n_pages``.
- :func:`pages_from_documents` — derives a page per row of the driver's
  ``documents`` testdata table (deterministic in doc_id), used by the
  DuckDB-verifiable crawl queries in ``__spark_entry__.py``; the link graph
  is closed-form over doc_id so a recursive SQL CTE can reproduce the
  engine's reachable set exactly.
"""

from __future__ import annotations

import datetime as dt
import os

from ..kernel import htmlkit, xxh64_str

# -------------------------------------------------------- standalone corpus

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor "
    "whiskey xray yankee zulu amber basalt cobalt dune ember flint garnet"
).split()

_LANGS = ("en", "de", "fr", "es", "it")

EPOCH = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)


def n_hosts(n_pages: int) -> int:
    return max(4, int(n_pages ** 0.5) // 2)


from bisect import bisect_right
from functools import lru_cache


def _dist() -> str:
    """Host-size distribution: 'zipf' (default — host 0 owns half of all
    pages) or 'uniform' (equal host sizes). The uniform mode exists for the
    scaling bench's CONTROL tier: same binding politeness budget and round
    count as the skew tier, but no mega-host, so the skew-vs-control
    efficiency ratio isolates the cost of skew handling from round-count
    amortization. Env-keyed because the bench runs each tier in its own
    subprocess with BORIS_HOST_DIST set."""
    return os.environ.get("BORIS_HOST_DIST", "zipf")


@lru_cache(maxsize=32)
def _host_bounds_for(n_pages: int, dist: str) -> list[int]:
    """Start offset of each host's contiguous id range. zipf: host 0 owns
    the first half of all pages, host 1 half of the rest, ...; uniform:
    equal-size ranges."""
    H = n_hosts(n_pages)
    if dist == "uniform":
        per = max(1, n_pages // H)
        return [lo for lo in range(0, n_pages, per)][:H]
    bounds, lo, size = [0], 0, n_pages
    for _ in range(H - 1):
        half = max(1, size // 2)
        lo += half
        size -= half
        if lo >= n_pages:
            break
        bounds.append(lo)
    return bounds


def _host_bounds(n_pages: int) -> list[int]:
    return _host_bounds_for(n_pages, _dist())


def _host_of_page(page: int, n_pages: int, seed: int) -> tuple[str, int, int]:
    bounds = _host_bounds(n_pages)
    h = bisect_right(bounds, page) - 1
    lo = bounds[h]
    return (f"h{h}.site{seed}.test", page - lo, lo)


def page_url(page: int, n_pages: int, seed: int) -> str:
    host, local, _ = _host_of_page(page, n_pages, seed)
    return f"http://{host}/p/{local}"


def out_links(page: int, n_pages: int, seed: int) -> list[str]:
    """Deterministic closed-form link targets for *page* (absolute ids)."""
    targets = []
    for k in (1, 2, 3):
        t = (page * 3 + k + seed) % n_pages
        if t != page:
            targets.append(t)
    # skew feeder: every page links to a page on host 0 (the hot host)
    hot = (page * 7 + seed) % max(1, n_pages // 2)
    if hot != page:
        targets.append(hot)
    return [page_url(t, n_pages, seed) for t in dict.fromkeys(targets)]


PAGE_WEIGHT = 1  # paragraphs-per-page multiplier; bench raises it for
# realistically-sized (multi-KB) Common-Crawl-like documents


def page_html(page: int, n_pages: int, seed: int, weight: int | None = None) -> str:
    host, local, _ = _host_of_page(page, n_pages, seed)
    r = xxh64_str(f"{seed}:{page}") & 0x7FFFFFFF
    weight = PAGE_WEIGHT if weight is None else weight
    n_paras = 2 * weight
    words_per = (8 + r % 24) // 2 * max(1, weight // 2) + 4
    paras = []
    for pi in range(n_paras):
        rw = (r + pi * 7919) & 0x7FFFFFFF
        paras.append(" ".join(
            _WORDS[(rw + i * 31) % len(_WORDS)] for i in range(words_per)
        ))
    body = "".join(f"<p>{p}</p>" for p in paras)
    anchors = "".join(
        f"<td class='title'><a href='{u}'>link {i}</a></td>"
        for i, u in enumerate(out_links(page, n_pages, seed))
    )
    more = ""
    if local + 1 < 8 and page + 1 < n_pages:  # short pagination chains
        more = f"<td class='title'><a href='/p/{local + 1}'>More</a></td>"
    return (
        f"<html><head><title>page {page} on {host}</title></head><body>"
        f"{body}{anchors}{more}</body></html>"
    )


def page_lang(page: int, seed: int) -> str:
    return _LANGS[(xxh64_str(f"lang:{seed}:{page}")) % len(_LANGS)]


def page_row(page: int, n_pages: int, seed: int, weight: int | None = None) -> dict:
    html = page_html(page, n_pages, seed, weight)
    return {
        "url": page_url(page, n_pages, seed),
        "warc_ts": EPOCH + dt.timedelta(seconds=page % 86400),
        "html": html.encode("utf-8"),
        "text": htmlkit.page_text(html),
        "lang": page_lang(page, seed),
    }


def corpus(n_pages: int, seed: int = 42, weight: int | None = None):
    """Yield page rows (dicts in the input_hint schema)."""
    for p in range(n_pages):
        yield page_row(p, n_pages, seed, weight)


def seeds_for(n_pages: int, seed: int, n_seeds: int = 4) -> list[str]:
    return [page_url(i * max(1, n_pages // (n_seeds + 1)), n_pages, seed) for i in range(n_seeds)]


def corpus_pages_dict(n_pages: int, seed: int = 42, weight: int | None = None) -> dict[str, str]:
    """Snapshot dict {canonical_url: html} for the oracle fetcher."""
    return {
        page_url(p, n_pages, seed): page_html(p, n_pages, seed, weight)
        for p in range(n_pages)
    }


# --------------------------------------------- pages from documents testdata

# Link formula over doc ids: binary-heap tree children {2d+1, 2d+2} ∩ [0,N).
# A tree (single path to every node) keeps the reference's cache-oblivious
# traversal finite (Boris re-expands revisited URLs — interpreter.rkt:54-59
# has no seen-check, only a fetch cache — so cyclic graphs never terminate),
# and the closed form lets a DuckDB recursive CTE reproduce the engine's
# reachable set exactly.

DOC_HOSTS = 7


def doc_url(doc_id: int) -> str:
    return f"http://h{doc_id % DOC_HOSTS}.docs.test/d/{doc_id}"


def doc_children(doc_id: int, n_docs: int) -> list[int]:
    return [t for t in (2 * doc_id + 1, 2 * doc_id + 2) if t < n_docs]


def doc_html(doc_id: int, n_docs: int, text: str) -> str:
    anchors = "".join(
        f"<td class='title'><a href='{doc_url(t)}'>doc {t}</a></td>"
        for t in doc_children(doc_id, n_docs)
    )
    # text goes into a single <p> so kernel.page_text(html) == text exactly
    return (
        f"<html><head><title>doc {doc_id}</title></head><body>"
        f"<p>{text}</p>{anchors}</body></html>"
    )


# ------------------------------------------------ closed-form batch fetcher

import re as _re


def page_of_url(url: str, n_pages: int, seed: int) -> int | None:
    """Inverse of :func:`page_url` (None if the url is not a corpus page)."""
    m = _re.match(rf"http://h(\d+)\.site{seed}\.test/p/(\d+)$", url)
    if not m:
        return None
    h, local = int(m.group(1)), int(m.group(2))
    bounds = _host_bounds(n_pages)
    if h >= len(bounds):
        return None
    lo = bounds[h]
    hi = bounds[h + 1] if h + 1 < len(bounds) else n_pages
    p = lo + local
    return p if p < hi else None


def make_fetcher(n_pages: int, seed: int = 42, weight: int | None = None):
    """Batch fetch_fn for the engine's callable mode: the deterministic
    stand-in for a live HTTP fetcher (pages are a pure function of the url,
    so the 'network' is closed-form — same corpus as :func:`corpus`)."""

    def fetch(urls: list[str]) -> list[tuple[str | None, int]]:
        out: list[tuple[str | None, int]] = []
        for u in urls:
            p = page_of_url(u, n_pages, seed)
            if p is None:
                out.append((None, 404))
            else:
                out.append((page_html(p, n_pages, seed, weight), 200))
        return out

    return fetch
