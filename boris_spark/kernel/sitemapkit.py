"""Sitemaps-protocol (sitemaps.org 0.9) parser — pure Python, no Spark.

A web-scale crawl seeds its frontier from sitemaps long before link
discovery pays off (Common Crawl seeds from them; the sitemaps protocol is
how hosts advertise their URL inventory). The reference's spider has no
sitemap support (its seeds are program literals, boris/main.rkt), so the
semantics here follow the public protocol:

- two document kinds: ``urlset`` (leaf sitemap: ``<url>`` entries with
  ``loc`` required and ``lastmod``/``changefreq``/``priority`` optional)
  and ``sitemapindex`` (``<sitemap>`` entries pointing at child sitemaps);
- ``loc`` values are whitespace-trimmed and XML-entity-escaped in the file
  (``&amp;`` etc.) — ElementTree decodes them; the regex fallback decodes
  the five XML entities itself;
- parsers MUST be lenient about real-web XML: on an XML syntax error we
  fall back to a regex scan for ``<url>``/``<sitemap>`` blocks instead of
  dropping the document (a host's whole URL inventory) on the floor;
- per the protocol, a sitemap may list at most 50k URLs / 50 MB — callers
  enforce truncation policy; the parser just reports what it sees.

Like the other kernel modules this is deliberately dependency-free and
deterministic so it can run inside Arrow batches on executors.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from typing import NamedTuple

VALID_CHANGEFREQ = {
    "always", "hourly", "daily", "weekly", "monthly", "yearly", "never",
}

_ENTITIES = [
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
    ("&apos;", "'"), ("&amp;", "&"),  # amp last: "&amp;lt;" -> "&lt;"
]


class SitemapEntry(NamedTuple):
    kind: str           # 'urlset' | 'sitemapindex'
    loc: str
    lastmod: str | None
    changefreq: str | None
    priority: float | None


def _decode_entities(s: str) -> str:
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    return s


def _localname(tag: str) -> str:
    # namespace-agnostic: '{http://www.sitemaps.org/...}loc' -> 'loc'
    return tag.rsplit("}", 1)[-1].lower()


def _entry_from_fields(kind: str, fields: dict) -> SitemapEntry | None:
    loc = (fields.get("loc") or "").strip()
    if not loc:
        return None  # loc is required; a loc-less entry carries nothing
    lastmod = fields.get("lastmod")
    lastmod = lastmod.strip() if lastmod and lastmod.strip() else None
    cf = fields.get("changefreq")
    cf = cf.strip().lower() if cf and cf.strip() else None
    if cf is not None and cf not in VALID_CHANGEFREQ:
        cf = None  # out-of-vocabulary value: drop the field, keep the URL
    prio = None
    if kind == "urlset":
        p = (fields.get("priority") or "").strip()
        if p:
            try:
                prio = float(p)
            except ValueError:
                prio = None
    return SitemapEntry(kind, loc, lastmod, cf if kind == "urlset" else None, prio)


def parse_sitemap(xml: str) -> list[SitemapEntry]:
    """Parse one sitemap document (leaf or index) into entries.

    Returns ``[]`` for documents that are neither (e.g. an HTML error page
    served at /sitemap.xml). XML-broken documents go through the regex
    fallback rather than erroring — kernel code runs inside executor
    batches where one bad page must not kill the task.
    """
    try:
        root = ET.fromstring(xml)
    except ET.ParseError:
        return _parse_sitemap_regex(xml)
    rootname = _localname(root.tag)
    if rootname not in ("urlset", "sitemapindex"):
        return []
    child_tag = "url" if rootname == "urlset" else "sitemap"
    out: list[SitemapEntry] = []
    for child in root:
        if _localname(child.tag) != child_tag:
            continue
        fields = {
            _localname(f.tag): (f.text or "")
            for f in child
        }
        e = _entry_from_fields(rootname, fields)
        if e is not None:
            out.append(e)
    return out


_BLOCK_RE = re.compile(r"<(url|sitemap)[\s>](.*?)</\1>", re.S | re.I)
_FIELD_RE = re.compile(
    r"<(loc|lastmod|changefreq|priority)\s*>(.*?)</\1>", re.S | re.I
)
_ROOT_RE = re.compile(r"<\s*(urlset|sitemapindex)[\s>]", re.I)


def _parse_sitemap_regex(xml: str) -> list[SitemapEntry]:
    """Lenient fallback for XML-broken sitemaps: scan for entry blocks."""
    m = _ROOT_RE.search(xml)
    if not m:
        return []
    rootname = m.group(1).lower()
    child_tag = "url" if rootname == "urlset" else "sitemap"
    out: list[SitemapEntry] = []
    for bm in _BLOCK_RE.finditer(xml):
        if bm.group(1).lower() != child_tag:
            continue
        fields = {
            fm.group(1).lower(): _decode_entities(fm.group(2))
            for fm in _FIELD_RE.finditer(bm.group(2))
        }
        e = _entry_from_fields(rootname, fields)
        if e is not None:
            out.append(e)
    return out


_SITEMAP_DIRECTIVE_RE = re.compile(r"^\s*sitemap\s*:\s*(\S+)", re.I)


def sitemap_urls_from_robots(text: str) -> list[str]:
    """``Sitemap:`` directives from a robots.txt body — per the sitemaps
    protocol these are host-wide (independent of any User-agent group), so
    this scans every line rather than the group structure robots.py
    builds. Order preserved, duplicates dropped."""
    out: list[str] = []
    seen: set[str] = set()
    for raw in text.splitlines():
        line = raw.split("#", 1)[0]
        m = _SITEMAP_DIRECTIVE_RE.match(line)
        if m and m.group(1) not in seen:
            seen.add(m.group(1))
            out.append(m.group(1))
    return out
