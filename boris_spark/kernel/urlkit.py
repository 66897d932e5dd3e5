"""URL parsing / canonicalization kernel.

Replicates the reference's canonical cache-key function ``url->string/raw``
(/root/reference/hypertext-browser/url.rkt:37-55) including its quirks:

- result is ``scheme "://" host path query fragment`` — **port and userinfo
  are dropped** (url.rkt:38 uses only scheme + host), so distinct origins can
  collide in the seen set; parity requires reproducing this faithfully;
- empty path renders as ``"/"`` (url.rkt:47-50; golden test url.rkt:61);
- query parameters are percent-DECODED and re-rendered raw, and are joined
  with **no separator** (url.rkt:44 ``(string-append* "?" ...)`` appends the
  k=v strings directly), another faithful quirk;
- a ``?`` with an empty query list renders as nothing (url.rkt:44 checks
  ``empty?`` of the parsed alist);
- ``;params`` inside path segments are dropped (net/url path/param-path);
- input is whitespace-trimmed (url.rkt:34-35 note: "string->url should trim
  whitespace").

Relative resolution mirrors ``combine-url/relative`` usage at
/root/reference/hypertext-browser/main.rkt:31-36 (scheme-less URLs resolve
against the current page then re-canonicalize): we resolve RFC-3986 style via
``urllib.parse.urljoin`` and re-canonicalize, and both the oracle interpreter
and the Spark UDFs share this single implementation, so seen-set parity holds
by construction.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from urllib.parse import unquote, unquote_plus, urljoin

from .hashing import xxh64_str

_URL_RE = re.compile(
    r"^(?:([^:/?#]+):)?(?://([^/?#]*))?([^?#]*)(?:\?([^#]*))?(?:#(.*))?$",
    re.S,
)


@dataclass
class Url:
    scheme: str | None = None
    host: str | None = None
    port: str | None = None
    userinfo: str | None = None
    path_segments: list[str] = field(default_factory=list)
    path_absolute: bool = False
    query: list[tuple[str, str | None]] | None = None  # None = no '?' present
    fragment: str | None = None


def parse_url(s: str) -> Url:
    s = s.strip()
    m = _URL_RE.match(s)
    assert m is not None  # the regex matches any string
    scheme, authority, path, query, fragment = m.groups()
    u = Url()
    if scheme is not None:
        u.scheme = scheme.lower()
    if authority is not None:
        rest = authority
        if "@" in rest:
            u.userinfo, rest = rest.split("@", 1)
        if ":" in rest:
            rest, u.port = rest.rsplit(":", 1)
        u.host = rest.lower()
    if path:
        u.path_absolute = path.startswith("/")
        raw = path[1:] if u.path_absolute else path
        # net/url: each segment is split on ';' (params dropped) then decoded
        u.path_segments = [unquote(seg.split(";", 1)[0]) for seg in raw.split("/")]
    if query is not None:
        pairs: list[tuple[str, str | None]] = []
        for part in re.split(r"[&;]", query):
            if part == "":
                continue
            if "=" in part:
                k, v = part.split("=", 1)
                pairs.append((unquote_plus(k), unquote_plus(v)))
            else:
                pairs.append((unquote_plus(part), None))
        u.query = pairs
    if fragment is not None:
        u.fragment = unquote(fragment)
    return u


def path_string(u: Url) -> str:
    """``url-path/string`` (url.rkt:47-50): "/" + segments joined by "/"."""
    return "/" + "/".join(u.path_segments)


def path_query_fragment(u: Url) -> str:
    """``url->path&query&fragment`` (url.rkt:41-45)."""
    out = path_string(u)
    if u.query:  # empty list or None → no '?' (url.rkt:44)
        # faithful quirk: k=v pairs appended with NO separator (url.rkt:44)
        out += "?" + "".join(f"{k}={v if v is not None else ''}" for k, v in u.query)
    if u.fragment is not None:
        out += "#" + u.fragment
    return out


def canonicalize(url: str) -> str:
    """``url->string/raw`` (url.rkt:37-38): scheme://host + path?query#fragment.

    Port and userinfo are dropped — faithful to the reference.
    """
    u = parse_url(url)
    return f"{u.scheme or ''}://{u.host or ''}{path_query_fragment(u)}"


def host_of(url: str) -> str:
    """Politeness key: lowercased host."""
    return parse_url(url).host or ""


def has_scheme(url: str) -> bool:
    return parse_url(url.strip()).scheme is not None


def resolve(base_url: str | None, url: str) -> str:
    """Resolve *url* against *base_url* if scheme-less, then canonicalize.

    Mirrors hypertext/get (/root/reference/hypertext-browser/main.rkt:31-36).
    """
    url = url.strip()
    if has_scheme(url) or not base_url:
        return canonicalize(url)
    return canonicalize(urljoin(base_url, url))


def full_url(u: Url) -> str:
    """Full request URL (userinfo/port preserved) — what the fetch stage
    actually requests. The reference keeps the resolved request-url intact
    and only drops port/userinfo in the CACHE key (url.rkt:37-38); the engine
    mirrors that by carrying (url_full, url_canon) per request."""
    auth = ""
    if u.userinfo:
        auth = u.userinfo + "@"
    port = f":{u.port}" if u.port else ""
    return f"{u.scheme or ''}://{auth}{u.host or ''}{port}{path_query_fragment(u)}"


def resolve2(base_url: str | None, url: str) -> tuple[str, str]:
    """(canonical cache key, full request url) of *url* resolved against
    *base_url*."""
    url = url.strip()
    if not has_scheme(url) and base_url:
        url = urljoin(base_url, url)
    u = parse_url(url)
    return (
        f"{u.scheme or ''}://{u.host or ''}{path_query_fragment(u)}",
        full_url(u),
    )


def url_hash(canonical_url: str) -> int:
    """Signed 64-bit seen-set key — equals Spark ``F.xxhash64(url_canon)``."""
    return xxh64_str(canonical_url)


def host_bucket(host: str, n_buckets: int) -> int:
    """Frontier partition bucket — equals ``F.pmod(F.xxhash64(host), B)``."""
    return xxh64_str(host) % n_buckets
