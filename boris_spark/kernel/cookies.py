"""Cookie-jar kernel — RFC 6265 §5.2 subset, replicating
/root/reference/hypertext-browser/http/cookies.rkt exactly (including its
quirks), for the live-HTTP fetch path. Cookies are plain tuples
``(name, value, domain, path)`` so they round-trip through Arrow columns.

Out of the minimum parity slice (a static-snapshot crawl never sees
Set-Cookie — SURVEY.md §2e op 36) but part of the complete operator surface.
"""

from __future__ import annotations

import re

from .urlkit import Url, parse_url, path_string

Cookie = tuple[str, str, str, str]  # (name, value, domain, path)


def domain_match(host: str, domain: str) -> bool:
    """cookies.rkt:85-91: exact, or host = <label>.domain."""
    host = host.lower()
    if host == domain:
        return True
    if host.endswith(domain):
        rest = host[: -len(domain)]
        return bool(rest) and rest[-1] == "."
    return False


def path_match(request_path: str, cookie_path: str) -> bool:
    """cookies.rkt:94-99: exact, or prefix with '/' boundary."""
    if request_path == cookie_path:
        return True
    if request_path.startswith(cookie_path):
        if cookie_path and cookie_path[-1] == "/":
            return True
        rest = request_path[len(cookie_path):]
        return bool(rest) and rest[0] == "/"
    return False


def cookies_ref(cookies: list[Cookie], name_or_url: str | Url) -> list[Cookie]:
    """cookies.rkt:71-82: filter by name, or by url host+path match."""
    if isinstance(name_or_url, str) and "://" not in name_or_url:
        return [c for c in cookies if c[0] == name_or_url]
    u = parse_url(name_or_url) if isinstance(name_or_url, str) else name_or_url
    req_path = path_string(u)
    return [
        c for c in cookies
        if domain_match(u.host or "", c[2]) and path_match(req_path, c[3])
    ]


def _cookie_eq_key(c: Cookie) -> tuple[str, str, str]:
    return (c[0], c[2], c[3])  # name, domain, path (cookies.rkt:63-67)


def cookies_set(jar: list[Cookie], cookie: Cookie) -> list[Cookie]:
    """cookies.rkt:104-109: insert, overwrite same (name,domain,path), keep
    stable longest-path-first order."""
    merged = [cookie] + jar
    seen: set = set()
    dedup: list[Cookie] = []
    for c in merged:
        k = _cookie_eq_key(c)
        if k not in seen:
            seen.add(k)
            dedup.append(c)
    return sorted(dedup, key=lambda c: -len(c[3]))  # stable (python sort)


def cookies_set_star(jar: list[Cookie], cookies: list[Cookie]) -> list[Cookie]:
    """cookies.rkt:111-114: foldl insertion."""
    for c in cookies:
        jar = cookies_set(jar, c)
    return jar


def cookies_to_header(cookies: list[Cookie]) -> str:
    """cookies.rkt:118-124: 'name=value; ...'."""
    return "; ".join(f"{c[0]}={c[1]}" for c in cookies)


# --- jar ↔ JSON column codec (the engine's per-branch cookie state rides
# the frontier as a string column; tuples survive the round trip)

import json as _json


def jar_to_json(jar: list[Cookie]) -> str | None:
    return _json.dumps([list(c) for c in jar]) if jar else None


def jar_from_json(s: str | None) -> list[Cookie]:
    if not s or not isinstance(s, str):
        return []
    return [tuple(c) for c in _json.loads(s)]


def jar_fold_head(jar: list[Cookie], head, url: str | None) -> list[Cookie]:
    """Fold a response head's Set-Cookie fields into *jar* (the browser's
    per-navigation cookie fold, hypertext-browser/base.rkt:78-94 via
    head.rkt:87-92). *head* is (status line, [[name, value], ...]) or None
    (file-style fetch — no cookies)."""
    if head is None or url is None:
        return jar
    from .headers import headers_set_cookies

    _, pairs = head
    return headers_set_cookies([(k, v) for k, v in pairs], url, jar)


_PAIR_RE = re.compile(r"([^=;]*)(?:=([^;]*))?(?:;(.*))?", re.S)


def _parse_pairs(s: str) -> list[tuple[str, str | None]]:
    m = _PAIR_RE.match(s)
    assert m is not None
    name, value, rest = m.groups()
    out = [(name, value)]
    if rest is not None:
        out.extend(_parse_pairs(rest))
    return out


def set_cookie_to_cookie(set_cookie: str, request_url: str | Url) -> Cookie | None:
    """cookies.rkt:126-157 (RFC 6265 §5.2 subset): parse a Set-Cookie header,
    filling default Domain/Path from *request_url*. Quirks preserved: the
    LAST duplicate attribute wins (normalize reverses, cookies.rkt:160-165);
    returns None when the first pair has no '=' or an empty name."""
    pairs = _parse_pairs(set_cookie)
    name, value = pairs[0]
    if value is None:  # no '=' in the first pair (cookies.rkt:139)
        return None
    if name.strip() == "":  # no name (cookies.rkt:140)
        return None
    attrs = [( (k or "").strip().lower(), (v or "").strip() ) for k, v in pairs[1:]]
    attrs.reverse()  # last occurrence wins via first-match lookup
    def attr(key):
        for k, v in attrs:
            if k == key:
                return v
        return None

    u = parse_url(request_url) if isinstance(request_url, str) else request_url
    domain = attr("domain")
    if domain is None:
        domain = u.host or ""
    domain = domain.lower().strip(".")
    path = attr("path")
    if path is None:
        path = path_string(u)
    return (name.strip(), value.strip(), domain, path)
