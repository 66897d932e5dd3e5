"""Header-codec golden tests lifted from
/root/reference/hypertext-browser/http/head.rkt:107-122."""

from boris_spark.kernel.headers import (
    alist_to_headers,
    headers_location,
    headers_set,
    headers_set_cookies,
    headers_to_alist,
)

HEAD = [
    b"Set-Cookie: foo=fee; path=/bar ; domain = baz.com",
    b"Location: http://bar.com",
    b"Set-Cookie: baz=bax",
]


def test_headers_to_alist():
    assert headers_to_alist(HEAD) == [
        ("Set-Cookie", "foo=fee; path=/bar ; domain = baz.com"),
        ("Location", "http://bar.com"),
        ("Set-Cookie", "baz=bax"),
    ]


def test_roundtrip():
    assert alist_to_headers(headers_to_alist(HEAD)) == HEAD


def test_location():
    assert headers_location(headers_to_alist(HEAD)) == "http://bar.com"


def test_headers_set_replaces_all():
    assert headers_set(headers_to_alist(HEAD), "Set-Cookie", "fu=chu") == [
        ("Set-Cookie", "fu=chu"),
        ("Location", "http://bar.com"),
    ]


def test_headers_set_cookies():
    got = headers_set_cookies(
        headers_to_alist(HEAD),
        "http://fiz.com",
        [("foo", "fyy", "baz.com", "/bar")],
    )
    assert got == [
        ("foo", "fee", "baz.com", "/bar"),
        ("baz", "bax", "fiz.com", "/"),
    ]
