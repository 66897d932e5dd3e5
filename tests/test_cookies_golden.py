"""Cookie-kernel golden tests lifted from
/root/reference/hypertext-browser/http/cookies.rkt:169-238, including the
hand-rolled Set-Cookie fuzz loop (cartesian product of header fragments)."""

import itertools
import re

from boris_spark.kernel.cookies import (
    cookies_ref,
    cookies_set,
    cookies_set_star,
    cookies_to_header,
    domain_match,
    path_match,
    set_cookie_to_cookie,
)

C1 = ("foo", "bar", "foo.com", "/")
C2 = ("baz", "bez", "fii.foo.com", "/foo/bar/")
C3 = ("baz", "biz", "fii.foo.com", "/foo/bar/")


def test_domain_match():
    assert domain_match("foo.com", "foo.com")
    assert domain_match("bar.foo.com", "foo.com")
    assert not domain_match("foo.com", ".foo.com")


def test_path_match():
    assert path_match("/foo", "/foo")
    assert path_match("/foo/bar", "/foo/")
    assert path_match("/foo/bar/", "/foo/bar")
    assert not path_match("/foo", "/bar")
    assert not path_match("/foobar", "/foo")
    assert not path_match("/foobar", "/foo/")
    assert not path_match("/", "/foo/bar")


def test_cookies_ref():
    assert cookies_ref([C1, C2, C3], "baz") == [C2, C3]
    assert cookies_ref([C1, C2, C3], "http://fii.foo.com") == [C1]
    assert cookies_ref([C1, C2, C3], "http://fyy.foo.com/foo/bar/") == [C1]
    assert cookies_ref([C1, C2, C3], "http://fii.foo.com/foo/bar/") == [C1, C2, C3]


def test_cookies_set():
    assert cookies_set(cookies_set(cookies_set([C1], C1), C2), C3) == [C3, C1]
    assert cookies_set_star([C1], [C2, C1]) == [C2, C1]


def test_cookies_to_header():
    assert cookies_to_header([C1, C2]) == "foo=bar; baz=bez"


def test_set_cookie_fuzz():
    # cookies.rkt:211-237 — cartesian fuzz of Set-Cookie fragments
    for name, value, path, domain in itertools.product(
        ["", "name", "  name  "],
        ["", "=value", "==value", "=  value  "],
        ["", ";", "; path = / "],
        ["", ";", "; domain = Foo.com "],
    ):
        s = name + value + path + domain
        c = set_cookie_to_cookie(s, "http://fuzz.com/buzz")
        if c is None:
            assert ("=" not in name and "=" not in value) or name == "", s
            continue
        assert c[0] == name.strip(), s
        assert c[1] == re.sub("=", "", value, count=1).strip(), s
        assert c[3] == ("/" if len(path) > 2 else "/buzz"), s
        assert c[2] == ("foo.com" if len(domain) > 2 else "fuzz.com"), s


def test_set_cookie_last_domain_wins():
    # cookies.rkt:238
    c = set_cookie_to_cookie("name=value; domain=bar; domain=foo;", "")
    assert c is not None and c[2] == "foo"
