"""WARC codec + distributed source: roundtrip, gzip members, truncation,
non-response records filtered."""

import datetime as dt
import gzip

from boris_spark.kernel.warc import (
    build_response_record, build_warc, warc_records,
)

D0 = dt.datetime(2024, 1, 1)


def _recs(n=5):
    return [
        (f"http://w.test/p/{i}", D0 + dt.timedelta(seconds=i),
         f"<html><body><p>page {i}</p></body></html>".encode())
        for i in range(n)
    ]


def test_roundtrip_plain():
    got = list(warc_records(build_warc(_recs())))
    assert [r.uri for r in got] == [u for u, _, _ in _recs()]
    assert all(r.http_status == 200 for r in got)
    assert got[3].body == _recs()[3][2]
    assert got[2].date.replace(tzinfo=None) == D0 + dt.timedelta(seconds=2)


def test_roundtrip_gzip_members():
    data = build_warc(_recs(), compress=True)
    assert data[:2] == b"\x1f\x8b"
    got = list(warc_records(data))
    assert len(got) == 5 and got[4].body == _recs()[4][2]


def test_whole_file_gzip():
    data = gzip.compress(build_warc(_recs()), mtime=0)
    assert len(list(warc_records(data))) == 5


def test_truncated_tail_drops_last_record_only():
    data = build_warc(_recs())
    got = list(warc_records(data[: len(data) - 30]))
    assert len(got) == 4  # tail record lost, no exception


def test_non_response_records_skipped_by_source(spark, tmp_path):
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\nabcd\r\n\r\n"
    )
    body = build_response_record("http://w.test/p/0", D0, b"<p>x</p>")
    (tmp_path / "a.warc").write_bytes(info + body)
    from boris_spark.sources import read_warc

    rows = read_warc(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    assert rows[0]["url"] == "http://w.test/p/0"
    assert rows[0]["text"] == "x"


def test_robots_rules_from_pages(spark):
    """Distributed robots.txt → rules table; split_blocked consumes it."""
    from boris_spark.engine.robots import robots_rules_from_pages

    df = spark.createDataFrame(
        [
            ("a.test", "User-agent: *\nDisallow: /x/\nDisallow: /y"),
            ("b.test", "User-agent: boris\nDisallow: /only-boris\n"
                       "User-agent: *\nDisallow: /star"),
            ("c.test", "User-agent: *\nDisallow:"),
        ],
        "host string, body string",
    )
    rules = {
        (r["host"], r["rule_type"], r["path"])
        for r in robots_rules_from_pages(spark, df, agent="boris").collect()
    }
    assert rules == {
        ("a.test", "disallow", "/x/"), ("a.test", "disallow", "/y"),
        ("b.test", "disallow", "/only-boris"),
    }


def test_warc_roundtrip_fuzz():
    """Property: build→parse is the identity on (uri, body) for arbitrary
    binary bodies, plain and gzip'd."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=50, deadline=None)
    @given(
        st.lists(st.binary(min_size=0, max_size=300), min_size=1, max_size=6),
        st.booleans(),
    )
    def check(bodies, compress):
        recs = [
            (f"http://f.test/p/{i}", D0 + dt.timedelta(seconds=i), b)
            for i, b in enumerate(bodies)
        ]
        got = list(warc_records(build_warc(recs, compress=compress)))
        assert [(r.uri, r.body) for r in got] == [
            (u, b) for u, _, b in recs
        ]

    check()


def test_cookie_jar_json_roundtrip_fuzz():
    """Property: jar → JSON column → jar is the identity (tuples restored)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from boris_spark.kernel.cookies import jar_from_json, jar_to_json

    token = st.text(
        alphabet=st.characters(blacklist_characters=";,=\x00", min_codepoint=33,
                               max_codepoint=126),
        min_size=1, max_size=12,
    )

    @settings(max_examples=100, deadline=None)
    @given(st.lists(st.tuples(token, token, token, token), max_size=8))
    def check(jar):
        assert jar_from_json(jar_to_json(jar)) == jar

    check()


def test_warc_sink_roundtrip(spark, tmp_path):
    """write_warc → read_warc is the identity on (url, warc_ts, html) —
    the crawl's archive-export path."""
    from boris_spark.sources import read_warc, write_warc

    rows = [
        (f"http://s.test/p/{i}", D0 + dt.timedelta(seconds=i),
         f"<html><body><p>sink {i}</p></body></html>".encode())
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, html binary")
    out = str(tmp_path / "warcs")
    n_files = write_warc(df.repartition(4), out)
    assert 1 <= n_files <= 4
    back = {
        (r["url"], r["warc_ts"], bytes(r["html"]))
        for r in read_warc(spark, out).collect()
    }
    assert back == set(rows)


def test_wet_sink_roundtrip(spark, tmp_path):
    """write_wet → read_wet is the identity on (url, warc_ts, text) —
    incl. unicode text and the empty string; WET files ignore any
    non-conversion record mixed into the directory read."""
    from boris_spark.sources import read_wet, write_wet

    rows = [
        (f"http://s.test/p/{i}", D0 + dt.timedelta(seconds=i),
         "" if i == 7 else f"plain text £{i} — ünïcode body {i}")
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, text string")
    out = str(tmp_path / "wets")
    n_files = write_wet(df.repartition(4), out)
    assert 1 <= n_files <= 4
    back = {
        (r["url"], r["warc_ts"], r["text"])
        for r in read_wet(spark, out).collect()
    }
    assert back == set(rows)


def test_wet_reader_skips_response_records(spark, tmp_path):
    """A mixed archive (response + conversion members, as real CC segment
    dirs can interleave) yields only the conversion records from read_wet."""
    from boris_spark.kernel.warc import build_conversion_record
    from boris_spark.sources import read_wet

    mixed = gzip.compress(build_response_record(
        "http://m.test/html", D0, b"<html><p>x</p></html>"), mtime=0)
    mixed += gzip.compress(build_conversion_record(
        "http://m.test/text", D0, "just text".encode()), mtime=0)
    p = tmp_path / "part-0.warc.wet.gz"
    p.write_bytes(mixed)
    got = read_wet(spark, str(tmp_path)).collect()
    assert [(r["url"], r["text"]) for r in got] == [("http://m.test/text", "just text")]


def test_robots_decision_rfc9309_goldens():
    """Longest-match + Allow-wins-ties + wildcard/anchor semantics on the
    examples Google's robots.txt documentation uses (the de-facto RFC 9309
    §2.2.2 test vectors)."""
    from boris_spark.engine.robots import robots_decision

    assert robots_decision([("allow", "/p"), ("disallow", "/")], "/page")
    assert robots_decision(
        [("allow", "/folder"), ("disallow", "/folder")], "/folder/page"
    )  # tie → allow wins
    assert not robots_decision(
        [("allow", "/page"), ("disallow", "/*.htm")], "/page.htm"
    )  # /*.htm (6) beats /page (5)
    rules = [("allow", "/$"), ("disallow", "/")]
    assert robots_decision(rules, "/")
    assert not robots_decision(rules, "/page")
    fish = [("disallow", "/fish*.php$")]
    assert not robots_decision(fish, "/fish/salmon.php")
    assert robots_decision(fish, "/fish.php?query=1")  # $ anchors the end
    assert robots_decision([], "/anything")  # no rules → allowed
    assert robots_decision([("disallow", "$")], "/x")  # bare anchor: no match


def test_split_blocked_matches_reference_decision(spark):
    """The engine's codegen'd LIKE matcher == robots_decision on a fuzzed
    rule/url population covering wildcards, anchors, LIKE metacharacters
    (%, _, \\) as literals, and multi-rule precedence — one Spark job."""
    import random

    from boris_spark.engine.robots import (
        robots_decision, robots_rules_df, split_blocked,
    )

    rng = random.Random(7)
    rule_alpha = "ab/*$%_\\."
    url_alpha = "ab/.%_\\$"
    rules = [
        (
            f"h{i % 8}.test",
            rng.choice(["allow", "disallow"]),
            "/" + "".join(rng.choice(rule_alpha) for _ in range(rng.randint(0, 6))),
        )
        for i in range(48)
    ]
    urls = []
    for i in range(160):
        host = f"h{i % 8}.test"
        pqf = "/" + "".join(rng.choice(url_alpha) for _ in range(rng.randint(0, 8)))
        urls.append((f"http://{host}{pqf}", host, pqf))
    by_host: dict[str, list] = {}
    for h, t, p in rules:
        by_host.setdefault(h, []).append((t, p))
    want_allowed = {
        u for u, h, pqf in urls if robots_decision(by_host.get(h, []), pqf)
    }
    df = spark.createDataFrame(
        [(u, h) for u, h, _ in urls], "url_canon string, host string"
    ).distinct()
    allowed, blocked = split_blocked(df, robots_rules_df(spark, rules))
    got_allowed = {r["url_canon"] for r in allowed.collect()}
    got_blocked = {r["url_canon"] for r in blocked.collect()}
    assert got_allowed == want_allowed
    assert got_blocked == {u for u, _, _ in urls} - want_allowed


def test_crawl_delay_to_host_budgets(spark):
    """Crawl-delay parses per agent group and converts to the engine's
    per-host budget table (round_seconds / delay, floor at min_budget)."""
    from boris_spark.engine.robots import (
        host_budgets_from_robots, parse_crawl_delay,
    )

    body = (
        "User-agent: boris\nCrawl-delay: 2\nDisallow: /x\n\n"
        "User-agent: *\nCrawl-delay: 10\n"
    )
    assert parse_crawl_delay(body, "boris") == 2.0
    assert parse_crawl_delay(body, "other") == 10.0
    assert parse_crawl_delay("User-agent: *\nDisallow: /a", "x") is None

    df = spark.createDataFrame(
        [("a.test", body), ("b.test", "User-agent: *\nDisallow: /q"),
         ("c.test", "User-agent: *\nCrawl-delay: 1000")],
        "host string, body string",
    )
    got = {
        (r["host"], r["budget"])
        for r in host_budgets_from_robots(
            spark, df, agent="boris", round_seconds=60
        ).collect()
    }
    # a.test: 60/2 = 30; b.test absent (no delay); c.test floored to 1
    assert got == {("a.test", 30), ("c.test", 1)}


def test_robots_frames_loop_parity_goldens():
    """The vectorized pandas parser (robots_frames) == the loop parser on
    hand-written golden bodies covering every grammar branch."""
    from boris_spark.engine.robots import (
        parse_crawl_delay, parse_robots, parse_robots_rules, robots_frames,
    )

    bodies = [
        # comments, Allow lines, empty Disallow, exact-beats-star
        "# hdr\nUser-agent: boris\nDisallow: /b/1 # trail\nDisallow: /priv\n"
        "Allow: /b/ok\n\nUser-agent: *\nDisallow: /everyone\nDisallow:\n",
        # CRLF endings + float delay
        "User-agent: *\r\nCrawl-delay: 2.5\r\nDisallow: /x\r\n",
        # orphan rule before any UA; consecutive UA runs; invalid delay
        # value leaves the previous standing; unselected group's delay
        "Disallow: /orphan\nUser-agent: a\nUser-agent: boris\n"
        "Disallow: /ab\nUser-agent: zz\nCrawl-delay: 4\nCrawl-delay: nope\n"
        "Disallow: /z\n",
        # empty body; UA token case-insensitivity; zero delay
        "",
        "User-agent: BORIS\nCrawl-delay: 0\nDisallow: /zero\n",
        # Sitemap terminates a UA run
        "User-agent: *\nSitemap: http://x/s.xml\nUser-agent: boris\n"
        "Disallow: /after-sitemap\n",
        # same-specificity groups merge; delays take the min
        "User-agent: boris\nCrawl-delay: 9\nDisallow: /p\n"
        "User-agent: boris\nCrawl-delay: 3\nDisallow: /q\n",
        # unknown directives don't split a UA run
        "User-agent: a\nNoindex: /n\nUser-agent: boris\nDisallow: /u\n",
    ]
    keys = [f"h{i}" for i in range(len(bodies))]
    rules, delays = robots_frames(keys, bodies, "boris")
    for k, b in zip(keys, bodies):
        mine = rules[rules["key"] == k]
        assert parse_robots_rules(b, "boris") == list(
            zip(mine["rule_type"], mine["path"])
        ), k
        assert parse_robots(b, "boris") == (
            mine[mine["rule_type"] == "disallow"]["path"].tolist()
        ), k
        ld = parse_crawl_delay(b, "boris")
        vd = delays[delays["key"] == k]["delay"].tolist()
        if ld is None:
            assert vd == [], k
        else:
            assert len(vd) == 1 and abs(vd[0] - ld) < 1e-9, k


def test_robots_frames_loop_parity_fuzz():
    """Property: robots_frames == the loop parser on arbitrary line soups
    built from grammar fragments."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from boris_spark.engine.robots import (
        parse_crawl_delay, parse_robots_rules, robots_frames,
    )

    frag = st.sampled_from([
        "User-agent: boris", "User-agent: *", "User-agent: other",
        "user-AGENT:  boris ", "Disallow: /a", "Disallow: /b#c",
        "Disallow:", "disallow: /CaSe", "Allow: /ok", "Allow:",
        "Disallow: /fish*.php$", "Allow: /*/ok$", "Sitemap: http://s/",
        "Crawl-delay: 1", "Crawl-delay: 2.5", "Crawl-delay: junk",
        "crawl-delay:0.25", "# comment", "", "garbage line", "Key: value",
    ])
    sep = st.sampled_from(["\n", "\r\n", "\r"])

    @settings(max_examples=120, deadline=None)
    @given(st.lists(frag, min_size=0, max_size=20), sep)
    def check(lines, s):
        body = s.join(lines)
        rules, delays = robots_frames(["h"], [body], "boris")
        assert parse_robots_rules(body, "boris") == list(
            zip(rules["rule_type"], rules["path"])
        )
        ld = parse_crawl_delay(body, "boris")
        vd = delays["delay"].tolist()
        if ld is None:
            assert vd == []
        else:
            assert len(vd) == 1 and abs(vd[0] - ld) < 1e-9

    check()
