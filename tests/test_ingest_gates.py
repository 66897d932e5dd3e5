"""Hand-written fixtures for the ingest-hygiene gates (#75-78, #81).

The gate queries synthesize their own input columns closed-form so the
DuckDB oracle can restate them — which (as VERDICT r3 noted for
sitemap_parse) leaves a shared-bug blind spot: fixture generation and the
detector under test ride the same string-building conventions. These tests
close that gap: REAL-WORLD-SHAPED bytes, authored by hand (including
malformed cases), flow through the exact production expressions
(charset_sniff_cols / soft404_verdict_col / url_template_col /
canonical_href_col) with expectations asserted independently.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from boris_spark.ops.queries import (  # noqa: E402
    _COMPACT_TARGET,
    charset_sniff_cols,
    compact_plan,
    soft404_verdict_col,
    url_template_col,
)

SF_DIR = "/root/testdata/sf0.001"


CHARSET_FIXTURES = [
    # (head, expected_charset, expected_via)
    ('<!DOCTYPE html><html><head><meta charset="utf-8">', "utf-8", "meta"),
    # uppercase tag + attribute, bare value (HTML5 prescan is case-insensitive)
    ("<HTML><HEAD><META CHARSET=Shift_JIS></HEAD>", "shift_jis", "meta"),
    # the classic legacy form, single http-equiv, charset buried in content=
    (
        '<head><meta http-equiv="Content-Type" '
        'content="text/html; charset=windows-1251"></head>',
        "windows-1251",
        "meta",
    ),
    # xml declaration only (XHTML served as XML)
    ('<?xml version="1.0" encoding="ISO-8859-15"?><html/>', "iso-8859-15", "xmldecl"),
    # both present: meta wins regardless of document order
    (
        '<?xml version="1.0" encoding="UTF-16"?>'
        "<html><head><meta charset=KOI8-R>",
        "koi8-r",
        "meta",
    ),
    # single-quoted value (legal HTML) — the \x27 branch of the pattern
    ("<head><meta charset='EUC-JP'></head>", "euc-jp", "meta"),
    # no declaration at all -> default
    ("<html><body>hello</body></html>", "utf-8", "default"),
    # malformed: attribute with no value -> no match, default
    ("<head><meta charset></head>", "utf-8", "default"),
    # documented subset boundary: whitespace around '=' is not tolerated
    # (the real prescan skips it; ours falls back to the default)
    ("<head><meta charset = 'utf-8'></head>", "utf-8", "default"),
]


def test_charset_sniff_hand_fixtures(spark):
    df = spark.createDataFrame(
        [(i, h) for i, (h, _, _) in enumerate(CHARSET_FIXTURES)], "i long, head string"
    )
    charset, via = charset_sniff_cols(df["head"])
    got = {r["i"]: (r["charset"], r["via"]) for r in df.select("i", charset, via).collect()}
    for i, (_, want_cs, want_via) in enumerate(CHARSET_FIXTURES):
        assert got[i] == (want_cs, want_via), f"fixture {i}: {got[i]}"


SOFT404_FIXTURES = [
    ("Sorry, the page you requested was not found on this server.", "ok"),
    # phrase list is exact-substring on lowercased body
    ("ERROR 404 - nothing here", "phrase"),
    ("This article is No Longer Available due to rights issues.", "phrase"),
    ("404", "short"),
    ("   ", "short"),
    ("a perfectly ordinary document with plenty of words in it", "ok"),
    # phrase beats short when both apply
    ("page not found", "phrase"),
]


def test_soft404_hand_fixtures(spark):
    df = spark.createDataFrame(
        [(i, b) for i, (b, _) in enumerate(SOFT404_FIXTURES)], "i long, body string"
    )
    got = {r["i"]: r["verdict"] for r in df.select("i", soft404_verdict_col(df["body"])).collect()}
    for i, (_, want) in enumerate(SOFT404_FIXTURES):
        assert got[i] == want, f"fixture {i}: {got[i]!r} != {want!r}"


URL_TEMPLATE_FIXTURES = [
    (
        "https://news.example.com/2024/03/17/article-9123.html",
        "https://news.example.com/(d)/(d)/(d)/article-(d).html",
    ),
    (
        # 32-hex session token collapses to (hex), not 32 chars of (d)
        "http://shop.test/cart?sid=0123456789abcdef0123456789abcdef",
        "http://shop.test/cart?sid=(hex)",
    ),
    (
        # 31 hex chars is NOT a token; its digit runs collapse individually
        "http://shop.test/cart?sid=0123456789abcdef0123456789abcde",
        "http://shop.test/cart?sid=(d)abcdef(d)abcde",
    ),
    ("http://example.com/about", "http://example.com/about"),
    (
        "http://h7.shop.test/search?q=item&page=19",
        "http://h(d).shop.test/search?q=item&page=(d)",
    ),
]


def test_url_template_hand_fixtures(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(URL_TEMPLATE_FIXTURES)], "i long, url string"
    )
    got = {r["i"]: r["template"] for r in df.select("i", url_template_col(df["url"])).collect()}
    for i, (_, want) in enumerate(URL_TEMPLATE_FIXTURES):
        assert got[i] == want, f"fixture {i}: {got[i]!r} != {want!r}"


def test_compact_plan_invariants(spark):
    """Every file assigned exactly once; group ids contiguous from 0 per
    partition; no group except the last exceeds target once it has >1 file
    (a single file larger than target must still get its own group)."""
    rows = compact_plan(spark, SF_DIR).collect()
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    # every file appears exactly once: distinct ids == rows == corpus size
    assert len({r["file_id"] for r in rows}) == len(rows) == n_docs
    by_part = {}
    for r in rows:
        by_part.setdefault(r["part"], []).append(r)
    for part, fs in by_part.items():
        fs.sort(key=lambda r: r["file_id"])
        grps = sorted({r["grp"] for r in fs})
        assert grps == list(range(len(grps))), f"part {part}: gaps in {grps}"
        # cumulative-sum grouping: group boundary only crossed when the
        # running total passes a multiple of target
        cum = 0
        for r in fs:
            assert r["grp"] == cum // _COMPACT_TARGET
            cum += r["bytes"]


CANONICAL_FIXTURES = [
    (
        '<head><link rel="canonical" href="https://example.com/article">',
        "https://example.com/article",
    ),
    # attribute order flipped + extra attributes between rel and href
    (
        '<link rel=canonical data-x="1" href="http://e.com/a?page=1">',
        "http://e.com/a?page=1",
    ),
    # uppercase
    ('<LINK REL="CANONICAL" HREF="http://e.com/c">', "http://e.com/c"),
    # rel=alternate must NOT match
    ('<link rel="alternate" href="http://e.com/feed">', ""),
    # documented subset boundary: href BEFORE rel does not match
    ('<link href="http://e.com/x" rel="canonical">', ""),
]


def test_canonical_href_hand_fixtures(spark):
    from boris_spark.ops.queries import canonical_href_col

    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(CANONICAL_FIXTURES)], "i long, head string"
    )
    got = {r["i"]: r["href"] for r in df.select(
        "i", canonical_href_col(df["head"]).alias("href")).collect()}
    for i, (_, want) in enumerate(CANONICAL_FIXTURES):
        assert got[i] == want, f"fixture {i}: {got[i]!r} != {want!r}"


def test_cdc_chunking_edit_locality(spark, tmp_path):
    """The FastCDC property the gate's docstring claims: inserting a
    paragraph re-chunks only its NEIGHBORHOOD. Two copies of the same
    document — one with a run of tokens spliced into the middle — must
    share every chunk hash except the few chunks touching the splice
    point (fixed-width chunking would instead lose every chunk after
    it)."""
    from boris_spark.ops.queries import dedup_cdc_chunks

    base = [f"tok{i}" for i in range(400)]
    insert_at = 200
    edited = base[:insert_at] + [f"new{i}" for i in range(30)] + base[insert_at:]
    sf = tmp_path / "sf"
    sf.mkdir()
    spark.createDataFrame(
        [(0, " ".join(base), "en", "src0", len(" ".join(base))),
         (1, " ".join(edited), "en", "src0", len(" ".join(edited)))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(str(sf / "documents.parquet"))

    rows = dedup_cdc_chunks(spark, str(sf)).collect()
    # chunks present in only ONE of the two docs = the edit neighborhood
    uniq = [r for r in rows if r["n_docs"] == 1]
    shared = [r for r in rows if r["n_docs"] == 2]
    assert shared, "documents share no chunks at all — chunking is not content-defined"
    # the splice disturbs the chunk containing the insertion point plus the
    # inserted run itself; with a 1/8 gear the neighborhood is a handful of
    # chunks, NEVER the ~half-document a fixed-width chunker would shift
    assert len(uniq) <= 8, (
        f"{len(uniq)} unique chunks vs {len(shared)} shared — "
        "edit was not local"
    )
    assert len(shared) >= len(uniq), "locality inverted"


# --------------------------------------------------- real PNG codec (pngkit)


def test_png_roundtrip_all_filters_and_levels():
    import numpy as np

    from boris_spark.kernel import pngkit

    rng = np.random.RandomState(7)
    for (w, h) in [(1, 1), (3, 2), (64, 64), (255, 7), (300, 190)]:
        for ft in [0, 1, 2, 3, 4, "mix"]:
            for lvl in [0, 6]:
                arr = rng.randint(0, 256, (h, w), dtype=np.uint8)
                back = pngkit.png_decode(
                    pngkit.png_encode(arr, level=lvl, filter_type=ft)
                )
                assert (back == arr).all(), (w, h, ft, lvl)


def test_png_crc_and_shape_validation():
    import numpy as np
    import pytest as _pytest

    from boris_spark.kernel import pngkit

    data = bytearray(pngkit.png_encode(pngkit.gradient_image(8, 8)))
    data[40] ^= 0xFF
    with _pytest.raises(ValueError, match="CRC"):
        pngkit.png_decode(bytes(data))
    with _pytest.raises(ValueError, match="signature"):
        pngkit.png_decode(b"not a png at all")
    # truncated IDAT: dimensions mismatch
    arr = np.zeros((4, 4), dtype=np.uint8)
    good = pngkit.png_encode(arr)
    import struct as _struct
    import zlib as _zlib

    bad_idat = _zlib.compress(b"\x00" * 7)  # wrong payload size
    tag = b"IDAT"
    chunk = (
        _struct.pack(">I", len(bad_idat)) + tag + bad_idat
        + _struct.pack(">I", _zlib.crc32(tag + bad_idat) & 0xFFFFFFFF)
    )
    # splice: signature + IHDR from good, then bad IDAT + IEND
    ihdr_end = 8 + 12 + 13
    iend = good[-12:]
    with _pytest.raises(ValueError, match="length"):
        pngkit.png_decode(good[:ihdr_end] + chunk + iend)


def test_media_blobs_are_real_pngs_with_gradient_pixels():
    """Every image blob in the media table decodes (real inflate +
    unfilter) to the closed-form gradient; resize produces valid 64×64
    PNGs of the sampled grid."""
    import numpy as np

    from boris_spark.kernel import pngkit
    from boris_spark.ops.multimodal import _media_row, image_resize_fn

    for doc_id in (0, 3, 6, 9, 33, 144):
        row = _media_row(doc_id, f"text {doc_id}")
        assert row["kind"] == "image"
        img = pngkit.png_decode(row["blob"])
        assert img.shape == (row["height"], row["width"])
        assert (img == pngkit.gradient_image(row["width"], row["height"])).all()

    import pandas as pd

    rows = [_media_row(d, "t") for d in (0, 3)]
    out = list(image_resize_fn(target=64)(iter([pd.DataFrame(rows)])))[0]
    for _, r in out.iterrows():
        small = pngkit.png_decode(r["blob"])
        assert small.shape == (64, 64)
        big = pngkit.png_decode(rows[0 if r["media_id"] == 0 else 1]["blob"])
        ih, iw = big.shape
        ys = (np.arange(64) * ih) // 64
        xs = (np.arange(64) * iw) // 64
        assert (small == big[np.ix_(ys, xs)]).all()
