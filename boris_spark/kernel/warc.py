"""WARC/1.0 record codec (ISO 28500, the public Common-Crawl container
format): a pure-Python parser + writer used by the distributed WARC source
(boris_spark/sources/warc.py) and by the deterministic test synthesizer.

Only the record grammar the crawl pipeline needs is implemented: version
line, CRLF header block, Content-Length-delimited body, CRLF CRLF record
separator; `response` records carry an HTTP/1.1 message whose body is the
page. Gzip'd files (whole-file or per-record members, the Common-Crawl
layout) are handled by decompressing all members first — ``zlib`` consumes
concatenated members the same way real WARC readers do.
"""

from __future__ import annotations

import datetime as dt
import gzip
import io
import zlib
from dataclasses import dataclass, field


@dataclass
class WarcRecord:
    rec_type: str
    uri: str | None
    date: dt.datetime | None
    headers: list[tuple[str, str]] = field(default_factory=list)
    http_status: int | None = None
    http_headers: list[tuple[str, str]] = field(default_factory=list)
    body: bytes = b""  # HTTP payload for response records, raw block otherwise


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a stream of concatenated gzip members (CC per-record
    layout) or a single whole-file member."""
    out = io.BytesIO()
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        out.write(d.decompress(data[pos:]))
        out.write(d.flush())
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed
    return out.getvalue()


def _parse_header_block(block: bytes) -> list[tuple[str, str]]:
    headers: list[tuple[str, str]] = []
    for line in block.split(b"\r\n"):
        if not line:
            continue
        if line[:1] in (b" ", b"\t") and headers:  # folded continuation
            k, v = headers[-1]
            headers[-1] = (k, v + " " + line.strip().decode("utf-8", "replace"))
            continue
        name, _, value = line.partition(b":")
        headers.append((
            name.decode("utf-8", "replace").strip(),
            value.decode("utf-8", "replace").strip(),
        ))
    return headers


def _header(headers: list[tuple[str, str]], name: str) -> str | None:
    low = name.lower()
    for k, v in headers:
        if k.lower() == low:
            return v
    return None


def warc_records(data: bytes):
    """Yield :class:`WarcRecord` for every record in *data* (plain or
    gzip'd). Malformed trailing bytes terminate iteration rather than
    raising — a truncated fetch loses its tail record only."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        eol = data.find(b"\r\n", pos)
        if eol < 0 or not data[pos:eol].startswith(b"WARC/"):
            return
        hdr_end = data.find(b"\r\n\r\n", eol)
        if hdr_end < 0:
            return
        headers = _parse_header_block(data[eol + 2:hdr_end])
        try:
            length = int(_header(headers, "Content-Length") or "")
        except ValueError:
            return
        if hdr_end + 4 + length > n:
            return  # truncated tail record: drop it, keep what parsed
        block = data[hdr_end + 4:hdr_end + 4 + length]
        pos = hdr_end + 4 + length

        rec_type = (_header(headers, "WARC-Type") or "").lower()
        uri = _header(headers, "WARC-Target-URI")
        date_s = _header(headers, "WARC-Date")
        date = None
        if date_s:
            try:
                date = dt.datetime.fromisoformat(date_s.replace("Z", "+00:00"))
            except ValueError:
                date = None
        rec = WarcRecord(rec_type, uri, date, headers)
        if rec_type == "response" and block.startswith(b"HTTP/"):
            http_end = block.find(b"\r\n\r\n")
            if http_end >= 0:
                status_line, _, rest = block[:http_end].partition(b"\r\n")
                try:
                    rec.http_status = int(status_line.split(b" ")[1])
                except (IndexError, ValueError):
                    rec.http_status = None
                rec.http_headers = _parse_header_block(rest)
                rec.body = block[http_end + 4:]
            else:
                rec.body = block
        else:
            rec.body = block
        yield rec


def build_response_record(
    uri: str, date: dt.datetime, body: bytes, status: int = 200,
    content_type: str = "text/html; charset=utf-8",
) -> bytes:
    """Serialize one WARC response record (the writer half — used by the
    deterministic synthesizer; a crawl's WARC sink uses the same form)."""
    http = (
        f"HTTP/1.1 {status} OK\r\nContent-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Date: {date.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode()
    return head + http + b"\r\n\r\n"


def build_conversion_record(uri: str, date: dt.datetime, text: bytes) -> bytes:
    """Serialize one WARC ``conversion`` record (the WET layout: plain-text
    conversion of a crawled page, Common Crawl's *.warc.wet.gz artifact).
    The block is the UTF-8 text itself — no HTTP envelope."""
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Date: {date.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n"
        "Content-Type: text/plain\r\n"
        f"Content-Length: {len(text)}\r\n\r\n"
    ).encode()
    return head + text + b"\r\n\r\n"


def build_warc(records: list[tuple[str, dt.datetime, bytes]], compress: bool = False) -> bytes:
    """records: [(uri, date, body)] → one WARC file (optionally one gzip
    member per record, the Common-Crawl layout)."""
    if not compress:
        return b"".join(build_response_record(u, d, b) for u, d, b in records)
    return b"".join(
        gzip.compress(build_response_record(u, d, b), mtime=0)
        for u, d, b in records
    )
