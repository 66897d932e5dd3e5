"""WARC-ingestion gate: deterministic Common-Crawl-style archives are
synthesized from `documents` (4 per-record-gzip'd .warc.gz files — the CC
layout), parsed back through the distributed binaryFile source
(boris_spark/sources/warc.py), and every column of the resulting pages table
is oracled in closed-form SQL — including the byte length of the original
record payload and the lang heuristic."""

from __future__ import annotations

import datetime as dt
import os
import tempfile

from pyspark.sql import functions as F

from ..synth.webgen import DOC_HOSTS
from .crawl2 import detail_html_sql
from .queries import _LANG_MARKERS, _marker_count_sql, q

WARC_EPOCH = dt.datetime(2024, 1, 1)

_warc_dir_cache: dict[str, str] = {}


def _build_warc_dir(sf_dir: str) -> str:
    """Synthesize the archive files once per sf_dir (driver-side: this is
    test-fixture construction, not the operator; the PARSE runs
    distributed)."""
    key = os.path.abspath(sf_dir)
    if key in _warc_dir_cache:
        return _warc_dir_cache[key]
    import pyarrow.parquet as pq

    from ..kernel.warc import build_warc

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).to_pandas()
    out = tempfile.mkdtemp(prefix="boris_warc_")
    n_files = 4
    shards: list[list] = [[] for _ in range(n_files)]
    for doc_id, text in zip(t["doc_id"], t["text"]):
        d = int(doc_id)
        html = (
            f"<html><head><title>doc {d}</title></head>"
            f"<body><p>{text}</p></body></html>"
        )
        shards[d % n_files].append((
            f"http://h{d % DOC_HOSTS}.docs.test/d/{d}",
            WARC_EPOCH + dt.timedelta(seconds=d),
            html.encode("utf-8"),
        ))
    for i, recs in enumerate(shards):
        with open(os.path.join(out, f"part-{i}.warc.gz"), "wb") as f:
            f.write(build_warc(recs, compress=True))
    _warc_dir_cache[key] = out
    return out


_WARC_SQL = (
    "WITH p AS (SELECT doc_id, text, ' ' || lower(text) || ' ' AS pad FROM documents),\n"
    "s AS (SELECT doc_id, text, "
    + ", ".join(f"{_marker_count_sql(m)} AS c_{l}" for l, m in _LANG_MARKERS)
    + " FROM p)\n"
    f"SELECT 'http://h' || (doc_id % {DOC_HOSTS}) || '.docs.test/d/' || doc_id AS url,\n"
    "       TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (doc_id) SECOND AS warc_ts,\n"
    "       CAST(octet_length(encode(" + detail_html_sql() + ")) AS BIGINT) AS n_bytes,\n"
    "       text,\n"
    "       CASE "
    + " ".join(
        f"WHEN c_{l} >= greatest({', '.join('c_' + l2 for l2, _ in _LANG_MARKERS)}) THEN '{l}'"
        for l, _ in _LANG_MARKERS
    )
    + " END AS lang\nFROM s"
)


@q("warc_ingest", _WARC_SQL)
def warc_ingest(spark, sf_dir):
    """WARC source gate: every record of the synthesized archives comes back
    with byte-exact payload length, the kernel-extracted text (byte-identity
    with the source document), the record timestamp, and the lang guess."""
    from ..sources import read_warc

    pages = read_warc(spark, _build_warc_dir(sf_dir))
    return pages.select(
        "url", "warc_ts",
        F.length("html").cast("long").alias("n_bytes"),
        "text", "lang",
    )


_wet_dir_cache: dict[str, str] = {}


def _build_wet_dir(spark, sf_dir: str) -> str:
    """Export the documents-derived pages table as WET conversion archives
    once per sf_dir — the WRITE half runs distributed (one streamed file
    per partition, task-retry-safe rename); the gate then measures the
    distributed READ, so the gate covers the full roundtrip."""
    key = os.path.abspath(sf_dir)
    if key in _wet_dir_cache:
        return _wet_dir_cache[key]
    from ..sources import write_wet
    from .queries import T

    d = T(spark, sf_dir, "documents")
    did = F.col("doc_id")
    pages = d.select(
        F.concat(
            F.lit("http://h"), F.pmod(did, F.lit(DOC_HOSTS)).cast("string"),
            F.lit(".docs.test/d/"), did.cast("string"),
        ).alias("url"),
        F.expr(
            "timestamp'2024-01-01 00:00:00'"
            " + make_interval(0, 0, 0, 0, 0, 0, cast(doc_id as int))"
        ).alias("warc_ts"),
        "text",
    ).repartition(8)
    out = tempfile.mkdtemp(prefix="boris_wet_")
    write_wet(pages, out, compress=True)
    _wet_dir_cache[key] = out
    return out


_WET_SQL = f"""
SELECT 'http://h' || (doc_id % {DOC_HOSTS}) || '.docs.test/d/' || doc_id AS url,
       TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (doc_id) SECOND AS warc_ts,
       text,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents
"""


@q("wet_export", _WET_SQL)
def wet_export(spark, sf_dir):
    """WET roundtrip gate: the pages table exported as Common-Crawl
    *.warc.wet.gz conversion archives (per-record gzip members) and parsed
    back through the distributed binaryFile source — url, timestamp, and
    text must survive byte-identically. Together with warc_ingest (WARC
    response records) and cdx_index (the capture index) this pins the full
    CC artifact family. One task per archive on the read; the write
    streams one file per partition with the same retry guards as
    write_warc."""
    from ..sources import read_wet

    pages = read_wet(spark, _build_wet_dir(spark, sf_dir))
    return pages.select(
        "url", "warc_ts", "text",
        F.length("text").cast("long").alias("n_chars"),
    )
