"""Distributed WARC source: Common-Crawl-style archive files → the
BASELINE.json ``input_hint`` pages table
``(url, warc_ts, html binary, text, lang)``.

Plan shape for 100 TB of WARCs: ``binaryFile`` gives one task per archive
file (the real Common-Crawl unit, ~1 GB gzip each — file count IS the
parallelism, exactly how production Spark-over-CC jobs run); each task
parses its records with the pure-Python kernel codec and extracts text with
the SAME kernel the crawl engine uses, so WARC-ingested pages satisfy the
byte-identity invariant by construction. Only 200-status HTML responses
survive; everything stays inside the Arrow batch — no record ever becomes a
driver-side object.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..kernel import htmlkit
from ..kernel.warc import warc_records

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)

# the same marker-word heuristic as the lang_id query (one definition of the
# marker table; the source computes it Python-side inside the parse batch,
# the lang_id gate recomputes it JVM-side — both from ops/queries.py's list)
from ..ops.queries import _LANG_MARKERS  # noqa: E402


def _lang_guess(text: str) -> str:
    pad = f" {text.lower()} "
    counts = [(lang, pad.count(marker)) for lang, marker in _LANG_MARKERS]
    best = max(c for _, c in counts)
    for lang, c in counts:
        if c >= best:
            return lang
    return counts[0][0]


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read a directory (or glob) of .warc / .warc.gz files into the pages
    table. One parse task per file."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                for rec in warc_records(bytes(blob)):
                    if rec.rec_type != "response" or rec.http_status != 200:
                        continue
                    if rec.uri is None or rec.date is None:
                        continue
                    html = rec.body.decode("utf-8", "replace")
                    text = htmlkit.page_text(html)
                    rows.append({
                        "url": rec.uri,
                        "warc_ts": rec.date.replace(tzinfo=None),
                        "html": rec.body,
                        "text": text,
                        "lang": _lang_guess(text),
                    })
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    return files.mapInPandas(parse, PAGES_SCHEMA)
