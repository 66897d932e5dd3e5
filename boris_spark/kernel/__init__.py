"""Pure-Python kernel shared by the oracle interpreter and the Spark UDFs.

One implementation of URL canonicalization, hashing, and HTML extraction is
used on both sides, so per-row byte-identity (BASELINE.json ``input_hint``)
holds by construction.
"""

from .hashing import xxh64, xxh64_str, to_signed64, SPARK_SEED
from .urlkit import (
    canonicalize,
    host_bucket,
    host_of,
    parse_url,
    resolve,
    resolve2,
    url_hash,
)
from .htmlkit import (
    forms,
    form_fill,
    html_decode,
    html_decode_star,
    links,
    links_text,
    page_text,
    page_title,
    parse_html,
    serialize,
    xpath,
    xpath_first,
    xpath_text,
)

__all__ = [
    "xxh64", "xxh64_str", "to_signed64", "SPARK_SEED",
    "canonicalize", "host_bucket", "host_of", "parse_url", "resolve", "resolve2", "url_hash",
    "forms", "form_fill", "html_decode", "html_decode_star", "links",
    "links_text", "page_text", "page_title", "parse_html", "serialize",
    "xpath", "xpath_first", "xpath_text",
]
