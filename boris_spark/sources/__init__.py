from .warc import read_warc, write_warc  # noqa: F401
