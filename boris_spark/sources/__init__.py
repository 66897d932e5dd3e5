from .warc import read_warc  # noqa: F401
