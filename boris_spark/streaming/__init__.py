from .sessionize import stream_sessionize  # noqa: F401
from .frontier_feed import stream_frontier_dedup  # noqa: F401
