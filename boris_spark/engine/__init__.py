from .compiler import NodeSpec, compile_program
from .crawler import CrawlEngine, CrawlSummary
from .session import get_spark

__all__ = ["NodeSpec", "compile_program", "CrawlEngine", "CrawlSummary", "get_spark"]
