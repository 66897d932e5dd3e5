from . import program
from .interpreter import Fly, OracleResult, SnapshotFetcher, Spider, spider

__all__ = ["program", "Fly", "OracleResult", "SnapshotFetcher", "Spider", "spider"]
