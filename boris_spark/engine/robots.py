"""robots.txt rule enforcement.

The reference documents robots handling as a spider concern
(/root/reference/boris/doc/api.scrbl:18-19) but ships no implementation; the
north rule requires it, so the engine defines the semantics:

- a rules table ``(host, disallow_prefix)``;
- a URL is blocked iff its path-query-fragment starts with any disallow
  prefix for its host;
- blocked URLs are recorded in the seen set with ``status=999`` and an empty
  body, so traversal continues deterministically (selectors over the empty
  body return [] and the branch prunes) and the frontier cannot stall on
  them.

Enforcement is a broadcast join on host + JVM-side ``startswith`` — rules
tables are small relative to the frontier, and the prefix test stays in
whole-stage codegen. The oracle mirrors the same semantics via
:class:`RobotsSnapshotFetcher` so parity is testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..oracle.interpreter import SnapshotFetcher

ROBOTS_STATUS = 999


def robots_rules_df(spark: SparkSession, rules: list[tuple[str, str]]) -> DataFrame:
    return spark.createDataFrame(rules, "host string, disallow_prefix string")


def split_blocked(urls: DataFrame, rules: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Partition candidate URLs into (allowed, blocked) under *rules*.

    *urls* must carry (url_canon, host). One broadcast join; the big side is
    scanned once.
    """
    # path+query+fragment = canonical url minus "scheme://host"
    pqf = F.expr("substring(url_canon, instr(url_canon, '://') + 3 + length(host))")
    hit = (
        urls.join(F.broadcast(rules), "host", "left")
        .withColumn(
            "_blocked",
            F.when(
                F.col("disallow_prefix").isNotNull()
                & F.startswith(pqf, F.col("disallow_prefix")),
                1,
            ).otherwise(0),
        )
        .groupBy(*urls.columns)
        .agg(F.max("_blocked").alias("_blocked"))
    )
    allowed = hit.where(F.col("_blocked") == 0).drop("_blocked")
    blocked = hit.where(F.col("_blocked") == 1).drop("_blocked")
    return allowed, blocked


class RobotsSnapshotFetcher(SnapshotFetcher):
    """Oracle-side mirror: blocked URLs yield (999, "")."""

    def __init__(self, pages: dict[str, str], rules: list[tuple[str, str]]):
        super().__init__(pages)
        self.rules = rules

    def fetch(self, url_canon: str, method: str = "GET", form_data=None,
              url_full: str | None = None, jar=None):
        rest = url_canon.split("://", 1)[-1]
        host, _, pqf = rest.partition("/")
        pqf = "/" + pqf
        for rhost, prefix in self.rules:
            if rhost == host and pqf.startswith(prefix):
                return (ROBOTS_STATUS, "")
        return super().fetch(url_canon, method, form_data, url_full)
