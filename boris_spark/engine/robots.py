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


def parse_robots(text: str, agent: str = "*") -> list[str]:
    """Parse a robots.txt body into the Disallow prefixes that apply to
    *agent* — the RFC 9309 subset the rules table consumes:

    - groups = consecutive ``User-agent`` lines followed by their rules;
    - the most specific matching group wins: an exact (case-insensitive)
      agent token beats ``*``; with several same-specificity groups their
      rules merge (RFC 9309 §2.2.1);
    - ``Disallow:`` with an empty value allows everything (no rule);
    - ``Allow`` lines and wildcards inside paths are OUT of the subset —
      the engine's enforcement is pure prefix-match (split_blocked above);
    - ``#`` comments and unknown directives are skipped.
    """
    groups = _parse_groups(text)
    agent = agent.lower()
    exact = [r for agents, rules, _ in groups if agent in agents for r in rules]
    if any(agent in agents for agents, _, _ in groups):
        return exact
    return [r for agents, rules, _ in groups if "*" in agents for r in rules]


def parse_crawl_delay(text: str, agent: str = "*") -> float | None:
    """The ``Crawl-delay`` (seconds) of the group that applies to *agent*
    (same group-selection rule as :func:`parse_robots`); None if absent."""
    groups = _parse_groups(text)
    agent = agent.lower()
    pools = (
        [g for g in groups if agent in g[0]]
        if any(agent in g[0] for g in groups)
        else [g for g in groups if "*" in g[0]]
    )
    delays = [d for _, _, d in pools if d is not None]
    return min(delays) if delays else None


def _parse_groups(text: str) -> list[tuple[list[str], list[str], float | None]]:
    """robots.txt → [(agent tokens, disallow prefixes, crawl-delay)]."""
    groups: list[tuple[list[str], list[str], float | None]] = []
    cur_agents: list[str] = []
    cur_rules: list[str] = []
    cur_delay: float | None = None
    in_rules = False

    def flush():
        nonlocal cur_agents, cur_rules, cur_delay
        if cur_agents:
            groups.append((cur_agents, cur_rules, cur_delay))
        cur_agents, cur_rules, cur_delay = [], [], None

    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if in_rules:
                flush()
                in_rules = False
            cur_agents.append(value.lower())
        elif key == "disallow":
            in_rules = True
            if value:
                cur_rules.append(value)
        elif key == "crawl-delay":
            in_rules = True
            try:
                cur_delay = float(value)
            except ValueError:
                pass
        elif key in ("allow", "sitemap"):
            in_rules = True  # rule line: terminates the user-agent run
    flush()
    return groups


def host_budgets_from_robots(
    spark: SparkSession,
    robots_df: DataFrame,
    agent: str = "*",
    round_seconds: float = 60.0,
    min_budget: int = 1,
) -> DataFrame:
    """Crawl-delay → the engine's per-host politeness budgets table
    ``(host, budget)``: a host asking for a d-second delay gets at most
    ``round_seconds / d`` fetches per crawl round (the round is the
    engine's scheduling quantum). Hosts without a Crawl-delay are absent —
    they fall back to the global ``politeness_k``.

    The result is aggregated to ONE row per host (min budget wins — the
    most conservative delay, matching submit_crawl's union-dedup rule).
    Duplicate host rows in *robots_df* (refetched robots.txt, multiple
    snapshots) would otherwise row-multiply every unseen URL of that host
    through the politeness stage's broadcast left join."""

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for h, b in zip(pdf["host"], pdf["body"]):
                d = parse_crawl_delay(b if isinstance(b, str) else "", agent)
                if d and d > 0:
                    rows.append({
                        "host": h,
                        "budget": max(min_budget, int(round_seconds / d)),
                    })
            yield pd.DataFrame(rows, columns=["host", "budget"])

    return (
        robots_df.select("host", "body")
        .mapInPandas(parse, "host string, budget int")
        .groupBy("host")
        .agg(F.min("budget").alias("budget"))
    )


def robots_rules_from_pages(
    spark: SparkSession, robots_df: DataFrame, agent: str = "*"
) -> DataFrame:
    """(host, body) rows of fetched /robots.txt files → the engine's rules
    table ``(host, disallow_prefix)``. Parse runs distributed in Arrow
    batches; the result is the (small) broadcast side of split_blocked."""

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            rows = [
                {"host": h, "disallow_prefix": p}
                for h, b in zip(pdf["host"], pdf["body"])
                for p in parse_robots(b if isinstance(b, str) else "", agent)
            ]
            yield pd.DataFrame(rows, columns=["host", "disallow_prefix"])

    return robots_df.select("host", "body").mapInPandas(
        parse, "host string, disallow_prefix string"
    )


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
