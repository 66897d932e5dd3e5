"""Latency-SLO politeness feedback: budgets_from_latency math + its
composition with the crawl engine's per-host budget enforcement."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from boris_spark.engine.robots import budgets_from_latency


def test_budgets_from_latency_math(spark):
    stats = spark.createDataFrame(
        [
            ("fast.test", 0.2),    # well under target -> capped at base
            ("ontarget.test", 1.0),  # exactly target -> base
            ("slow.test", 4.0),    # 4x target -> quarter budget
            ("dead.test", 500.0),  # pathological -> floor at min
        ],
        "host string, p95 double",
    )
    got = {
        r["host"]: r["budget"]
        for r in budgets_from_latency(
            stats, target_p95_s=1.0, base_budget=100, min_budget=1
        ).collect()
    }
    assert got == {
        "fast.test": 100,
        "ontarget.test": 100,
        "slow.test": 25,
        "dead.test": 1,
    }


def test_budgets_from_latency_zero_and_null_p95(spark):
    """p95 = 0 (coarse clock) or NULL (empty rollup) means no evidence of
    slowness: such hosts must get base_budget, not the min_budget throttle
    the naive NULL-skipping greatest() would hand them."""
    stats = spark.createDataFrame(
        [("zero.test", 0.0), ("null.test", None), ("neg.test", -1.0),
         ("slow.test", 4.0)],
        "host string, p95 double",
    )
    got = {
        r["host"]: r["budget"]
        for r in budgets_from_latency(
            stats, target_p95_s=1.0, base_budget=100, min_budget=1
        ).collect()
    }
    assert got == {
        "zero.test": 100,
        "null.test": 100,
        "neg.test": 100,
        "slow.test": 25,
    }


def test_latency_budgets_drive_crawl_enforcement(spark, tmp_path):
    """Computed budgets flow into CrawlEngine(host_budgets=...) and the
    politeness stage enforces them: the 'slow' host is capped per round
    while the crawl still completes and fetches everything."""
    from boris_spark.engine.crawler import CrawlEngine
    from boris_spark.oracle.program import Extract, Go, Lit, UrlE
    from boris_spark.synth import webgen

    n_pages, seed = 64, 7
    stats = spark.createDataFrame(
        [(f"h0.site{seed}.test", 8.0)], "host string, p95 double"
    )  # h0 measured 8x over target -> budget 2 (base 16)
    budgets = budgets_from_latency(
        stats, target_p95_s=1.0, base_budget=16, min_budget=1
    )
    assert budgets.collect()[0]["budget"] == 2

    seeds = [webgen.page_url(i, n_pages, seed) for i in range(0, n_pages, 8)]
    program = Go(Lit(seeds), Extract(UrlE()))
    eng = CrawlEngine(
        spark, None, str(tmp_path / "work"),
        politeness_k=1000, host_budgets=budgets,
        fetch_mode="callable", fetch_fn=webgen.make_fetcher(n_pages, seed, 4),
    )
    summary = eng.run(program, max_rounds=40)
    assert summary.fetched == len(set(seeds))

    # every round fetched at most 2 URLs from the throttled host
    import collections

    import pyarrow.parquet as pq

    h0 = f"h0.site{seed}.test"
    by_round = collections.defaultdict(int)
    seen_dir = str(tmp_path / "work" / "seen")
    for d in os.listdir(seen_dir):
        rnd = d.split("=")[-1]
        for root, _, files in os.walk(os.path.join(seen_dir, d)):
            for fn in files:
                if fn.endswith(".parquet"):
                    t = pq.read_table(os.path.join(root, fn), columns=["host", "status"])
                    for h, st in zip(t["host"].to_pylist(), t["status"].to_pylist()):
                        if h == h0 and st != 999:
                            by_round[rnd] += 1
    assert by_round, "throttled host never fetched"
    assert max(by_round.values()) <= 2, by_round
