"""spark-submit entry point for the distributed crawl (the north rule's
deploy path):

    python scripts/package.py
    spark-submit --master <cluster> --py-files dist/boris_spark.zip \
        scripts/submit_crawl.py --workdir /data/crawl1 \
        --pages /data/pages_parquet            # snapshot mode, or
        --warc  /data/cc/*.warc.gz             # Common-Crawl archives, or
        --synthetic 480000 --weight 32         # deterministic synthetic web
        [--sitemaps /data/sitemap_parquet]     # (url, xml) sitemap docs →
                                               # distributed frontier seeds
        [--politeness-k 100000] [--max-rounds 32] [--resume]

The SparkSession inherits the master/executor topology from spark-submit
(no master override), so the SAME script runs at N and 4N executors — the
two-cluster-size criterion. Each round commits resumable parquet snapshots
with per-partition lineage manifests; pass --resume to continue a killed
crawl from its last completed round.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--pages", help="parquet pages table (snapshot fetch mode)")
    ap.add_argument("--warc", help="directory/glob of .warc(.gz) archives — "
                    "ingested via the distributed WARC source into the pages "
                    "table, then crawled in snapshot mode")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="crawl the deterministic synthetic web of N pages (callable mode)")
    ap.add_argument("--weight", type=int, default=32, help="synthetic page weight")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--seed-every", type=int, default=16,
                    help="synthetic seeds: one per this many pages")
    ap.add_argument("--politeness-k", type=int, default=100000)
    ap.add_argument("--host-budgets", help="CSV file host,budget — per-host politeness budgets")
    ap.add_argument("--robots-pages", help="parquet of (host, body) fetched "
                    "robots.txt files — parsed (RFC 9309 subset) into "
                    "disallow rules AND Crawl-delay per-host budgets")
    ap.add_argument("--agent", default="*", help="user-agent token for robots group selection")
    ap.add_argument("--sitemaps", help="parquet of (url, xml) fetched sitemap "
                    "documents — parsed distributed (sitemaps.org 0.9) and "
                    "their urlset entries unioned into the round-0 frontier "
                    "as seeds, never collected to the driver")
    ap.add_argument("--max-rounds", type=int, default=32)
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    from boris_spark.engine.crawler import CrawlEngine
    from boris_spark.engine.session import get_spark
    from boris_spark.oracle.program import Extract, Go, Lit, PageProfileE, XpathE
    from boris_spark.synth import webgen

    spark = get_spark("boris-crawl", master=None)

    budgets = None
    if args.host_budgets:
        budgets = spark.read.csv(
            args.host_budgets, schema="host string, budget int"
        )
    robots_rules = None
    if args.robots_pages:
        from boris_spark.engine.robots import (
            host_budgets_from_robots, robots_rules_from_pages,
        )

        robots_df = spark.read.parquet(args.robots_pages)
        robots_rules = robots_rules_from_pages(spark, robots_df, args.agent)
        delay_budgets = host_budgets_from_robots(spark, robots_df, args.agent)
        budgets = (
            delay_budgets if budgets is None
            else budgets.unionByName(delay_budgets)
            .groupBy("host").agg({"budget": "min"})
            .withColumnRenamed("min(budget)", "budget")
        )

    seed_frontier = None
    if args.sitemaps:
        from boris_spark.sources.sitemap import read_sitemaps, sitemap_frontier

        seed_frontier = sitemap_frontier(
            read_sitemaps(spark.read.parquet(args.sitemaps))
        )

    links_q = XpathE("//td[@class='title']/a/@href/text()")
    feat = Extract(PageProfileE())
    if args.synthetic:
        n = args.synthetic
        seeds = [webgen.page_url(i, n, args.seed) for i in range(0, n, args.seed_every)]
        program = Go(Lit(seeds), feat, Go(links_q, feat, Go(links_q, feat)))
        eng = CrawlEngine(
            spark, None, args.workdir, fetch_mode="callable",
            fetch_fn=webgen.make_fetcher(n, args.seed, args.weight),
            politeness_k=args.politeness_k, n_buckets=args.n_buckets,
            host_budgets=budgets, robots_rules=robots_rules,
        )
    else:
        if not args.pages and not args.warc:
            ap.error("--pages, --warc, or --synthetic required")
        if args.warc:
            from boris_spark.sources import read_warc

            pages = read_warc(spark, args.warc).select("url", "html")
        else:
            pages = spark.read.parquet(args.pages)
        seeds = [r["url"] for r in pages.select("url").limit(64).collect()]
        program = Go(Lit(seeds), feat, Go(links_q, feat, Go(links_q, feat)))
        eng = CrawlEngine(
            spark, pages, args.workdir,
            politeness_k=args.politeness_k, n_buckets=args.n_buckets,
            host_budgets=budgets, robots_rules=robots_rules,
        )

    s = eng.run(
        program, max_rounds=args.max_rounds, resume=args.resume,
        seed_frontier=seed_frontier,
    )
    print(json.dumps({
        "rounds": s.rounds, "fetched": s.fetched, "results": s.results,
        "wall_s": round(s.wall_s, 2),
        "urls_per_sec": round(s.fetch_throughput, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
