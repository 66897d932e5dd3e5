#!/usr/bin/env python
"""Per-round phase profiler for the bench crawl: runs crawl_bench with a
kept workdir and prints each round's manifest phase walls, so fixed
(non-core-scaling) cost can be attributed to specific phases. Usage:

    SPARK_GRAFT_CPUS=32 BORIS_BENCH_PAGES=120000 BORIS_PAGE_WEIGHT=32 \
        python scripts/profile_crawl.py
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_pages = int(os.environ.get("BORIS_BENCH_PAGES", "120000"))

    from bench import crawl_bench
    from boris_spark.engine.session import get_spark

    spark = get_spark("boris-profile", cores=cpus)
    workdir = tempfile.mkdtemp(prefix="boris_prof_")
    try:
        out = crawl_bench(spark, n_pages, workdir)
        rounds = []
        for f in sorted(
            glob.glob(os.path.join(workdir, "rounds", "*.json")),
            key=lambda p: int(os.path.basename(p).split(".")[0]),
        ):
            rounds.append(json.load(open(f)))
        print(json.dumps({"cpus": cpus, "crawl": out, "rounds": [
            {k: r.get(k) for k in
             ("round", "requests", "fetched", "wall_s", "py_replay_rows", "phases", "commit_walls")}
            for r in rounds
        ]}, indent=1))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
