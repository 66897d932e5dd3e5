#!/usr/bin/env python
"""Interleaved engine A/B: current working tree vs a pinned git revision.

This host shows ±25% window variance (hypervisor CPU steal), so
non-interleaved comparisons are meaningless; reps alternate
A B A B ... and each rep is a fresh subprocess (own JVM) running ONLY the
crawl (bench.crawl_bench). Reports per-engine best + all samples.

Usage:
    python scripts/ab_engines.py --rev c3d7dc8 --reps 3 \
        --pages 120000 --weight 32 --cpus 32

The pinned revision is checked out into a git worktree under /tmp (reused
if it exists). Requires: no other Spark job running on the box.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RUNNER = r"""
import json, os, shutil, sys, tempfile
sys.path.insert(0, sys.argv[1])
os.chdir(sys.argv[1])
from bench import crawl_bench
from boris_spark.engine.session import get_spark

cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
n_pages = int(os.environ.get("BORIS_BENCH_PAGES", "120000"))
spark = get_spark("boris-ab", cores=cpus)
workdir = tempfile.mkdtemp(prefix="boris_ab_")
try:
    out = crawl_bench(spark, n_pages, workdir)
finally:
    shutil.rmtree(workdir, ignore_errors=True)
spark.stop()
print("ABRESULT " + json.dumps(out))
"""


def run_one(tree: str, pages: int, weight: int, cpus: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        BORIS_BENCH_PAGES=str(pages),
        BORIS_PAGE_WEIGHT=str(weight),
    )
    out = subprocess.run(
        [sys.executable, "-c", _RUNNER, tree],
        capture_output=True, text=True, env=env, cwd=tree,
    )
    for line in out.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(
        f"no result from {tree}: {out.stdout[-500:]} {out.stderr[-500:]}"
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rev", required=True)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--pages", type=int, default=120000)
    ap.add_argument("--weight", type=int, default=32)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    wt = f"/tmp/boris_ab_{args.rev}"
    if not os.path.isdir(wt):
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, args.rev],
            cwd=REPO, check=True,
        )
    samples = {"current": [], args.rev: []}
    for i in range(args.reps):
        for label, tree in (("current", REPO), (args.rev, wt)):
            r = run_one(tree, args.pages, args.weight, args.cpus)
            samples[label].append(r)
            print(
                f"rep {i} {label}: {r['urls_per_sec']} urls/s "
                f"(wall {r['crawl_sec']}s, fetched {r['fetched']})",
                flush=True,
            )
    print(json.dumps({
        lab: {
            "best_urls_per_sec": max(r["urls_per_sec"] for r in rs),
            "samples": [r["urls_per_sec"] for r in rs],
            "fetched": rs[0]["fetched"],
            "extractions": rs[0]["extractions"],
        }
        for lab, rs in samples.items()
    }, indent=1))


if __name__ == "__main__":
    main()
