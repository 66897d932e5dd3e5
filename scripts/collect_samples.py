#!/usr/bin/env python
"""Append tagged bench samples to the round's sample pool.

Each invocation runs a sequence of fresh-JVM bench.py runs (scaling_bench.run)
and appends `{"cpus_tag": TAG} {bench json}` lines to the pool file that
render_from_samples.py consumes. Sequential on purpose: overlapping runs
contend for the same cores and poison both samples.

Usage: python scripts/collect_samples.py TAG [TAG ...]
  TAG ::= 8-uniform | 32-uniform | 8-skew | 32-skew | 32-uniform480 | 32-quick60k
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from scaling_bench import CONTROL_ENV, SKEW_ENV, run  # noqa: E402

POOL = os.environ.get("BORIS_SAMPLE_POOL", "/tmp/samples_r4.jsonl")

SPECS = {
    "8-uniform": (8, 240000, {}),
    "32-uniform": (32, 240000, {}),
    "8-skew": (8, 240000, SKEW_ENV),
    "32-skew": (32, 240000, SKEW_ENV),
    "8-control": (8, 240000, CONTROL_ENV),
    "32-control": (32, 240000, CONTROL_ENV),
    "32-uniform480": (32, 480000, {"BORIS_CRAWL_ONLY": "1"}),
    "32-quick60k": (32, 60000, {"BORIS_PAGE_WEIGHT": "8"}),
}


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for tag in sys.argv[1:]:
        cpus, n_pages, extra = SPECS[tag]
        res = run(cpus, n_pages, sf_dir, extra)
        with open(POOL, "a") as f:
            f.write(json.dumps({"cpus_tag": tag}) + " " + json.dumps(res) + "\n")
        print(tag, res["crawl"]["urls_per_sec"], flush=True)


if __name__ == "__main__":
    main()
