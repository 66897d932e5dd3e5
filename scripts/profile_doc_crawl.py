#!/usr/bin/env python
"""Per-round profiler for the crawl_depth_histogram doc crawl (the bench's
largest line item, flagged ANTI-SCALING in round 4: 23.0s @ local[8] →
32.5s @ local[32]). Runs the identical unbudgeted doc crawl the gate runs,
at $SPARK_GRAFT_CPUS cores over $SPARK_GRAFT_SF_DIR, and prints each
round's manifest phase walls so the fixed-vs-scaling cost split is a
measurement, not a guess. Usage:

    SPARK_GRAFT_CPUS=8  python scripts/profile_doc_crawl.py
    SPARK_GRAFT_CPUS=32 python scripts/profile_doc_crawl.py
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from boris_spark.engine.session import get_spark
    from boris_spark.ops import queries as Q

    spark = get_spark("boris-doc-profile", cores=cpus)
    t0 = time.time()
    eng, summary = Q._run_doc_crawl(spark, sf_dir)
    # materialize the histogram exactly like the bench (noop write)
    Q.QUERIES["crawl_depth_histogram"](spark, sf_dir).write.mode(
        "overwrite"
    ).format("noop").save()
    wall = time.time() - t0

    rounds = []
    for f in sorted(
        glob.glob(os.path.join(eng.workdir, "rounds", "*.json")),
        key=lambda p: int(os.path.basename(p).split(".")[0]),
    ):
        rounds.append(json.load(open(f)))
    print(json.dumps({
        "cpus": cpus,
        "sf_dir": sf_dir,
        "wall_s": round(wall, 2),
        "fetched": summary.fetched,
        "rounds_n": summary.rounds,
        "rounds": [
            {k: r.get(k) for k in
             ("round", "requests", "fetched", "wall_s", "phases",
              "commit_walls")}
            for r in rounds
        ],
    }, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
