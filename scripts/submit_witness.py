#!/usr/bin/env python
"""Two-level spark-submit witness: the north rule's literal deploy phrasing
("run via spark-submit --py-files ... at N and 4N executors") executed
end-to-end — package the engine as a zip, then drive the SAME
scripts/submit_crawl.py through real spark-submit at --master local[8] and
local[32] on the same synthetic corpus, and record both runs' summaries in
BENCH/SUBMIT_WITNESS.md (re-appended to BENCH/BASELINE.md by
render_from_samples.py).

This witnesses the DEPLOY SURFACE (zip packaging, spark-submit child JVM,
--py-files import path, JSON summary) — the statistically-sampled scaling
evidence stays with scripts/scaling_bench.py's best-of-N pool; one
spark-submit pair is a smoke-level corroboration, not a replacement.

Usage: python scripts/submit_witness.py [pages] [weight]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(master: str, pages: int, weight: int) -> dict:
    workdir = tempfile.mkdtemp(prefix=f"boris_submit_{master.replace('[','').replace(']','')}_")
    t0 = time.time()
    out = subprocess.run(
        [
            "spark-submit",
            "--master", master,
            "--conf", "spark.sql.shuffle.partitions=32",
            "--py-files", os.path.join(REPO, "dist", "boris_spark.zip"),
            os.path.join(REPO, "scripts", "submit_crawl.py"),
            "--workdir", workdir,
            "--synthetic", str(pages),
            "--weight", str(weight),
            "--politeness-k", "20000",
        ],
        capture_output=True, text=True, timeout=1200,
    )
    wall = time.time() - t0
    shutil.rmtree(workdir, ignore_errors=True)
    if out.returncode != 0:
        raise RuntimeError(f"spark-submit {master} failed:\n{out.stderr[-3000:]}")
    # summary is the last JSON line on stdout
    summary = None
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                summary = json.loads(line)
            except json.JSONDecodeError:
                pass
    if summary is None:
        raise RuntimeError(f"no JSON summary from {master}:\n{out.stdout[-2000:]}")
    summary["submit_wall_s"] = round(wall, 1)
    summary["master"] = master
    return summary


def main() -> None:
    pages = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    weight = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "package.py")], check=True
    )
    s8 = run_level("local[8]", pages, weight)
    s32 = run_level("local[32]", pages, weight)
    same = all(s8.get(k) == s32.get(k) for k in ("fetched", "results", "rounds"))
    md = f"""## Postscript: spark-submit --py-files two-level witness

The north rule's deploy phrasing executed literally: `scripts/package.py`
zips the engine, and the SAME `scripts/submit_crawl.py` ran through real
`spark-submit --py-files dist/boris_spark.zip` at `--master local[8]` (N)
and `local[32]` (4N) on the same {pages}-page synthetic corpus
(weight {weight}). One unpaired run per level — this witnesses the DEPLOY
SURFACE (zip import path, child-JVM session bootstrap, JSON summary,
resumable workdir); the statistical scaling evidence remains the
best-of-pool table above.

| level | fetched | results | rounds | crawl_s | urls/s | submit wall (incl. JVM boot) |
|---|---|---|---|---|---|---|
| local[8] | {s8['fetched']} | {s8['results']} | {s8['rounds']} | {s8['wall_s']} | {s8['urls_per_sec']} | {s8['submit_wall_s']} |
| local[32] | {s32['fetched']} | {s32['results']} | {s32['rounds']} | {s32['wall_s']} | {s32['urls_per_sec']} | {s32['submit_wall_s']} |

Cross-level determinism (identical fetched/results/rounds): **{same}**

```json
{json.dumps(s8)}
{json.dumps(s32)}
```
"""
    with open(os.path.join(REPO, "BENCH", "SUBMIT_WITNESS.md"), "w") as f:
        f.write(md)
    print(json.dumps({"deterministic": same,
                      "urls_per_sec": [s8["urls_per_sec"], s32["urls_per_sec"]]}))


if __name__ == "__main__":
    main()
