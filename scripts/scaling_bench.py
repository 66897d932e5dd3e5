"""Two-parallelism-level scaling bench: the sandbox proxy for the north
rule's N→4N-executor criterion (no real cluster here, per the task brief).

Runs bench.py twice in fresh JVMs — local[8] (N) and local[32] (4N) — on the
SAME pre-generated corpus and sf dir, then reports throughput at both and the
scaling efficiency (thr_4N / thr_N) / 4 into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cpus: int, n_pages: int, sf_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=sf_dir,
        BORIS_BENCH_PAGES=str(n_pages),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    n_pages = int(os.environ.get("BORIS_BENCH_PAGES", "60000"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # warm the corpus cache in a throwaway run dir (generation excluded from
    # the timed runs because bench.py caches the parquet)
    lo = run(8, n_pages, sf_dir)
    hi = run(32, n_pages, sf_dir)
    thr_lo = lo["crawl"]["urls_per_sec"]
    thr_hi = hi["crawl"]["urls_per_sec"]
    eff = (thr_hi / thr_lo) / 4
    # determinism across parallelism levels (SURVEY.md §5 item 4): the same
    # seed must produce identical crawl output at local[8] and local[32]
    deterministic = (
        lo["crawl"]["fetched"] == hi["crawl"]["fetched"]
        and lo["crawl"]["extractions"] == hi["crawl"]["extractions"]
    )
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    qrows = "\n".join(
        f"| {name} | {lo['queries'].get(name, '-')} | {hi['queries'].get(name, '-')} |"
        for name in hi["queries"]
    )
    md = f"""# BENCH baseline — two-parallelism-level scaling proxy

Same job, same input ({n_pages} synthetic pages, sf dir {sf_dir}), two fresh
JVMs. `local[8]` stands in for N executors, `local[32]` for 4N (task brief:
the north rule's two-cluster-size criterion cannot use a real cluster in this
sandbox).

| metric | local[8] (N) | local[32] (4N) |
|---|---|---|
| crawl URLs fetched+extracted | {lo['crawl']['fetched']} | {hi['crawl']['fetched']} |
| crawl extractions | {lo['crawl']['extractions']} | {hi['crawl']['extractions']} |
| crawl rounds | {lo['crawl']['rounds']} | {hi['crawl']['rounds']} |
| crawl wall (s) | {lo['crawl']['crawl_sec']} | {hi['crawl']['crawl_sec']} |
| **crawl throughput (urls/s)** | **{thr_lo}** | **{thr_hi}** |
| suite total (s) | {lo['value']} | {hi['value']} |

**Scaling efficiency (throughput_4N / throughput_N) / 4 = {eff:.2f}**
(target ≥ 0.8 per BASELINE.json; raw speedup {thr_hi / thr_lo:.2f}× on 4× cores)

Determinism across parallelism levels (same seed ⇒ identical fetched +
extraction counts at both levels): **{deterministic}**

## Per-query wall seconds (sf dir {sf_dir})

| query | local[8] | local[32] |
|---|---|---|
{qrows}

Raw JSON:

```json
{json.dumps(lo)}
{json.dumps(hi)}
```
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({
        "thr_local8": thr_lo, "thr_local32": thr_hi,
        "efficiency": round(eff, 3), "deterministic": deterministic,
    }))


if __name__ == "__main__":
    main()
