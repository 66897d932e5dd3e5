"""Bare-metal throughput probe for the crawl's hot kernel.

Runs the SAME CPU-bound work the fused crawl stage runs per page (synthetic
page materialization + full page featurization) through a plain
multiprocessing pool — no Spark, no JVM, no IO. Measured at the same moment
and the same process count as a bench run, it gives that run's
hardware-achievable ceiling on this shared-steal sandbox VM, so engine
efficiency can be separated from host contention:

    engine_efficiency(level) = crawl_urls_per_sec / ceiling_pages_per_sec
"""

from __future__ import annotations

import sys


def _work(args):
    lo, cnt = args
    from boris_spark.oracle import program as P
    from boris_spark.synth import webgen

    pp = P.PageProfileE()
    for p in range(lo, lo + cnt):
        html = webgen.page_html(p, 480000, 42, 32)
        pp.eval(P.EvalCtx(html, "http://x/", {}))
    return cnt


def probe(nproc: int, total: int = 4800, reps: int = 2) -> float:
    """Best-of-*reps* pages/s for the hot kernel at *nproc* processes."""
    import multiprocessing as mp
    import time

    per = total // nproc
    jobs = [(i * per, per) for i in range(nproc)]
    best = 0.0
    for _ in range(reps):
        t0 = time.time()
        with mp.get_context("spawn").Pool(nproc) as pool:
            pool.map(_work, jobs)
        best = max(best, total / (time.time() - t0))
    return round(best, 1)
