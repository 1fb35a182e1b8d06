"""Host CPU-delivery probe: how much single-thread compute does each of K
concurrent processes actually receive on this box, right now?

Runs K concurrent single-process matmuls (500x500 — cache-resident, so this
is COMPUTE delivery, deliberately distinct from tools/busprobe.py's STREAM
triad which measures the memory bus) and reports per-process best wall time
at K = 1, 8, 32 plus the delivery ratio (time at K) / (time at 1).

Why it exists: the sandbox is a 32-vCPU guest on a shared host. When the
hypervisor under-delivers vCPUs (or maps them onto host SMT siblings), every
32-thread measurement inflates by the delivery ratio INDEPENDENT of the
code under test — an 8→32 scaling ratio taken in such a window measures the
host, not the engine. Logging this probe next to each scaling run makes the
distinction auditable: engine-side contention = wall-time inflation BEYOND
the probe's delivery ratio.

Usage: python tools/cpudelivery.py  → one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time


def _matmul(_):
    import numpy as np

    a = np.random.default_rng(0).random((500, 500))
    for _ in range(3):
        a @ a  # warm
    best = 1e9
    for _ in range(10):
        t0 = time.perf_counter()
        a @ a
        best = min(best, time.perf_counter() - t0)
    return best * 1000


def main() -> None:
    # MUST run before any numpy import in this process (a forked pool child
    # inherits the parent's already-initialized multithreaded OpenBLAS and
    # the solo baseline collapses to a multi-core matmul — a 20x-wrong
    # ratio; this is why scaling_run_one invokes this file as a SUBPROCESS)
    os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
    os.environ.setdefault("OMP_NUM_THREADS", "1")
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, nargs="*", default=[8, 32],
                    help="concurrency levels (1 is always measured)")
    args = ap.parse_args()
    out = {}
    for nproc in [1] + list(args.procs):
        with mp.Pool(nproc) as p:
            times = p.map(_matmul, range(nproc))
        out[f"procs_{nproc}_ms"] = round(sum(times) / len(times), 2)
    for nproc in args.procs:
        out[f"delivery_ratio_{nproc}"] = round(
            out[f"procs_{nproc}_ms"] / out["procs_1_ms"], 3)
    out["ts"] = round(time.time(), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
