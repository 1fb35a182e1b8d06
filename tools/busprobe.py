"""Shared-memory-bus saturation evidence (BENCH/BASELINE.md).

Runs a STREAM-like triad (a = b + s*c over 64 MB float64 arrays) in N
concurrent processes and reports per-process and aggregate bandwidth at
N = 1, 8, 32. On a single box, every local[K] Spark worker shares one memory
controller; if aggregate bandwidth stops growing between 8 and 32 processes,
per-worker compute time MUST inflate at local[32] — an artifact real 4N
EXECUTORS (per-node memory controllers) do not pay. This probe quantifies
that ceiling independently of Spark and of the engine's kernels.

Usage: python tools/busprobe.py  → one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time


def _triad(args):
    n_iter, nbytes = args
    import numpy as np

    n = nbytes // 8
    b = np.random.default_rng(0).random(n)
    c = np.random.default_rng(1).random(n)
    a = np.empty(n)
    # warm
    np.add(b, 2.5 * c, out=a)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        np.multiply(c, 2.5, out=a)
        a += b
    dt = time.perf_counter() - t0
    # bytes moved per iteration: read b, read c, write a (+RFO) ~ 4 arrays
    return n_iter * 4 * nbytes / dt / 1e9


def main() -> None:
    os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
    os.environ.setdefault("OMP_NUM_THREADS", "1")
    nbytes = 64 * 1024 * 1024
    out = {}
    for nproc in (1, 8, 32):
        with mp.Pool(nproc) as p:
            rates = p.map(_triad, [(6, nbytes)] * nproc)
        out[f"procs_{nproc}"] = {
            "per_proc_gbs": round(sum(rates) / len(rates), 2),
            "aggregate_gbs": round(sum(rates), 2),
        }
    agg8 = out["procs_8"]["aggregate_gbs"]
    agg32 = out["procs_32"]["aggregate_gbs"]
    out["aggregate_growth_8_to_32"] = round(agg32 / agg8, 3)
    out["per_proc_slowdown_8_to_32"] = round(
        out["procs_8"]["per_proc_gbs"] / out["procs_32"]["per_proc_gbs"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
