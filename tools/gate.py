"""Shared admission-gate probe for perf measurement (bench.py and
tools/scaling_run_one.py).

The sandbox host is shared and contention arrives in >40% bursts, so any
wall-clock number taken without a health check is weather, not evidence.
The probe is a whole-box BLAS matmul (BLAS threads are pinned to 1 by
plans/session.py, so this measures the box, not OpenBLAS scheduling): if
its best-of-5 time exceeds the gate the window is contended and the
measurement must be discarded. Probing BEFORE and AFTER a run brackets it —
a burst that starts mid-run is caught by the post probe.
"""

from __future__ import annotations

import subprocess
import time

GATE_MS_DEFAULT = 25.0


def probe_ms() -> float:
    """Best-of-5 1200x1200 matmul wall time in ms (~10 ms on a quiet box)."""
    import numpy as np

    a = np.random.default_rng(0).random((1200, 1200))
    for _ in range(2):
        a @ a
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        a @ a
        best = min(best, time.perf_counter() - t0)
    return best * 1000


def commit_hash() -> str | None:
    """Short commit hash of HEAD — stamps every measurement row so results
    are attributable to the binaries that produced them."""
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, check=True, timeout=10,
        ).stdout.strip()
    except Exception:  # noqa: BLE001 — not a repo / no git: unstamped
        return None
