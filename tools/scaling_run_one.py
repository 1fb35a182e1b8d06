"""One gated scaling measurement: probe box health, then run ONE parallelism
level of the flagship scaling protocol and append the result to a JSONL log.

The sandbox host is shared; run-to-run variance can exceed 40% in bad
windows, which corrupts N-vs-4N efficiency. Protocol (CLAUDE.md): each level
runs as its own foreground command, nothing else concurrent, several reps
per level, min wall time wins. This helper adds an admission gate: a
single-probe BLAS matmul (uses the whole box) must beat --gate-ms or the
run is skipped as contaminated, and the probe is re-run AFTER the bench so a
window that degraded mid-run is flagged.

Usage: python tools/scaling_run_one.py --cores 8 [--multiply 24]
       [--gate-ms 25] [--log BENCH/scaling_runs.jsonl]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.gate import commit_hash, probe_ms  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--multiply", type=int, default=24)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--gate-ms", type=float, default=25.0)
    ap.add_argument("--log", default=os.path.join(REPO, "BENCH", "scaling_runs.jsonl"))
    args = ap.parse_args()

    pre = probe_ms()
    rec: dict = {"cores": args.cores, "multiply": args.multiply,
                 "probe_pre_ms": round(pre, 1), "ts": round(time.time(), 1),
                 "commit": commit_hash()}
    # host CPU-delivery at this level's concurrency (tools/cpudelivery.py
    # rationale): the single-proc probe admits windows where the hypervisor
    # under-delivers vCPUs at high concurrency — record the K-proc delivery
    # ratio so every row carries the ceiling it was measured under
    # (efficiency at N->4N cannot exceed delivery(N)/delivery(4N)).
    # Subprocess, not an in-process pool: forked children inherit this
    # process's multithreaded OpenBLAS and corrupt the solo baseline.
    try:
        dj = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "cpudelivery.py"),
             "--procs", str(args.cores)],
            capture_output=True, text=True, check=True, timeout=300)
        rec["delivery_ratio_pre"] = json.loads(
            dj.stdout.strip().splitlines()[-1])[f"delivery_ratio_{args.cores}"]
    except Exception:  # noqa: BLE001 — probe is evidence, never a blocker
        rec["delivery_ratio_pre"] = None
    if pre > args.gate_ms:
        rec["status"] = "skipped_contended"
        print(json.dumps(rec))
        return
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--cores", str(args.cores),
         "--sf-dir", args.sf_dir, "--flagship-only", "--multiply", str(args.multiply)],
        capture_output=True, text=True, check=True, cwd=REPO)
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    b = json.loads(line)
    post = probe_ms()
    sec = b["queries"]["ocr_documento_completo"]
    rec.update({
        "status": "ok" if post <= args.gate_ms else "post_probe_contended",
        "probe_post_ms": round(post, 1),
        "sec": sec,
        "docs": b["docs"],
        "docs_per_sec": round(b["docs"] / sec, 2),
    })
    os.makedirs(os.path.dirname(args.log), exist_ok=True)
    with open(args.log, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
