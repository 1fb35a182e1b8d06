"""Scaling-efficiency evidence (BASELINE.md): run the flagship extraction at
local[N] and local[4N] in separate JVMs on the same input and report
throughput at both plus efficiency = (T_N / T_4N) / 4.

Usage: python tools/scaling.py [--n 8] [--sf-dir /root/testdata/sf0.1]
Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cores: int, sf_dir: str, multiply: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--cores", str(cores), "--sf-dir", sf_dir, "--flagship-only",
         "--multiply", str(multiply)],
        capture_output=True, text=True, check=True, cwd=REPO,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument(
        "--multiply", type=int, default=32,
        help="corpus replication factor: makes the job compute-bound (the "
             "100TB regime) instead of overhead-bound at sandbox scale")
    args = ap.parse_args()
    n, n4 = args.n, args.n * 4

    small = run_bench(n, args.sf_dir, args.multiply)
    big = run_bench(n4, args.sf_dir, args.multiply)
    t_small = small["queries"]["ocr_documento_completo"]
    t_big = big["queries"]["ocr_documento_completo"]
    thr_small = small["docs"] / t_small
    thr_big = big["docs"] / t_big
    eff = (thr_big / thr_small) / 4
    result = {
        "sf_dir": args.sf_dir,
        "docs": small["docs"],
        f"local[{n}]": {"sec": t_small, "docs_per_sec": round(thr_small, 2)},
        f"local[{n4}]": {"sec": t_big, "docs_per_sec": round(thr_big, 2)},
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            f"""# BENCH/BASELINE — measured numbers

Flagship: interleaved-document extraction (documento_completo mode), full
pipeline (span synthesis → media render → decode → route → preprocess →
glyph OCR → reassembly), {small['docs']} documents at {args.sf_dir}.

Scaling evidence protocol (BASELINE.md): identical job, identical input, two
parallelism levels in separate JVMs — the sandbox stand-in for N and 4N
executors.

| parallelism | wall (s) | docs/sec |
|---|---|---|
| local[{n}]  | {t_small:.2f} | {thr_small:.2f} |
| local[{n4}] | {t_big:.2f} | {thr_big:.2f} |

**Scaling efficiency (N→4N): {eff:.3f}** (target >= 0.8: {"PASS" if eff >= 0.8 else "FAIL"})

Correctness gate: 100% span-sequence equality at sf0.01 via the DuckDB
oracle (tools/check_oracle.py; driver CORRECTNESS_r*.json).
"""
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
