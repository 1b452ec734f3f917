"""Produce SCALING_r{N}.json: the TP scaling evidence bundle.

Combines (a) the wall-clock + weight-bytes sweep from scaling_bench.py
(virtual-mesh wall-clock is host-contention noise and is labeled as such)
with (b) the compiled-graph collective audit (collective_audit.py): the
program's ACTUAL per-step collectives with ring-model wire bytes and the
analytic ICI efficiency curve. Runs on the 8-device virtual CPU mesh;
"pending real ICI" until a pod slice exists.

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmarks/make_scaling_artifact.py --round 5
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_json(script, args):
    env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
    }
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "benchmarks", script),
         "--json-only", *args],
        capture_output=True, text=True, timeout=5400, cwd=ROOT, env=env,
    )
    lines = [l for l in out.stdout.splitlines() if l.strip().startswith("{")]
    if not lines:
        return {"error": f"rc={out.returncode}",
                "tail": out.stderr[-500:]}
    return json.loads(lines[-1])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--round", type=int, required=True)
    p.add_argument("--preset", default="llama31-8b-int4")
    args = p.parse_args()

    audit = run_json("collective_audit.py",
                     ["--preset", args.preset, "--tp", "1,2,4,8"])
    sweep = run_json("scaling_bench.py",
                     ["--preset", args.preset, "--tp", "1,2,4,8"])

    out = {
        "round": args.round,
        "preset": args.preset,
        "note": (
            "Virtual 8-device CPU mesh (1 real chip available). "
            "wall_clock efficiency is HOST-CONTENTION NOISE; the "
            "deterministic evidence is (1) per-device weight bytes "
            "tracking 1/tp and (2) the compiled program's actual "
            "collectives + analytic ICI curve (collective_audit). "
            "Pending real ICI hardware."
        ),
        "collective_audit": audit,
        "wall_clock_sweep": sweep,
    }
    path = os.path.join(ROOT, f"SCALING_r{args.round:02d}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
