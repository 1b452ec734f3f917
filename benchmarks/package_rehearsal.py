"""Package a builder-run full bench.py rehearsal into BENCH_SELF_r{N}.json.

Usage: python benchmarks/package_rehearsal.py --round 5 \
           --log /tmp/bench_full_r05.log --err /tmp/bench_full_r05.err
"""
import argparse
import json
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--round", type=int, required=True)
    p.add_argument("--log", required=True)
    p.add_argument("--err", required=True)
    p.add_argument("--rc", default=None)
    args = p.parse_args()

    metrics, seen = [], set()
    for path in (args.err, args.log):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line.startswith("{"):
                    continue
                try:
                    d = json.loads(line)
                except json.JSONDecodeError:
                    continue
                key = json.dumps(d, sort_keys=True)
                if "metric" in d and key not in seen:
                    seen.add(key)
                    metrics.append(d)
    rc = 0
    if args.rc and os.path.exists(args.rc):
        rc = int(open(args.rc).read().strip().split("=")[-1])
    out = {
        "round": args.round,
        "builder_rehearsal": True,
        "rc": rc,
        "note": "Builder-run full `python bench.py` (exact driver "
                "invocation) on the final committed round state, real "
                "v5e via the axon tunnel. perf_history.py flags >20% "
                "drift between this and the driver's BENCH_r%02d.json "
                "(driver is canonical)." % args.round,
        "metrics": metrics,
    }
    dst = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), f"BENCH_SELF_r{args.round:02d}.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", dst, f"({len(metrics)} metrics, rc={rc})")


if __name__ == "__main__":
    main()
