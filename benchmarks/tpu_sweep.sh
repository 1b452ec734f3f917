#!/bin/bash
# TPU perf sweep: run when the chip is available. Each stage prints its
# JSON result lines; later stages only matter if earlier ones regress.
# Usage: bash benchmarks/tpu_sweep.sh [outfile]
set -u
OUT="${1:-/tmp/tpu_sweep_$(date +%H%M%S).log}"
cd "$(dirname "$0")/.."

run() {
  echo "=== $* ===" | tee -a "$OUT"
  timeout 1200 env "$@" python bench.py 2>&1 | tail -4 | tee -a "$OUT"
}

# 0. headline sanity (current defaults)
run BENCH_PRESETS=llama31-8b-int4 BENCH_QUICK=1 BENCH_FAST_INIT=1

# 1. block_k depth sweep on the headline (W4A8 decode)
for BK in 1024 2048 4096; do
  run BENCH_PRESETS=llama31-8b-int4 BENCH_QUICK=1 BENCH_FAST_INIT=1 QUANT_BLOCK_K=$BK
done

# 2. tile width (stored layout width is pinned; flat-layout width knob)
for BN in 2048 4096 8192; do
  run BENCH_PRESETS=llama31-8b-int4 BENCH_QUICK=1 BENCH_FAST_INIT=1 QUANT_BLOCK_N=$BN
done

# 3. variant A/B at decode
for V in w4a8 group dequant; do
  run BENCH_PRESETS=llama31-8b-int4 BENCH_QUICK=1 BENCH_FAST_INIT=1 QUANT_VARIANT=$V
done

# 4. per-layer decomposition (fixed-cost vs per-layer split)
for L in 8 32; do
  run BENCH_PRESETS=llama31-8b-int4 BENCH_QUICK=1 BENCH_FAST_INIT=1 BENCH_LAYERS=$L
done

# 5. tinyllama packed-head check
run BENCH_PRESETS=tinyllama-1.1b BENCH_QUICK=1 BENCH_FAST_INIT=1

# 6. serving bench: async scheduling on vs off (output tokens/s, TTFT/ITL)
echo "=== serve_bench async ON ===" | tee -a "$OUT"
timeout 2400 python benchmarks/serve_bench.py --preset tinyllama-1.1b \
  --num-requests 48 --mean-prompt 128 --mean-output 64 --json-only 2>&1 | tail -1 | tee -a "$OUT"
echo "=== serve_bench async OFF ===" | tee -a "$OUT"
timeout 2400 python benchmarks/serve_bench.py --preset tinyllama-1.1b \
  --num-requests 48 --mean-prompt 128 --mean-output 64 --json-only \
  --disable-async-scheduling 2>&1 | tail -1 | tee -a "$OUT"

echo "sweep done -> $OUT"
