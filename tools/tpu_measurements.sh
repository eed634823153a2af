#!/bin/bash
# Pending real-TPU measurements, runnable the moment the axon tunnel is back.
# (Prepared while the tunnel was down; each step is independently skippable.)
#
#   bash tools/tpu_measurements.sh [outfile]
#
# Captures:
#   1. the driver bench (headline matvec TFLOP/s + CG it/s)
#   2. sigmoid through the Pallas dual kernel (tanh vs exp epilogue cost)
#   3. laplacian distance matvec: blockwise scan vs symmetric pair walk
#   4. the rect (predict) kernel at a mid shape, for the BENCHMARKS.md table
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/tpu_measurements.log}"
: > "$OUT"

run() {
    echo "=== $* ===" | tee -a "$OUT"
    timeout 1200 "$@" 2>&1 | tee -a "$OUT"
    echo | tee -a "$OUT"
}

# 0. probe (fail fast if the tunnel is still down)
timeout 60 python -c "import jax; print(jax.devices())" >> "$OUT" 2>&1 || {
    echo "tunnel still down — aborting" | tee -a "$OUT"; exit 3; }

# 1. the driver bench
run python bench.py

# 2. sigmoid vs rbf through the same kernels (m=65536 amortizes dispatch)
run python tools/bench_matvec.py 65536 1024 24 dual_f32,xla_rb2048 sigmoid
run python tools/bench_matvec.py 65536 1024 24 dual_f32 rbf

# 3. laplacian: scan vs symmetric walk (small m — VPU-bound, minutes/matvec
#    at big shapes; 8192 x 256 keeps one variant under the device watchdog)
run python tools/bench_matvec.py 8192 256 2 all laplacian

# 4. rect/predict kernel reference number
run python tools/bench_matvec.py 65536 1024 24 rect_full rbf

echo "done — results in $OUT"
